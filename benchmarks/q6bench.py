"""Microbench: Q6 fused scan-sum variants, bench.py methodology.

One dispatch evaluates all NV variants via lax.map; a trivially-cheap
control with the same dispatch/pull pattern is subtracted, isolating device
execution time (the tunnel's flat dispatch cost would otherwise dominate).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

import duckdb_cubit_tpu  # noqa: F401
from duckdb_cubit_tpu.tpch import load

catalog = load.load_catalog(1.0)
table = catalog.table("lineitem")
n = table.capacity
ep32 = table.columns["l_extendedprice"].data.astype(jnp.int32)
di32 = table.columns["l_discount"].data.astype(jnp.int32)
jax.block_until_ready([ep32, di32])
print("capacity:", n, flush=True)

rng = np.random.default_rng(0)
NV = 64
words_np = rng.integers(0, 2**32, size=(NV, n // 32), dtype=np.uint32)
words = jnp.asarray(words_np)
mask8 = jnp.asarray(
    ((words_np[:, :, None] >> np.arange(32, dtype=np.uint32)) & 1)
    .astype(np.int8).reshape(NV, n))
jax.block_until_ready([words, mask8])

ctrl = jax.jit(lambda w: w[:, :1].astype(jnp.int64).sum())


def timed(name, fn, arg, bytes_per_row, k=16):
    f = jax.jit(fn)
    int(f(arg))  # compile
    def round_(g, a):
        t0 = time.perf_counter()
        outs = [g(a) for _ in range(k)]
        int(jnp.sum(jnp.stack(outs)))
        return time.perf_counter() - t0
    round_(f, arg); round_(ctrl, arg)
    tw = statistics.median([round_(f, arg) for _ in range(5)])
    tc = statistics.median([round_(ctrl, arg) for _ in range(5)])
    per = max(tw - tc, 1e-9) / k
    rows_s = NV * n / per
    gbs = rows_s * bytes_per_row / 1e9
    print(f"{name:14s} {per*1e3:7.2f} ms  {rows_s/1e9:6.2f} Grow/s  "
          f"{gbs:6.1f} GB/s  {gbs/819:5.2f} of 819GB/s", flush=True)
    return rows_s


def read2_map(w):
    def one(wv):
        return (jnp.sum(ep32.astype(jnp.int64))
                + jnp.sum(di32.astype(jnp.int64)) + wv[0].astype(jnp.int64))
    return jnp.sum(jax.lax.map(one, w))

timed("read2_map", read2_map, words, 8.0)


def fused_mask(m8):
    def one(m):
        val = ep32 * m.astype(jnp.int32) * di32
        return jnp.sum(val.astype(jnp.int64))
    return jnp.sum(jax.lax.map(one, m8))

timed("fused_mask8", fused_mask, mask8, 9.0)


def fused_words(w):
    def one(wv):
        bits = (wv[:, None] >> jnp.arange(32, dtype=jnp.uint32)) & 1
        m = bits.astype(jnp.int32).reshape(-1)
        val = ep32 * m * di32
        return jnp.sum(val.astype(jnp.int64))
    return jnp.sum(jax.lax.map(one, w))

timed("fused_words", fused_words, words, 8.125)


# int32-only accumulation variant (is int64 accumulate the bottleneck?)
def fused_mask_i32(m8):
    def one(m):
        val = ep32 * m.astype(jnp.int32) * di32
        hi = jnp.sum(val >> 16, dtype=jnp.int32)
        lo = jnp.sum(val & 0xFFFF, dtype=jnp.int32)
        return hi.astype(jnp.int64) * 65536 + lo.astype(jnp.int64)
    return jnp.sum(jax.lax.map(one, m8))

timed("fused_mask_i32", fused_mask_i32, mask8, 9.0)


# pallas: words + 2 cols, int32 partials
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512 * 1024
while n % BLK != 0:
    BLK //= 2
print("BLK:", BLK, "grid:", n // BLK, flush=True)


def q6_kernel(w_ref, a_ref, b_ref, out_ref):
    i = pl.program_id(0)
    w = w_ref[:].reshape(-1, 1)
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (1, 32), 1)
    bits = ((w >> shifts) & jnp.uint32(1)).astype(jnp.int32).reshape(-1)
    prod = a_ref[:] * bits * b_ref[:]
    hi = jnp.sum(prod >> 16, dtype=jnp.int32)
    lo = jnp.sum(prod & 0xFFFF, dtype=jnp.int32)
    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = 0
        out_ref[0, 1] = 0
    out_ref[0, 0] += hi
    out_ref[0, 1] += lo


def pallas_q6(w, a, b):
    return pl.pallas_call(
        q6_kernel,
        grid=(n // BLK,),
        in_specs=[
            pl.BlockSpec((BLK // 32,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
    )(w, a, b)


def fused_pallas(w):
    def one(wv):
        o = pallas_q6(wv, ep32, di32)
        return o[0, 0].astype(jnp.int64) * 65536 + o[0, 1].astype(jnp.int64)
    return jnp.sum(jax.lax.map(one, w))

try:
    timed("pallas_words", fused_pallas, words, 8.125)
except Exception as e:
    print("pallas failed:", type(e).__name__, str(e)[:300])


def pallas_m8_kernel(m_ref, a_ref, b_ref, out_ref):
    i = pl.program_id(0)
    prod = a_ref[:] * m_ref[:].astype(jnp.int32) * b_ref[:]
    hi = jnp.sum(prod >> 16, dtype=jnp.int32)
    lo = jnp.sum(prod & 0xFFFF, dtype=jnp.int32)
    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = 0
        out_ref[0, 1] = 0
    out_ref[0, 0] += hi
    out_ref[0, 1] += lo


def pallas_m8(m, a, b):
    return pl.pallas_call(
        pallas_m8_kernel,
        grid=(n // BLK,),
        in_specs=[
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
    )(m, a, b)


def fused_pallas_m8(m8):
    def one(mv):
        o = pallas_m8(mv, ep32, di32)
        return o[0, 0].astype(jnp.int64) * 65536 + o[0, 1].astype(jnp.int64)
    return jnp.sum(jax.lax.map(one, m8))

try:
    timed("pallas_mask8", fused_pallas_m8, mask8, 9.0)
except Exception as e:
    print("pallas failed:", type(e).__name__, str(e)[:300])
