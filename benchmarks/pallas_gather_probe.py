#!/usr/bin/env python
"""Which dynamic-gather forms does Mosaic/TPU support, and how fast?

Candidates for the join-probe redesign:
 A. jnp.take of a VMEM-resident table with a vector of indices
 B. jnp.take_along_axis within (8,128) tiles
 C. one-hot matmul gather (MXU)
 D. scalar fori_loop gather (baseline)
"""

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _log(m):
    print(m, file=sys.stderr, flush=True)


N = 1 << 22        # probe count
T = 1 << 13        # table slice entries (8K * 4B = 32KB in VMEM)
BLK = 1 << 16      # probe block per grid step


def try_kernel(name, kernel, out_shape, grid, in_specs, out_specs, args,
               rows_per_call):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape, grid=grid,
                           in_specs=in_specs, out_specs=out_specs)
        jf = jax.jit(lambda s, *a: jnp.sum(
            f(*a).astype(jnp.int32) *
            jax.lax.dynamic_slice(s, (0,), (rows_per_call,))))
        w = jnp.ones(rows_per_call, jnp.int32)
        int(jf(w, *args))
        ts = []
        for rep in range(3):
            w2 = w + rep
            t0 = time.perf_counter()
            int(jf(w2, *args))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        _log(f"{name:34s} OK  {t*1e3:8.3f} ms  "
             f"{rows_per_call/t/1e6:10.1f} Mrow/s")
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        _log(f"{name:34s} FAIL {msg}")


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, T, N), jnp.int32)
    table = jnp.asarray(rng.integers(0, 1 << 30, T), jnp.int32)

    # A: whole-table VMEM take, 1-D
    def kA(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[:][idx_ref[:]]

    try_kernel(
        "A_take_1d_vmem", kA,
        jax.ShapeDtypeStruct((N,), jnp.int32),
        (N // BLK,),
        [pl.BlockSpec((BLK,), lambda i: (i,)),
         pl.BlockSpec((T,), lambda i: (0,))],
        pl.BlockSpec((BLK,), lambda i: (i,)), (idx, table), N)

    # A2: 2-D shaped take (Mosaic prefers >=2D)
    idx2 = idx.reshape(N // 128, 128)
    tab2 = table.reshape(T // 128, 128)

    def kA2(idx_ref, tab_ref, out_ref):
        flat = tab_ref[:].reshape(-1)
        out_ref[:] = flat[idx_ref[:]]

    try_kernel(
        "A2_take_2d_vmem", kA2,
        jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
        (N // BLK,),
        [pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0)),
         pl.BlockSpec((T // 128, 128), lambda i: (0, 0))],
        pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0)),
        (idx2, tab2), N)

    # B: take_along_axis within rows of 128 (gather along lanes)
    lane_idx = jnp.asarray(rng.integers(0, 128, N), jnp.int32)
    li2 = lane_idx.reshape(N // 128, 128)

    def kB(idx_ref, tab_ref, out_ref):
        # each output row r gathers from table row (r % table rows)
        t = tab_ref[:]
        i = idx_ref[:]
        rows = t.shape[0]
        reps = i.shape[0] // rows
        tt = jnp.tile(t, (reps, 1))
        out_ref[:] = jnp.take_along_axis(tt, i, axis=1)

    try_kernel(
        "B_take_along_lanes", kB,
        jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
        (N // BLK,),
        [pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0)),
         pl.BlockSpec((T // 128, 128), lambda i: (0, 0))],
        pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0)),
        (li2, tab2), N)

    # C: one-hot matmul gather: idx within [0,T), out = onehot(idx) @ table
    def kC(idx_ref, tab_ref, out_ref):
        i = idx_ref[:]                       # (R,128) int32
        flat_i = i.reshape(-1, 1)            # (B,1)
        tab = tab_ref[:].reshape(1, -1)      # (1,T)
        onehot = (flat_i == jax.lax.broadcasted_iota(
            jnp.int32, (flat_i.shape[0], T), 1))
        vals = jnp.sum(jnp.where(onehot, tab, 0), axis=1)
        out_ref[:] = vals.reshape(i.shape)

    try_kernel(
        "C_onehot_where_sum", kC,
        jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
        (N // (BLK // 8),),
        [pl.BlockSpec((BLK // 8 // 128, 128), lambda i: (i, 0)),
         pl.BlockSpec((T // 128, 128), lambda i: (0, 0))],
        pl.BlockSpec((BLK // 8 // 128, 128), lambda i: (i, 0)),
        (idx2, tab2), N)

    # D: XLA take baseline at this table size
    jf = jax.jit(lambda s, i, t: jnp.sum(t[i] * s))
    w = jnp.ones(N, jnp.int32)
    int(jf(w, idx, table))
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        int(jf(w + rep, idx, table))
        ts.append(time.perf_counter() - t0)
    _log(f"{'D_xla_take':34s} OK  {min(ts)*1e3:8.3f} ms  "
         f"{N/min(ts)/1e6:10.1f} Mrow/s")


if __name__ == "__main__":
    main()
