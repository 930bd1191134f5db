"""Pallas TPU join-probe kernel: monotone direct-address gather.

The reference's hash-join probe hot loop walks pointer chains per row
(reference src/execution/join_hashtable.cpp:206-316 GetRowPointers +
:768-900 chain gather).  On TPU, XLA lowers any per-element gather to a
~134 Mrow/s issue-rate wall regardless of table size or locality
(measured: benchmarks/probe_primitives.py), which made the engine's
direct-address PK probe 1000x below the HBM roofline (VERDICT r4 item 1).

TPU-first redesign: Mosaic's only fast dynamic-addressing primitive is
`tpu.dynamic_gather` — take_along_axis over a 2-D (sublane, lane) tile
where operand/indices/output shapes are equal (jax/_src/pallas/mosaic/
lowering.py:2482).  That primitive composes into an EXACT full-table
gather when the probe keys are sorted:

  key k -> LUT row r = k >> 7, lane l = k & 127.  Within one (R, 128)
  block of sorted keys, each block spans a bounded LUT row window, and
  each row i of 128 consecutive keys spans AT MOST TWO LUT rows
  (r0[i], r0[i]+1) whenever keys are near-dense (FK->PK joins: the probe
  FK visits almost every build key).  So:
    A_lo[i, :] = W[r0[i], :]        (axis-0 dynamic_gather, row pick)
    A_hi[i, :] = W[r0[i]+1, :]
    out[i, j]  = (r[i,j] == r0[i] ? A_lo : A_hi)[i, l[i,j]]
                                    (axis-1 dynamic_gather, lane pick)
  The LUT window W for each grid step is selected by a scalar-prefetched
  block offset (PrefetchScalarGridSpec) — two adjacent (WR, 128) windows
  give row-granular coverage of the block's span.  Rows that violate the
  span conditions raise a deferred overflow count, and the caller falls
  back to the XLA gather (the engine's standard capacity-retry
  discipline, exec/executor.py).

For UNSORTED probe keys the wrapper sorts (key, position) pairs first
(lax.sort: ~600 Mrow/s, 4.5x faster than XLA's gather) and scatters
results back; sorted FK columns (lineitem.l_orderkey et al) skip both.

Sorted-probe throughput measured on TPU v5e: see
ARTIFACTS/probe_kernel_tpu_r05.txt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Layout: key k -> LUT row r = k >> 7, lane l = k & 127.
# Grid step: a (_PBR, 128) probe block (_PBR*128 sorted keys) + a
# 2x(_W, 128)-row LUT window (two adjacent blocks, scalar-prefetch
# selected, copied into one scratch so sub-windows never straddle a ref
# boundary).  Inner fori_loop over (8, 128) probe sub-tiles: each reads
# its (_SUB, 128) sub-window at a precomputed row base (SMEM), picks the
# target row via 4 sublane dynamic_gathers + selects, then the target
# lane via one lane dynamic_gather.  Per-step overhead (~17 us measured)
# amortizes over 256K keys; per-element work is ~25 vreg ops.
_PBR = 1024                 # probe block rows per grid step
_BLOCK = _PBR * 128         # 131072 keys per grid step
_W = 2048                   # LUT window rows per input block; the
                            # window index quantizes DOWN by up to W-1
                            # rows, so guaranteed forward coverage is
                            # W+1 rows = 262272 slots — 2x a dense
                            # 131072-key block's span
_SUB = 40                   # sub-window rows per probe sub-tile (5120 slots:
                            # covers an all-distinct stride-4 sub-tile plus
                            # its 127-slot row-alignment slack)
_NSUB = _PBR // 8           # sub-tiles per grid step
_CAND = 6                   # candidate rows per probe row: 128 keys span
                            # at most 4*128+127 = 639 slots (all-distinct
                            # stride-4 worst case) = 6 LUT rows


def _i32(v):
    return jnp.asarray(v, jnp.int32)


def _dyn_gather(operand, idx, axis: int):
    """take_along_axis with guaranteed-int32 indices (jnp's helper upcasts
    to int64 under jax_enable_x64, which Mosaic rejects).  Emits exactly
    the dimension_numbers tpu.dynamic_gather supports
    (jax/_src/pallas/mosaic/lowering.py:2482); the gathered axis must fit
    one vreg (8 sublanes / 128 lanes)."""
    if axis == 0:
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
            operand_batching_dims=(1,), start_indices_batching_dims=(1,))
    else:
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        operand, idx.astype(jnp.int32)[..., None], dn, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _kernel(off_ref, rb_ref, keys_ref, w0_ref, w1_ref, out_ref, ovf_ref,
            scr_ref):
    g = pl.program_id(0)
    base_row = off_ref[g] * _W
    scr_ref[0:_W, :] = w0_ref[:, :]
    scr_ref[_W:2 * _W, :] = w1_ref[:, :]
    zero, seven = jnp.int32(0), jnp.int32(7)

    def body(iraw, ovf):
        i = jax.lax.convert_element_type(iraw, jnp.int32)
        k = keys_ref[pl.ds(i * 8, 8), :]          # (8,128) sorted keys
        rb = rb_ref[g, i] - base_row              # sub-window base (local)
        rbc = jnp.minimum(jnp.maximum(rb, zero), jnp.int32(2 * _W - _SUB))
        win = scr_ref[pl.ds(rbc, _SUB), :]        # (_SUB,128)
        tr = (k >> 7) - (base_row + rbc)          # target row in [0,_SUB)
        lane = k & 127
        # dynamic_gather composes into a 2-D pick ONLY through row-constant
        # row indices: picked[i,j] = win[c[i], j] then lane-gathered gives
        # win[c[i], lane[i,j]] exactly (a per-element row pick before the
        # lane gather would read tr at position lane[i,j], not j).  Keys
        # ascend within a row, so every element's row is one of
        # row0[i]..row0[i]+_CAND-1 with row0 = the row of lane 0.
        row0 = jnp.broadcast_to(tr[:, :1], (8, 128))
        out = jnp.zeros((8, 128), jnp.int32)
        for t in range(_CAND):
            rt = row0 + t                          # row-constant candidate
            cand = jnp.zeros((8, 128), jnp.int32)
            for s in range(_SUB // 8):
                idx = jnp.minimum(jnp.maximum(rt - s * 8, zero), seven)
                gseg = _dyn_gather(win[s * 8:(s + 1) * 8, :], idx, axis=0)
                cand = jnp.where((rt >= s * 8) & (rt < (s + 1) * 8), gseg,
                                 cand)
            lane_val = _dyn_gather(cand, lane, axis=1)
            out = jnp.where(tr == rt, lane_val, out)
        out_ref[pl.ds(i * 8, 8), :] = out
        # bad: element's row beyond the candidate set, or the candidate
        # set runs off the sub-window (both -> caller falls back)
        bad = (tr >= row0 + _CAND) | (row0 >= _SUB - _CAND)
        nb = jnp.sum(bad.astype(jnp.int32), axis=1, dtype=jnp.int32,
                     keepdims=True)
        nb = jnp.sum(nb, axis=0, dtype=jnp.int32, keepdims=True)[0, 0]
        return ovf + nb

    ovf = jax.lax.fori_loop(jnp.int32(0), jnp.int32(_NSUB), body,
                            jnp.int32(0))
    keep = (g > 0).astype(jnp.int32)
    ovf_ref[0, 0] = ovf_ref[0, 0] * keep + ovf


@functools.lru_cache(maxsize=32)
def _build_call(n_blocks: int, interpret: bool):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((n_blocks, _NSUB),
                         lambda g, off: (_i32(0), _i32(0)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_PBR, 128), lambda g, off: (g, _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_W, 128), lambda g, off: (off[g], _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_W, 128), lambda g, off: (off[g] + 1, _i32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_PBR, 128), lambda g, off: (g, _i32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda g, off: (_i32(0), _i32(0)),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[pltpu.VMEM((2 * _W, 128), jnp.int32)],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks * _PBR, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )


def plan_monotone_gather(n_keys: int, lut_size: int):
    """Host feasibility check -> (n_blocks, lut_windows) or None."""
    if n_keys < _BLOCK // 4 or lut_size <= 0:
        return None
    n_blocks = -(-n_keys // _BLOCK)
    lut_windows = -(-lut_size // (_W * 128)) + 1
    return n_blocks, lut_windows


def monotone_gather(lut: jnp.ndarray, keys: jnp.ndarray,
                    interpret: bool = False):
    """out[i] = lut[keys[i]] for NON-DECREASING int32 keys in [0, len(lut)).

    Returns (out int32 array, overflow count int32 scalar).  overflow > 0
    means some 1024-key sub-tile spans more than _SUB*128 = 4096 LUT
    slots (sparse keys) and `out` is not trustworthy — callers fall back
    to the XLA gather (deferred check, same discipline as the executor's
    capacity retries)."""
    n = keys.shape[0]
    plan = plan_monotone_gather(n, int(lut.shape[0]))
    assert plan is not None
    n_blocks, lut_windows = plan
    npad = n_blocks * _BLOCK
    k = keys.astype(jnp.int32)
    if npad != n:
        # pad with the final key: monotone, in-window, discarded by caller
        k = jnp.concatenate([k, jnp.broadcast_to(k[-1:], (npad - n,))])
    li = lut.astype(jnp.int32)
    pad_slots = lut_windows * _W * 128 - li.shape[0]
    li = jnp.concatenate([li, jnp.full(pad_slots, -1, jnp.int32)])
    k2 = k.reshape(n_blocks * _PBR, 128)
    # per-sub-tile first row (SMEM) + per-block window index (prefetch)
    firsts = k2[::8, 0]
    rb = (firsts >> 7).astype(jnp.int32).reshape(n_blocks, _NSUB)
    offs = jnp.clip((k2[::_PBR, 0] >> 7) // _W, 0,
                    lut_windows - 2).astype(jnp.int32)
    call = _build_call(n_blocks, interpret)
    lut2 = li.reshape(lut_windows * _W, 128)
    out2, ovf = call(offs, rb, k2, lut2, lut2)
    return out2.reshape(npad)[:n], ovf[0, 0]


def gather_via_sort(lut: jnp.ndarray, keys: jnp.ndarray,
                    interpret: bool = False):
    """out[i] = lut[clip(keys[i])] for ARBITRARY int32 keys.

    Sort (key, position), monotone-gather, scatter back: every stage runs
    4-10x faster than XLA's native per-element gather on TPU (measured,
    benchmarks/probe_primitives.py).  Returns (out, overflow)."""
    n = keys.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    kc = jnp.clip(keys.astype(jnp.int32), 0, lut.shape[0] - 1)
    ks, ps = jax.lax.sort((kc, pos), num_keys=1)
    vals, ovf = monotone_gather(lut, ks, interpret)
    out = jnp.zeros(n, jnp.int32).at[ps].set(vals)
    return out, ovf
