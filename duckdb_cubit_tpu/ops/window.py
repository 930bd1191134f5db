"""Window function kernels.

Analog of the reference's PhysicalWindow / WindowSegmentTree (reference
src/execution/operator/aggregate/physical_window.cpp,
window_segment_tree.cpp).  TPU design: one multi-key sort by
(partition keys, order keys), then every frame primitive is a segmented
prefix operation — cumulative sums with segment-start subtraction, rank via
position arithmetic — finally scattered back to the input row order.  No
segment trees: prefix sums over sorted runs give running frames in O(n).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sort_by(partition_keys, order_keys, valid):
    n = partition_keys[0].shape[0] if partition_keys else order_keys[0].shape[0]
    big = jnp.int64(2**62)
    keys = tuple(jnp.where(valid, k.astype(jnp.int64), big)
                 for k in (*partition_keys, *order_keys))
    rows = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort(keys + (rows,), num_keys=len(keys))
    return out[:len(partition_keys)], out[len(partition_keys):-1], out[-1]


def _segment_starts(sorted_part_keys, n):
    if not sorted_part_keys:
        return jnp.zeros(n, jnp.bool_).at[0].set(True)
    change = jnp.zeros(n, jnp.bool_).at[0].set(True)
    for k in sorted_part_keys:
        change = change | jnp.concatenate(
            [jnp.ones(1, jnp.bool_), k[1:] != k[:-1]])
    return change


def _scatter_back(values_sorted, perm, n):
    return jnp.zeros(n, values_sorted.dtype).at[perm].set(values_sorted)


def row_number(partition_keys, order_keys, valid):
    """ROW_NUMBER() OVER (PARTITION BY ... ORDER BY ...), 1-based."""
    n = valid.shape[0]
    spart, _, perm = _sort_by(partition_keys, order_keys, valid)
    starts = _segment_starts(spart, n)
    pos = jnp.arange(n, dtype=jnp.int64)
    seg_start = jax.lax.cummax(jnp.where(starts, pos, 0), axis=0)
    rn = pos - seg_start + 1
    return _scatter_back(rn, perm, n)


def rank(partition_keys, order_keys, valid):
    """RANK() with gaps (ties share the rank)."""
    n = valid.shape[0]
    spart, sorder, perm = _sort_by(partition_keys, order_keys, valid)
    starts = _segment_starts(spart, n)
    order_change = jnp.zeros(n, jnp.bool_).at[0].set(True)
    for k in sorder:
        order_change = order_change | jnp.concatenate(
            [jnp.ones(1, jnp.bool_), k[1:] != k[:-1]])
    new_rank_pos = starts | order_change
    pos = jnp.arange(n, dtype=jnp.int64)
    seg_start = jax.lax.cummax(jnp.where(starts, pos, 0), axis=0)
    last_change = jax.lax.cummax(jnp.where(new_rank_pos, pos, 0), axis=0)
    r = last_change - seg_start + 1
    return _scatter_back(r, perm, n)


def running_sum(partition_keys, order_keys, values, valid):
    """SUM(v) OVER (PARTITION BY ... ORDER BY ... ROWS UNBOUNDED PRECEDING)."""
    n = valid.shape[0]
    spart, _, perm = _sort_by(partition_keys, order_keys, valid)
    starts = _segment_starts(spart, n)
    v_sorted = jnp.where(valid[perm], values.astype(jnp.int64)[perm], 0)
    csum = jnp.cumsum(v_sorted)
    pos = jnp.arange(n, dtype=jnp.int64)
    seg_start = jax.lax.cummax(jnp.where(starts, pos, 0), axis=0)
    base = jnp.where(seg_start > 0, csum[jnp.maximum(seg_start - 1, 0)], 0)
    run = csum - base
    return _scatter_back(run, perm, n)


def partition_total(partition_keys, values, valid):
    """SUM(v) OVER (PARTITION BY ...) — whole-partition frame."""
    n = valid.shape[0]
    spart, _, perm = _sort_by(partition_keys, (), valid)
    starts = _segment_starts(spart, n)
    v_sorted = jnp.where(valid[perm], values.astype(jnp.int64)[perm], 0)
    csum = jnp.cumsum(v_sorted)
    pos = jnp.arange(n, dtype=jnp.int64)
    seg_start = jax.lax.cummax(jnp.where(starts, pos, 0), axis=0)
    # segment end = next segment's start - 1 (computed via reversed scan)
    rev_starts = jnp.flip(starts)
    rev_pos = jnp.arange(n, dtype=jnp.int64)
    nxt = jax.lax.cummax(jnp.where(jnp.flip(
        jnp.concatenate([starts[1:], jnp.ones(1, jnp.bool_)])),
        rev_pos, 0), axis=0)
    seg_end = n - 1 - jnp.flip(nxt)
    total = csum[seg_end] - jnp.where(
        seg_start > 0, csum[jnp.maximum(seg_start - 1, 0)], 0)
    return _scatter_back(total, perm, n)
