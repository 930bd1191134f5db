"""Distributed query steps: sharded scan/filter/aggregate/join pipelines.

The multi-chip execution strategy (BASELINE.json north star): base tables and
CUBIT bitmaps are row-partitioned across the mesh; filters and bitmap AND/OR
run shard-locally; grouped aggregates compute shard-local partials and
combine with psum over ICI; joins route both sides through the radix
exchange so each device owns its hash partitions (replacing the reference's
CAS-based shared hash table with deterministic partition ownership).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..ops import bitmap as bm
from ..ops import join as join_ops
from .mesh import DATA_AXIS


def make_q6_step(mesh):
    """Distributed bitmap scan + exact masked sum (the Q6 shape).

    Inputs (sharded on rows/words): predicate words (3 columns' AND input),
    eprice, disc.  Output: replicated (hi, lo) exact revenue sum.
    """

    def local(words_a, words_b, words_c, eprice, disc, valid):
        words = words_a & words_b & words_c
        mask = bm.expand(words, eprice.shape[0]) & valid
        val = (eprice * disc).astype(jnp.int64)
        lo = jnp.sum(jnp.where(mask, val & jnp.int64(0xFFFFFFFF), 0))
        hi = jnp.sum(jnp.where(mask, val >> jnp.int64(32), 0))
        return (jax.lax.psum(hi, DATA_AXIS), jax.lax.psum(lo, DATA_AXIS))

    spec = P(DATA_AXIS)
    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=(P(), P()),
        check_vma=False))


def make_grouped_agg_step(mesh, num_groups: int):
    """Distributed dense grouped aggregate (the Q1 shape).

    Shard-local scatter-add partials + psum: the analog of the reference's
    thread-local hash tables merged in finalize
    (radix_partitioned_hashtable.cpp), with the merge as one collective.
    """

    def local(codes, values, valid):
        safe = jnp.where(valid, codes, 0)
        v = jnp.where(valid, values.astype(jnp.int64), jnp.int64(0))
        lo = jnp.zeros(num_groups, jnp.int64).at[safe].add(v & jnp.int64(0xFFFFFFFF))
        hi = jnp.zeros(num_groups, jnp.int64).at[safe].add(v >> jnp.int64(32))
        cnt = jnp.zeros(num_groups, jnp.int64).at[safe].add(
            valid.astype(jnp.int64))
        return (jax.lax.psum(hi, DATA_AXIS), jax.lax.psum(lo, DATA_AXIS),
                jax.lax.psum(cnt, DATA_AXIS))

    spec = P(DATA_AXIS)
    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(P(), P(), P()), check_vma=False))


def make_partitioned_join_step(mesh, build_quota: int, probe_quota: int):
    """Distributed hash join: radix-exchange both sides, then local joins.

    Each device owns hash(key) % n partitions of both sides (deterministic
    ownership instead of a shared CAS table); the local join is the
    vectorized open-addressing build/probe from ops.join.
    """
    from .exchange import _pack_buckets

    n = mesh.devices.size

    def local(bkeys, bvals, bvalid, pkeys, pvals, pvalid):
        bk, bp, bv, bovf = _pack_buckets(bkeys, [bvals], bvalid, n, build_quota)
        pk, pp, pv, povf = _pack_buckets(pkeys, [pvals], pvalid, n, probe_quota)
        bk = jax.lax.all_to_all(bk, DATA_AXIS, 0, 0).reshape(-1)
        bval = jax.lax.all_to_all(bp[0], DATA_AXIS, 0, 0).reshape(-1)
        bvld = jax.lax.all_to_all(bv, DATA_AXIS, 0, 0).reshape(-1)
        pk2 = jax.lax.all_to_all(pk, DATA_AXIS, 0, 0).reshape(-1)
        pval = jax.lax.all_to_all(pp[0], DATA_AXIS, 0, 0).reshape(-1)
        pvld = jax.lax.all_to_all(pv, DATA_AXIS, 0, 0).reshape(-1)
        size = 1
        while size < 2 * bk.shape[0]:
            size *= 2
        ht_keys, ht_entry, starts, counts, srows, _ = join_ops._build_kernel(
            bk, bvld, size, bk.shape[0])
        entry = join_ops._probe_kernel(ht_keys, ht_entry, pk2, pvld, size)
        found = entry >= 0
        safe = jnp.maximum(entry, 0)
        joined_bval = jnp.where(found, bval[srows[starts[safe]]], 0)
        # revenue-style result: sum of probe value * build value over matches
        partial = jnp.sum(jnp.where(found, pval * joined_bval, 0))
        total = jax.lax.psum(partial, DATA_AXIS)
        ovf = jax.lax.psum(bovf + povf, DATA_AXIS)
        return total, ovf

    spec = P(DATA_AXIS)
    return jax.jit(shard_map(
        local, mesh=mesh, in_specs=(spec,) * 6, out_specs=(P(), P()),
        check_vma=False))
