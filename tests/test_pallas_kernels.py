"""Pallas fused-scan kernel tests (interpret mode — no TPU required).

The real-TPU compilation/perf of this kernel is exercised by bench.py;
these tests pin the kernel's exactness contract: bit-plane packing, hi/lo
split-sum exactness, payload packing, and ragged-grid tail safety.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from duckdb_cubit_tpu.ops import pallas_kernels as pk


def _make(n, seed=0, amax=10_500_000, bmax=10):
    rng = np.random.default_rng(seed)
    mask = rng.random(n) < 0.03
    a = rng.integers(0, amax, n).astype(np.int32)
    b = rng.integers(0, bmax + 1, n).astype(np.int32)
    expect = int((a.astype(np.int64) * b)[mask].sum())
    return mask, a, b, expect


def test_plan_feasibility():
    assert pk.plan_fused_scan(8192, 10, True) is None  # below min capacity
    assert pk.plan_fused_scan(100, 10, True) is None
    plan = pk.plan_fused_scan(8192 * 733, 105_000_000, True)
    assert plan is not None
    assert plan.grid * plan.sub >= plan.n_words_rows
    # split must bound both halves below 2**31
    per_lane = 32 * plan.grid
    assert ((1 << plan.split) - 1) * per_lane < 2**31
    assert (105_000_000 >> plan.split) * per_lane < 2**31


@pytest.mark.parametrize("n", [1 << 15, 8192 * 9])  # 9 -> ragged grid tail
def test_fused_scan_sum_packed_exact(n):
    mask, a, b, expect = _make(n)
    plan = pk.plan_fused_scan(n, 10_500_000 * 10, True)
    assert plan is not None
    planes = pk.plane_pack(jnp.asarray(mask), plan)
    packed = pk.pack_columns(jnp.asarray(a), jnp.asarray(b))
    total = pk.fused_scan_sum(planes, [packed], plan, interpret=True)
    assert int(total) == expect


def test_fused_scan_sum_single_column():
    n = 1 << 15
    mask, a, _, _ = _make(n)
    expect = int(a.astype(np.int64)[mask].sum())
    plan = pk.plan_fused_scan(n, 10_500_000, False)
    planes = pk.plane_pack(jnp.asarray(mask), plan)
    total = pk.fused_scan_sum(planes, [jnp.asarray(a)], plan,
                              interpret=True)
    assert int(total) == expect


def test_fused_scan_sum_two_columns_unpacked():
    n = 1 << 15
    mask, a, b, expect = _make(n)
    plan = pk.plan_fused_scan(n, 10_500_000 * 10, False)
    planes = pk.plane_pack(jnp.asarray(mask), plan)
    total = pk.fused_scan_sum(planes, [jnp.asarray(a), jnp.asarray(b)],
                              plan, interpret=True)
    assert int(total) == expect


def test_pack_columns_roundtrip_wide_narrow():
    a = np.array([0, 1, 2**24 - 1, 12345], np.int32)
    b = np.array([0, 255, 7, 10], np.int32)
    pkd = np.asarray(pk.pack_columns(jnp.asarray(a), jnp.asarray(b)))
    assert list(pkd & 0xFFFFFF) == list(a)
    assert list((pkd >> 24) & 0xFF) == list(b)


def test_plane_pack_layout():
    n = 1 << 15
    rng = np.random.default_rng(1)
    mask = rng.random(n) < 0.5
    plan = pk.plan_fused_scan(n, 100, False)
    planes = np.asarray(pk.plane_pack(jnp.asarray(mask), plan)).reshape(-1)
    w = n // 32
    for r in [0, 1, 17, n - 1, w, 2 * w + 5]:
        b, word = divmod(r, w)
        assert bool((planes[word] >> np.uint32(b)) & 1) == bool(mask[r])
