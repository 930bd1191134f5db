import jax.numpy as jnp
import numpy as np

from duckdb_cubit_tpu.ops import window as W


def _ref_row_number(part, order):
    out = np.zeros(len(part), np.int64)
    for p in np.unique(part):
        idx = np.where(part == p)[0]
        perm = idx[np.argsort(order[idx], kind="stable")]
        out[perm] = np.arange(1, len(perm) + 1)
    return out


def test_row_number():
    rng = np.random.default_rng(0)
    part = rng.integers(0, 5, 200).astype(np.int64)
    order = rng.integers(0, 50, 200).astype(np.int64)
    valid = jnp.ones(200, bool)
    got = np.asarray(W.row_number((jnp.asarray(part),), (jnp.asarray(order),),
                                  valid))
    # same partition+order value rows may tie-break differently; compare
    # per-(part, order) sorted multisets of row numbers
    want = _ref_row_number(part, order)
    for p in np.unique(part):
        sel = part == p
        assert sorted(got[sel]) == sorted(want[sel])


def test_rank_ties():
    part = np.zeros(6, np.int64)
    order = np.array([10, 10, 20, 20, 20, 30], np.int64)
    got = np.asarray(W.rank((jnp.asarray(part),), (jnp.asarray(order),),
                            jnp.ones(6, bool)))
    assert sorted(got) == [1, 1, 3, 3, 3, 6]


def test_running_sum():
    part = np.array([0, 0, 0, 1, 1], np.int64)
    order = np.array([1, 2, 3, 1, 2], np.int64)
    vals = np.array([5, 7, 1, 10, 20], np.int64)
    got = np.asarray(W.running_sum(
        (jnp.asarray(part),), (jnp.asarray(order),), jnp.asarray(vals),
        jnp.ones(5, bool)))
    np.testing.assert_array_equal(got, [5, 12, 13, 10, 30])


def test_partition_total():
    part = np.array([0, 1, 0, 1, 0], np.int64)
    vals = np.array([1, 2, 3, 4, 5], np.int64)
    got = np.asarray(W.partition_total((jnp.asarray(part),),
                                       jnp.asarray(vals), jnp.ones(5, bool)))
    np.testing.assert_array_equal(got, [9, 6, 9, 6, 9])
