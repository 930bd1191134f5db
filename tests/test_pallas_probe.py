"""Monotone direct-address probe kernel (ops/pallas_probe.py).

Interpret-mode on the CPU mesh (conftest); the TPU measurement lives in
ARTIFACTS/probe_kernel_tpu_r05.txt.  Covers: dense sorted keys with
variable multiplicity (bit-exact), absent keys (-1 slots), padding tails,
sparse keys (must raise the overflow count, never corrupt silently), and
the random-key sort wrapper.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from duckdb_cubit_tpu.ops import pallas_probe as PP


def _lut(dom, stride, rng):
    keys = np.arange(0, dom, stride)
    lut = np.full(dom, -1, np.int32)
    lut[keys] = np.arange(len(keys), dtype=np.int32)
    return keys, lut


def test_monotone_dense_variable_multiplicity():
    rng = np.random.default_rng(0)
    dom = 600_000
    keys, lut = _lut(dom, 4, rng)
    mult = rng.integers(1, 8, len(keys))
    probe = np.sort(np.repeat(keys, mult))[: PP._BLOCK + 777].astype(np.int32)
    out, ovf = PP.monotone_gather(jnp.asarray(lut), jnp.asarray(probe),
                                  interpret=True)
    assert int(ovf) == 0
    np.testing.assert_array_equal(np.asarray(out), lut[probe])


def test_monotone_absent_keys_yield_minus_one():
    rng = np.random.default_rng(1)
    dom = 400_000
    keys, lut = _lut(dom, 4, rng)
    # probe every slot including absent ones (stride-1 over stride-4 LUT)
    probe = np.arange(PP._BLOCK, dtype=np.int32) + 1000
    out, ovf = PP.monotone_gather(jnp.asarray(lut), jnp.asarray(probe),
                                  interpret=True)
    assert int(ovf) == 0
    np.testing.assert_array_equal(np.asarray(out), lut[probe])
    assert (np.asarray(out) == -1).any()


def test_sparse_keys_overflow_not_corrupt():
    rng = np.random.default_rng(2)
    dom = 4_000_000
    _, lut = _lut(dom, 4, rng)
    # stride ~30 keys: sub-tiles span far more than the window
    probe = np.sort(rng.integers(0, dom, PP._BLOCK)).astype(np.int32)
    probe = np.unique(probe)
    probe = np.sort(np.concatenate([probe] * (PP._BLOCK // len(probe) + 1))
                    )[: PP._BLOCK].astype(np.int32)
    out, ovf = PP.monotone_gather(jnp.asarray(lut), jnp.asarray(probe),
                                  interpret=True)
    ok = (np.asarray(out) == lut[probe]).all()
    # either it got it right or it flagged overflow — silence + corruption
    # is the only forbidden outcome
    assert int(ovf) > 0 or ok


def test_gather_via_sort_random_keys():
    rng = np.random.default_rng(3)
    dom = 500_000
    keys, lut = _lut(dom, 2, rng)
    probe = rng.integers(0, dom, PP._BLOCK).astype(np.int32)
    out, ovf = PP.gather_via_sort(jnp.asarray(lut), jnp.asarray(probe),
                                  interpret=True)
    if int(ovf) == 0:
        np.testing.assert_array_equal(np.asarray(out), lut[probe])


def test_plan_gates_small_inputs():
    assert PP.plan_monotone_gather(100, 1000) is None
    assert PP.plan_monotone_gather(PP._BLOCK, 0) is None
    assert PP.plan_monotone_gather(PP._BLOCK, 1000) is not None
