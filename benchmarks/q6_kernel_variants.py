#!/usr/bin/env python
"""Device-throughput microbench of the engine's fused scan+SUM kernel.

Measures ops/pallas_kernels.fused_scan_sum — the exact kernel the staged
Q6 program executes — at SF1 lineitem shapes on the attached TPU, sweeping
the words-block sublane size.  64 distinct predicate word-arrays are
evaluated per dispatch via lax.map (distinct inputs so the tunneled
runtime cannot replay results), and a trivially-cheap control with the
same dispatch/pull pattern is subtracted.

Measured on TPU v5e (2026-08-20, this session — see
ARTIFACTS/q6_kernel_tpu_r04.txt): SUB=128 reaches ~200 Grow/s = ~828 GB/s
effective HBM traffic at the kernel's 4.125 B/row — the spec-sheet
bandwidth, and ~2.0x the 8.125 B/row uncompressed-traffic roofline model.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from duckdb_cubit_tpu.ops import pallas_kernels as pk  # noqa: E402

N = 8192 * 733          # SF1 lineitem capacity
NV = 64


def main():
    rng = np.random.default_rng(0)
    mask_np = rng.random(N) < 0.02
    ep = rng.integers(90000, 10500000, N).astype(np.int32)
    di = rng.integers(0, 11, N).astype(np.int32)
    expect = int((ep.astype(np.int64) * di)[mask_np].sum())

    plan = pk.plan_fused_scan(N, 10_500_000 * 10, packed=True)
    assert plan is not None, "shape not eligible"
    packed = pk.pack_columns(jnp.asarray(ep), jnp.asarray(di))
    planes = pk.plane_pack(jnp.asarray(mask_np), plan)
    total = pk.fused_scan_sum(planes, [packed], plan)
    assert int(total) == expect, (int(total), expect)
    print(f"exact: OK (SUB={plan.sub}, grid={plan.grid}, "
          f"split={plan.split})")

    words = jnp.asarray(rng.integers(
        0, 2**32, size=(NV,) + planes.shape, dtype=np.uint32))

    def one(w):
        return pk.fused_scan_sum(w, [packed], plan)

    f = jax.jit(lambda ws: jnp.sum(jax.lax.map(one, ws)))
    ctrl = jax.jit(lambda ws: ws[:, :1, :1].astype(jnp.int64).sum())

    def round_(g, k=16):
        t0 = time.perf_counter()
        outs = [g(words) for _ in range(k)]
        int(jnp.sum(jnp.stack(outs)))
        return time.perf_counter() - t0

    int(f(words))
    int(ctrl(words))
    round_(f)
    round_(ctrl)
    tw = statistics.median([round_(f) for _ in range(5)])
    tc = statistics.median([round_(ctrl) for _ in range(5)])
    per = max(tw - tc, 1e-9) / 16
    rows_s = NV * N / per
    print(f"{per * 1e3:.2f} ms/dispatch  {rows_s / 1e9:.2f} Grow/s  "
          f"actual {rows_s * 4.125 / 1e9:.0f} GB/s  "
          f"vs 8.125B-model {rows_s / (819e9 / 8.125):.3f}")


if __name__ == "__main__":
    main()
