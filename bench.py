#!/usr/bin/env python
"""Benchmark: TPC-H Q6 via the CUBIT bitmap path on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value        = lineitem rows/s through the full Q6 query (range-encoded
               bitmap AND of shipdate/discount/quantity + exact split-sum
               revenue), SF1, steady-state prepared-query throughput.
vs_baseline  = fraction of the per-chip HBM roofline for this query's
               minimum traffic (BASELINE.json north star: bitmap scan
               >= 0.7 of roofline).

Method: the query is prepared once (PreparedStatement analog), then K
executions are dispatched back-to-back and the clock stops at a device->host
read of a scalar that depends on every run (in-order device queues make that
a barrier for all K).  This measures the engine's sustainable query
throughput — per-dispatch host cost + device execution — the way a serving
deployment runs it, and keeps the one unavoidable D2H at the end (on
remote-attached TPUs the first D2H permanently drops the runtime out of its
latency-hiding fast path, adding a flat ~25ms per sync afterwards).
Correctness is verified against the reference golden answers AFTER timing.

Roofline model (TPU v5e, ~819 GB/s HBM): predicate phase reads 2 range-
encoded bitvector rows per predicate (6 * N/32 words * 4B = 0.75 N bytes),
the expanded mask costs ~2 N bytes (1B write + 1B read), and the aggregate
reads two 8-byte payload columns (16 N bytes) => 18.75 B/row.
"""

import json
import statistics
import sys
import time


HBM_BYTES_PER_S = 819e9  # TPU v5e spec sheet
BYTES_PER_ROW = 6 / 8 + 2 + 16


def main():
    sf = 1.0
    import jax
    import jax.numpy as jnp

    from duckdb_cubit_tpu.exec import result as R
    from duckdb_cubit_tpu.exec.executor import Executor, PreparedQuery
    from duckdb_cubit_tpu.tpch import answers, load, queries

    catalog = load.load_catalog(sf)
    n_rows = catalog.table("lineitem").num_rows
    ex = Executor(catalog)
    prepared = PreparedQuery(ex, queries.get_query(6))

    # warm: compile + first execution
    rel = prepared.execute()
    jax.block_until_ready([c.array for c in rel.columns.values()])

    def timed_round(k: int) -> float:
        t0 = time.perf_counter()
        acc = []
        for _ in range(k):
            r = prepared.execute()
            acc.append(next(iter(r.columns.values())).array)
        # one scalar D2H depending on every run = completion barrier
        float(jnp.sum(jnp.stack(acc).astype(jnp.float32)))
        return time.perf_counter() - t0

    # warm-up rounds: absorb the first-D2H runtime mode switch and let the
    # remote runtime's pattern pipelining converge to steady state
    for _ in range(6):
        timed_round(32)
    K = 256
    times = [timed_round(K) for _ in range(5)]
    med = statistics.median(times)
    rows_per_s = n_rows * K / med

    # verify AFTER timing (D2H-heavy)
    rows = R.to_strings(prepared.execute())
    if answers.answers_available():
        problems = answers.compare(rows, sf, 6)
        if problems:
            print(json.dumps({"error": f"Q6 wrong: {problems[:3]}"}))
            sys.exit(1)

    roofline_rows_per_s = HBM_BYTES_PER_S / BYTES_PER_ROW
    print(json.dumps({
        "metric": "tpch_sf1_q6_rows_per_s",
        "value": rows_per_s,
        "unit": "rows/s",
        "vs_baseline": rows_per_s / roofline_rows_per_s,
    }))


if __name__ == "__main__":
    main()
