#!/usr/bin/env python
"""Benchmark: TPC-H Q6 via the CUBIT bitmap path on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value        = lineitem rows/s through the full Q6 query (bitmap AND of
               shipdate/discount/quantity + exact revenue sum), median of
               repeated runs at SF1.
vs_baseline  = fraction of the per-chip HBM roofline for this query's
               minimum traffic (the north-star metric in BASELINE.json:
               bitmap scan >= 0.7 of roofline).  Roofline model: with
               range-encoded bitmaps the predicate phase reads 2 bitvector
               rows per predicate (6 * N/8 bytes) and the aggregate reads
               the two 8-byte payload columns (16 N bytes) => 16.75 B/row
               against ~819 GB/s HBM on TPU v5e.
"""

import json
import statistics
import sys
import time


HBM_BYTES_PER_S = 819e9  # TPU v5e spec sheet
BYTES_PER_ROW = 6 / 8 + 16  # bitmap rows + eprice/disc int64 reads


def main():
    sf = 1.0
    import jax

    from duckdb_cubit_tpu.exec import result as R
    from duckdb_cubit_tpu.exec.executor import Executor
    from duckdb_cubit_tpu.tpch import answers, load, queries

    catalog = load.load_catalog(sf)
    n_rows = catalog.table("lineitem").num_rows
    ex = Executor(catalog)

    def run():
        rel = ex.execute(queries.get_query(6))
        for c in rel.columns.values():
            jax.block_until_ready(c.array)
        return rel

    rel = run()  # warm / compile
    rows = R.to_strings(rel)
    if answers.answers_available():
        problems = answers.compare(rows, sf, 6)
        if problems:
            print(json.dumps({"error": f"Q6 wrong: {problems[:3]}"}))
            sys.exit(1)

    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    rows_per_s = n_rows / med
    roofline_rows_per_s = HBM_BYTES_PER_S / BYTES_PER_ROW
    print(json.dumps({
        "metric": "tpch_sf1_q6_rows_per_s",
        "value": rows_per_s,
        "unit": "rows/s",
        "vs_baseline": rows_per_s / roofline_rows_per_s,
    }))


if __name__ == "__main__":
    main()
