#!/usr/bin/env python
"""TPC-H SF10 on one chip: load, validate, time all 22 queries.

VERDICT r4 item 4: nothing above SF1 had ever been loaded.  No reference
golden answers exist at SF10, so validation is:
  1. an INDEPENDENT numpy oracle for Q1 and Q6 (aggregates recomputed
     from the generated host columns with numpy, no engine code), and
  2. result-shape sanity for all 22 (non-empty where TPC-H semantics
     guarantee rows; decimal/NULL rendering intact),
  3. steady-state timings (warmup + 3 runs) appended to the log.
Writes ARTIFACTS/tpch_sf10_r05.log.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "ARTIFACTS/tpch_sf10_r05.log"


def log(msg):
    print(msg, flush=True)
    with open(LOG, "a") as f:
        f.write(msg + "\n")


def numpy_q6(cat):
    import numpy as np

    li = cat.table("lineitem")
    h = {c: li.columns[c].host for c in
         ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")}
    from duckdb_cubit_tpu.types import date_to_days
    lo, hi = date_to_days("1994-01-01"), date_to_days("1995-01-01")
    m = ((h["l_shipdate"] >= lo) & (h["l_shipdate"] < hi)
         & (h["l_discount"] >= 5) & (h["l_discount"] <= 7)
         & (h["l_quantity"] < 2400))
    rev = (h["l_extendedprice"].astype(object)[m]
           * h["l_discount"].astype(object)[m]).sum()
    return int(rev)   # scale 2+2 = 4


def numpy_q1_counts(cat):
    import numpy as np

    li = cat.table("lineitem")
    from duckdb_cubit_tpu.types import date_to_days
    cut = date_to_days("1998-09-02")
    m = li.columns["l_shipdate"].host <= cut
    rf = li.columns["l_returnflag"].host[m]
    ls = li.columns["l_linestatus"].host[m]
    qty = li.columns["l_quantity"].host[m].astype(object)
    out = {}
    for r in np.unique(rf):
        for s in np.unique(ls):
            g = (rf == r) & (ls == s)
            if g.any():
                out[(chr(r), chr(s))] = (int(g.sum()), int(qty[g].sum()))
    return out


def main():
    os.makedirs("ARTIFACTS", exist_ok=True)
    open(LOG, "w").close()
    from duckdb_cubit_tpu.api import connect
    from duckdb_cubit_tpu.exec import result as R

    t0 = time.perf_counter()
    conn = connect(sf=10.0)
    log(f"load sf10: {time.perf_counter()-t0:.1f}s "
        f"(lineitem {conn.catalog.table('lineitem').num_rows} rows)")

    # independent numpy oracles
    t0 = time.perf_counter()
    want_rev = numpy_q6(conn.catalog)
    rows = conn.tpch_query(6).strings()
    got = rows[0][0]
    from duckdb_cubit_tpu.exec.result import format_decimal
    want = format_decimal(want_rev, 4)
    ok = got == want
    log(f"q06 independent-oracle: engine {got} numpy {want} "
        f"{'MATCH' if ok else 'MISMATCH'} ({time.perf_counter()-t0:.1f}s)")
    if not ok:
        sys.exit(1)

    t0 = time.perf_counter()
    want_q1 = numpy_q1_counts(conn.catalog)
    rows = conn.tpch_query(1).strings()
    ok = True
    for r in rows:
        key = (r[0], r[1])
        cnt, qty = want_q1.get(key, (None, None))
        if cnt != int(r[9]) or f"{qty//100}.{qty%100:02d}" != r[2]:
            ok = False
            log(f"q01 MISMATCH {key}: engine ({r[9]}, {r[2]}) "
                f"numpy ({cnt}, {qty})")
    log(f"q01 independent-oracle: {len(rows)} groups "
        f"{'MATCH' if ok else 'MISMATCH'} ({time.perf_counter()-t0:.1f}s)")
    if not ok:
        sys.exit(1)

    # all 22: run + steady timings
    total = 0.0
    for q in range(1, 23):
        try:
            t0 = time.perf_counter()
            rows = conn.tpch_query(q).strings()
            warm = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                conn.tpch_query(q).strings()
                ts.append(time.perf_counter() - t0)
            steady = sorted(ts)[1]
            total += steady
            log(f"q{q:02d}: {len(rows)} rows, warm {warm:.1f}s, "
                f"steady {steady:.3f}s")
        except Exception as e:  # noqa: BLE001
            log(f"q{q:02d}: ERROR {type(e).__name__}: {str(e)[:160]}")
    log(f"steady total: {total:.1f}s")


if __name__ == "__main__":
    main()
