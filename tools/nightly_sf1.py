#!/usr/bin/env python
"""Nightly-style validation: ALL 22 reference TPC-H q*.sql at SF1 on TPU.

Runs every reference query text (reference
extension/tpch/dbgen/queries/q*.sql, the same files PRAGMA tpch(n)
executes, tpch_extension.cpp:167-178) through the full SQL pipeline at
SF1 and diffs the golden answers (reference
extension/tpch/dbgen/answers/sf1/q*.csv).  Writes a committed artifact
log (VERDICT round-2 item 7: a checked-in SF1 all-22 PASS log).

Usage:  python tools/nightly_sf1.py [--sf 1] [--out ARTIFACTS/sf1_tpu_all22.log]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="ARTIFACTS/sf1_tpu_all22.log")
    ap.add_argument("--queries", default="",
                    help="comma-separated subset, e.g. 10,11,12 (default all)")
    args = ap.parse_args()

    import jax

    from duckdb_cubit_tpu.api import connect
    from duckdb_cubit_tpu.tpch import answers

    qdir = "/root/reference/extension/tpch/dbgen/queries"
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    lines = [
        f"# TPC-H SF{args.sf:g} all-22 validation",
        f"# platform={jax.devices()[0].platform} device={jax.devices()[0]}",
        f"# started={time.strftime('%Y-%m-%d %H:%M:%S')}",
    ]
    t_load = time.time()
    conn = connect(sf=args.sf)
    lines.append(f"# load: {time.time() - t_load:.1f}s")
    n_pass = 0
    todo = ([int(x) for x in args.queries.split(",") if x.strip()]
            if args.queries else list(range(1, 23)))
    for n in todo:
        with open(os.path.join(qdir, f"q{n:02d}.sql")) as f:
            sql = f.read()
        t0 = time.time()
        try:
            rows = conn.sql(sql).strings()
            dt = time.time() - t0
            t1 = time.time()
            rows2 = conn.sql(sql).strings()   # steady-state (compiled cache)
            dt2 = time.time() - t1
            problems = answers.compare(rows, args.sf, n)
            problems += answers.compare(rows2, args.sf, n)
            status = "PASS" if not problems else f"FAIL {problems[:3]}"
        except Exception as e:  # noqa: BLE001 - record, keep going
            dt, dt2 = time.time() - t0, float("nan")
            status = f"ERROR {type(e).__name__}: {e}"
        if status == "PASS":
            n_pass += 1
        line = f"q{n:02d}  {status}  first={dt:8.1f}s  steady={dt2:7.3f}s"
        lines.append(line)
        print(line, flush=True)
        # write incrementally so a timeout still leaves a usable artifact
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")
    lines.append(f"# {n_pass}/{len(todo)} PASS  finished={time.strftime('%Y-%m-%d %H:%M:%S')}")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}: {n_pass}/22 PASS")
    sys.exit(0 if n_pass == len(todo) else 1)


if __name__ == "__main__":
    main()
