"""Interactive-ish TPU probe: loads SF1 catalog once, then executes any
python snippets dropped into tools/probe_jobs/ (watched loop).  Lets us
iterate on device experiments without paying the catalog load each time.
Usage: python tools/tpu_probe.py  (background)
Then: write a .py file into tools/probe_jobs/; results append to
tools/probe_out.log.  Exits when tools/probe_jobs/STOP exists.
"""
import glob
import os
import time
import traceback

HERE = os.path.dirname(os.path.abspath(__file__))
JOBS = os.path.join(HERE, "probe_jobs")
LOG = os.path.join(HERE, "probe_out.log")
os.makedirs(JOBS, exist_ok=True)


def log(msg):
    with open(LOG, "a") as f:
        f.write(msg + "\n")


def main():
    t0 = time.time()
    import jax  # noqa
    from duckdb_cubit_tpu.tpch import load
    catalog = load.load_catalog(1.0)
    log(f"[probe] catalog SF1 loaded in {time.time()-t0:.1f}s")
    env = {"catalog": catalog, "jax": jax, "log": log, "time": time}
    seen = set()
    while not os.path.exists(os.path.join(JOBS, "STOP")):
        for path in sorted(glob.glob(os.path.join(JOBS, "*.py"))):
            if path in seen:
                continue
            seen.add(path)
            log(f"[probe] running {os.path.basename(path)}")
            try:
                with open(path) as f:
                    code = f.read()
                exec(compile(code, path, "exec"), env)
                log(f"[probe] done {os.path.basename(path)}")
            except Exception:
                log(traceback.format_exc())
        time.sleep(1.0)
    log("[probe] stopped")


if __name__ == "__main__":
    main()
