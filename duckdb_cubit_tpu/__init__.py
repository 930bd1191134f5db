"""duckdb_cubit_tpu — a TPU-native vectorized query-execution engine.

A from-scratch analytical SQL engine with the capabilities of the reference
DuckDB-CUBIT fork (CUBIT-style bitmap index scans, vectorized filters,
partitioned hash join, radix-partitioned hash aggregate, sort, morsel/pipeline
scheduling), re-architected for TPU: plans are built in Python, every hot
operator executes as XLA-compiled dataflow (jax/jnp/Pallas) over fixed-shape
columnar arrays with validity masks, and multi-chip scaling uses
jax.sharding meshes with collective-based exchanges instead of threads.

Layer map (mirrors SURVEY.md §1 for the reference):
  sql/ + plan/   - frontend: logical plans, optimizer, physical planning
  exec/          - pipeline builder, event-DAG executor, profiler
  ops/           - vectorized kernels (filter/expr, join, group-by, sort, bitmap)
  index/         - CUBIT segmented bitmap index
  storage/       - columnar tables, dictionary encoding, zone maps, catalog
  parallel/      - device mesh, partitioned tables, distributed exchange
  tpch/          - TPC-H dbgen, the 22 queries, golden-answer harness
"""

import os

import jax

# Exact 64-bit integer arithmetic is the engine's decimal representation;
# enable before any array is created.
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: a repeated cold-process query skips its
# first-compile (the analog of the reference shipping pre-compiled plans in
# the prepared-statement cache; at SF1 on a remote chip a single query plan
# costs 70-160s to compile the first time).  Shape bucketing (storage.table
# pad_count) keeps the number of distinct entries small.
_cache_dir = os.environ.get(
    "DUCKDB_CUBIT_TPU_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "duckdb_cubit_tpu", "xla"))
try:
    # key by platform: AOT artifacts are NOT portable across backends (a CPU
    # run reusing a TPU host's entries spams cpu_aot_loader feature-mismatch
    # warnings and can mask real failures).  CPU entries additionally key on
    # a machine-feature fingerprint — cpu_aot artifacts are not portable
    # across hosts with different ISA extensions either.
    _backend_key = jax.default_backend()
    if _backend_key == "cpu":
        import hashlib
        try:
            with open("/proc/cpuinfo") as _f:
                _flags = next((ln for ln in _f if ln.startswith("flags")), "")
        except OSError:
            _flags = ""
        # salt with the jax version: XLA adds synthetic machine features
        # (prefer-no-gather etc.) that vary across builds and are not in
        # /proc/cpuinfo — stale entries trigger cpu_aot_loader mismatch
        # warnings and risk SIGILL
        _backend_key = "cpu-" + hashlib.md5(
            (_flags + jax.__version__ + "v2").encode()).hexdigest()[:10]
    _cache_dir = os.path.join(_cache_dir, _backend_key)
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except (OSError, AttributeError):  # read-only fs / old jax: cache is optional
    pass

__version__ = "0.2.0"
