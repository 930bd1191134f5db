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

import jax

# Exact 64-bit integer arithmetic is the engine's decimal representation;
# enable before any array is created.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
