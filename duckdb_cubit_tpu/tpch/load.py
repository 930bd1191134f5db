"""TPC-H ingest: generate, upload, index.

Analog of the reference's `CALL dbgen(sf=...)` path (reference
extension/tpch/tpch_extension.cpp:65 DbgenFunction -> DBGenWrapper ->
Appender): generates tables with the native columnar generator, uploads them
as device Tables, and builds the default CUBIT indexes.
"""

from __future__ import annotations

import numpy as np

from ..index.cubit import CubitIndex
from ..storage.table import Catalog, Table, from_numpy
from . import dbgen
from .schema import DEFAULT_INDEXES, SCHEMA

_CACHE: dict[float, Catalog] = {}


def build_indexes(table: Table, spec: dict):
    import jax.numpy as jnp

    for col_name, (kind, arg) in spec.items():
        col = table.columns[col_name]
        host_vals = np.asarray(col.data[: table.num_rows])
        if kind == "identity":
            n_bins = int(arg)
            idx = CubitIndex.build(col_name, host_vals.astype(np.int32),
                                   table.capacity, table.num_rows, n_bins)
        elif kind == "edges":
            edges = np.asarray(arg, dtype=np.int64)
            idx = CubitIndex.build(col_name, host_vals.astype(np.int64),
                                   table.capacity, table.num_rows,
                                   len(edges), bin_edges=edges)
        elif kind == "dict":
            assert col.dictionary is not None, f"{col_name} is not VARCHAR"
            idx = CubitIndex.build(col_name, host_vals.astype(np.int32),
                                   table.capacity, table.num_rows,
                                   col.dict_size)
        elif kind == "values":
            values = np.unique(host_vals).astype(np.int64)
            idx = CubitIndex.build(col_name, host_vals.astype(np.int64),
                                   table.capacity, table.num_rows,
                                   len(values), bin_edges=values)
        else:
            raise ValueError(kind)
        table.indexes[col_name] = idx


def load_catalog(sf: float = 0.01, with_indexes: bool = True,
                 cache: bool = True) -> Catalog:
    if cache and sf in _CACHE:
        return _CACHE[sf]
    tables = dbgen.gen_all(sf)
    catalog = Catalog()
    for name, cols in tables.items():
        t = from_numpy(name, cols, SCHEMA.get(name, {}))
        if with_indexes and name in DEFAULT_INDEXES:
            build_indexes(t, DEFAULT_INDEXES[name])
        catalog.register(t)
    if cache:
        _CACHE[sf] = catalog
    return catalog
