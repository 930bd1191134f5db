"""TPC-H ingest: generate, upload, index.

Analog of the reference's `CALL dbgen(sf=...)` path (reference
extension/tpch/tpch_extension.cpp:65 DbgenFunction -> DBGenWrapper ->
Appender): generates tables with the native columnar generator, uploads them
as device Tables, and builds the default CUBIT indexes.
"""

from __future__ import annotations

import os

import numpy as np

from ..index.cubit import CubitIndex
from ..index.pk import DirectPKIndex
from ..storage.table import Catalog, Table, encode_strings, from_numpy
from . import dbgen
from .schema import (DEFAULT_INDEXES, FOREIGN_KEYS, PK_COLUMNS, SCHEMA,
                     UNIQUE_KEYS)

_CACHE: dict[float, Catalog] = {}
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DISK_CACHE_DIR = os.path.join(_ROOT, "data_cache")


def _disk_cache_path(sf: float) -> str:
    return os.path.join(DISK_CACHE_DIR, f"tpch_sf{sf}.npz")


def _save_disk_cache(sf: float, tables: dict):
    """Persist generated tables with strings pre-dictionary-encoded."""
    os.makedirs(DISK_CACHE_DIR, exist_ok=True)
    blobs = {}
    for tname, cols in tables.items():
        for cname, arr in cols.items():
            if arr.dtype.kind == "S":
                codes, dictionary = encode_strings(arr)
                blobs[f"{tname}/{cname}/codes"] = codes
                blobs[f"{tname}/{cname}/dict"] = dictionary
            else:
                blobs[f"{tname}/{cname}/raw"] = arr
    tmp = _disk_cache_path(sf) + ".tmp"
    np.savez(tmp, **blobs)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
               _disk_cache_path(sf))


def _load_disk_cache(sf: float):
    path = _disk_cache_path(sf)
    if not os.path.exists(path):
        return None
    z = np.load(path)
    tables: dict[str, dict] = {}
    for key in z.files:
        tname, cname, kind = key.split("/")
        tables.setdefault(tname, {}).setdefault(cname, {})[kind] = z[key]
    return tables


def build_indexes(table: Table, spec: dict):
    import jax.numpy as jnp

    for col_name, (kind, arg) in spec.items():
        col = table.columns[col_name]
        # never pull the device array back (D2H permanently degrades the
        # remote-runtime fast path); the ingest keeps an unpadded host mirror
        host_vals = (col.host[: table.num_rows] if col.host is not None
                     else np.asarray(col.data[: table.num_rows]))
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


def build_pk_index(table: Table):
    col_name = PK_COLUMNS.get(table.name)
    if col_name is None:
        return
    col = table.columns[col_name]
    keys = (col.host[: table.num_rows] if col.host is not None
            else np.asarray(col.data[: table.num_rows]))
    pk = DirectPKIndex.build(col_name, keys, table.num_rows)
    if pk is not None:
        table.pk_indexes[col_name] = pk


def load_catalog(sf: float = 0.01, with_indexes: bool = True,
                 cache: bool = True, disk_cache: bool = True) -> Catalog:
    if cache and sf in _CACHE:
        return _CACHE[sf]
    from ..storage.table import from_encoded

    encoded = _load_disk_cache(sf) if disk_cache else None
    catalog = Catalog()
    if encoded is None:
        tables = dbgen.gen_all(sf)
        if disk_cache and sf >= 0.1:
            _save_disk_cache(sf, tables)
        for name, cols in tables.items():
            t = from_numpy(name, cols, SCHEMA.get(name, {}))
            if with_indexes:
                if name in DEFAULT_INDEXES:
                    build_indexes(t, DEFAULT_INDEXES[name])
                build_pk_index(t)
            catalog.register(t)
    else:
        for name, cols in encoded.items():
            t = from_encoded(name, cols, SCHEMA.get(name, {}))
            if with_indexes:
                if name in DEFAULT_INDEXES:
                    build_indexes(t, DEFAULT_INDEXES[name])
                build_pk_index(t)
            catalog.register(t)
    for fk_col, (pk_table, pk_col) in FOREIGN_KEYS.items():
        catalog.register_foreign_key(fk_col, pk_table, pk_col)
    for tname, keys in UNIQUE_KEYS.items():
        catalog.table(tname).unique_keys = list(keys)
    if cache:
        _CACHE[sf] = catalog
    return catalog
