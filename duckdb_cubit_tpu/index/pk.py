"""Direct-address primary-key index.

The TPU analog of the reference's ART primary-key index feeding join builds
(reference src/execution/index/art/): TPC-H keys are dense (or near-dense,
e.g. sparse order keys at 4x density), so key -> row resolves with a single
int32 lookup array built once at ingest.  PK-FK hash joins then skip the
whole build phase (sort + insert loops) and probe with one gather, with the
build side's filter mask applied through the looked-up row — the fastest
possible join on gather-friendly hardware.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class DirectPKIndex:
    def __init__(self, column: str, lut: jnp.ndarray, max_key: int):
        self.column = column
        self.lut = lut          # (max_key+1,) int32 row id, -1 = absent
        self.max_key = max_key
        # per-column VALUE luts in key space: vlut[slot] = column[lut[slot]]
        # (0 where absent — callers mask by `found`).  Lets the Pallas
        # monotone probe kernel fetch build VALUES directly, replacing one
        # ~134 Mrow/s XLA gather per column with a ~1.3 Grow/s kernel pass.
        # Cached on this object: DML rebuilds the index, so entries can
        # never go stale.
        self._value_luts: dict = {}
        self._lut_host: np.ndarray | None = None

    def device_value_lut(self, name: str, host_col: np.ndarray):
        """Device int32 value-lut for a base column (host-built once)."""
        v = self._value_luts.get(name)
        if v is None:
            if self._lut_host is None:
                self._lut_host = np.asarray(self.lut)
            lh = self._lut_host
            vals = np.asarray(host_col)[np.maximum(lh, 0)].astype(np.int32)
            vals[lh < 0] = 0
            v = self._value_luts[name] = jnp.asarray(vals)
        return v

    @classmethod
    def build(cls, column: str, keys: np.ndarray, num_rows: int,
              density_limit: float = 8.0) -> "DirectPKIndex | None":
        """Build from host key values; returns None if keys are unsuitable
        (duplicates, negatives, or too sparse to justify the array)."""
        keys = np.asarray(keys[:num_rows], dtype=np.int64)
        if num_rows == 0:
            return None
        max_key = int(keys.max())
        if keys.min() < 0 or max_key + 1 > density_limit * num_rows:
            return None
        lut = np.full(max_key + 1, -1, np.int32)
        lut[keys] = np.arange(num_rows, dtype=np.int32)
        if (lut[keys] != np.arange(num_rows)).any():
            return None  # duplicate keys
        return cls(column, jnp.asarray(lut), max_key)

    def probe(self, probe_keys: jnp.ndarray, probe_valid: jnp.ndarray,
              build_mask: jnp.ndarray):
        """-> (build row per probe row, found mask)."""
        k = probe_keys.astype(jnp.int64)
        in_range = (k >= 0) & (k <= self.max_key) & probe_valid
        safe_k = jnp.clip(k, 0, self.max_key)
        row = self.lut[safe_k]
        present = row >= 0
        safe_row = jnp.maximum(row, 0)
        alive = build_mask[safe_row]
        found = in_range & present & alive
        return jnp.where(found, row, -1), found
