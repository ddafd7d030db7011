"""CountingBloomFilter — counter-array Bloom filter with delete support.

Reimplements the semantics of upstream fuggetaboutit's
CountingBloomFilter (SURVEY.md §2.2,
[U:fuggetaboutit/counting_bloom_filter.py]): k counters per key via
double hashing; ``add`` increments, ``remove`` decrements with an
underflow guard, ``contains`` requires all k counters > 0; merge is
elementwise counter addition.

Distributed divergences (deliberate, documented in SURVEY.md §1.2):
- counters are uint16 with **saturating** add (upstream uses narrow
  ints; saturation keeps merge associative: min(a+b+c, MAX) regardless
  of grouping, since all addends are >= 0);
- updates are whole-batch numpy (bincount scatter-add), never per-key
  Python;
- ``remove`` is only sound before any saturating/merged counts — same
  caveat as any counting Bloom filter, flagged in the docstring.
"""

from __future__ import annotations

import numpy as np

from ..hashing import bloom_indexes, hash_pair, indexes_from_pair
from ..params import BloomParams, params_from_json, params_to_json
from .base import Sketch, pack, unpack

_MAX = np.uint16(0xFFFF)


class CountingBloomFilter(Sketch):
    NAME = "cbf"

    def __init__(self, params: BloomParams, counts: np.ndarray | None = None, n_items: int = 0):
        self.params = params
        self.m, self.k = params.m, params.k
        self.counts = counts if counts is not None else np.zeros(self.m, dtype=np.uint16)
        self.n_items = int(n_items)

    # ---- construction ----
    @classmethod
    def zero(cls, params: BloomParams) -> "CountingBloomFilter":
        return cls(params)

    # ---- update (vectorized batch) ----
    def add_batch(self, keys: np.ndarray, pair=None, weights: np.ndarray | None = None) -> "CountingBloomFilter":
        """Saturating scatter-add of k counters per key; whole batch at
        once. ``pair`` lets the pipeline share one hash_pair(keys)
        across every Bloom-family sketch in the batch; ``weights``
        folds pre-aggregated duplicate counts in one pass (identical
        result to repeating each key weights[i] times)."""
        keys = np.asarray(keys)
        if keys.size == 0:
            return self
        h1, h2 = pair if pair is not None else hash_pair(keys)
        idx = indexes_from_pair(h1, h2, self.k, self.m).ravel()
        w = None if weights is None else np.repeat(np.asarray(weights, dtype=np.int64), self.k)
        if self.m <= (1 << 26):
            # dense path: np.add.at into one int64 transient + whole-
            # array saturate. 2.3–3× the previous bincount formulation
            # at bench geometry (weighted bincount detours through
            # float64; ufunc.at has an indexed fast path on numpy ≥2 —
            # same lesson as TBF's maximum.at). O(m) transient
            # (8 B/bucket) — fine while m is small
            wide = np.zeros(self.m, dtype=np.int64)
            np.add.at(wide, idx, 1 if w is None else w)
            wide += self.counts
            np.minimum(wide, int(_MAX), out=wide)
            self.counts = wide.astype(np.uint16)
        else:
            # giant-filter path: saturating add over ONLY the touched
            # buckets (sort+reduceat); memory O(batch·k), never O(m) —
            # the dense transient would be tens of GB at m ~ 5e9
            order = np.argsort(idx, kind="stable")
            si = idx[order]
            edge = np.empty(si.size, dtype=bool)
            edge[0] = True
            edge[1:] = si[1:] != si[:-1]
            uniq_idx = si[edge]
            starts = np.flatnonzero(edge)
            if w is None:
                inc = np.diff(np.concatenate([starts, [si.size]]))
            else:
                ps = np.concatenate([np.zeros(1, np.int64), np.cumsum(w[order])])
                bounds = np.concatenate([starts, [si.size]])
                inc = ps[bounds[1:]] - ps[bounds[:-1]]
            cur = self.counts[uniq_idx].astype(np.int64) + inc
            np.minimum(cur, int(_MAX), out=cur)
            self.counts[uniq_idx] = cur.astype(np.uint16)
        self.n_items += int(keys.size if weights is None else np.sum(weights))
        return self

    def remove_batch(self, keys: np.ndarray) -> "CountingBloomFilter":
        """Clip-at-zero decrement. Best-effort once counters saturated or
        merged across partials — identical caveat to upstream CBF delete."""
        keys = np.asarray(keys)
        if keys.size == 0:
            return self
        idx = bloom_indexes(keys, self.k, self.m).ravel()
        uniq_idx, dec = np.unique(idx, return_counts=True)  # touched buckets only
        cur = self.counts[uniq_idx].astype(np.int64) - dec
        np.maximum(cur, 0, out=cur)
        self.counts[uniq_idx] = cur.astype(np.uint16)
        self.n_items = max(0, self.n_items - int(keys.size))
        return self

    # ---- upstream-parity scalar surface ----
    def add(self, key, weight: int = 1) -> "CountingBloomFilter":
        """fuggetaboutit-style scalar add; key may be int or str."""
        from .base import as_keys

        return self.add_batch(
            as_keys(key), weights=None if weight == 1 else np.array([weight], np.int64)
        )

    def remove(self, key) -> "CountingBloomFilter":
        from .base import as_keys

        return self.remove_batch(as_keys(key))

    def contains(self, key) -> bool:
        from .base import as_keys

        return bool(self.contains_batch(as_keys(key))[0])

    __contains__ = contains

    # ---- query ----
    def contains_batch(self, keys: np.ndarray, pair=None) -> np.ndarray:
        keys = np.asarray(keys)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = pair if pair is not None else hash_pair(keys)
        idx = indexes_from_pair(h1, h2, self.k, self.m)
        return self.counts[idx].min(axis=1) > 0

    def fill_ratio(self) -> float:
        return float(np.count_nonzero(self.counts)) / self.m

    def estimate_size(self) -> float:
        """Fill-ratio cardinality estimate -(m/k) * ln(1 - fill)."""
        fill = self.fill_ratio()
        if fill >= 1.0:
            return float("inf")
        return -(self.m / self.k) * float(np.log1p(-fill))

    def __len__(self) -> int:
        return self.n_items

    # ---- merge (associative + commutative saturating add) ----
    def merge(self, other: "CountingBloomFilter") -> "CountingBloomFilter":
        if other.params != self.params:
            raise ValueError("geometry mismatch in CBF merge")
        out = np.empty(self.m, dtype=np.uint16)
        # chunked saturating add: transient stays <= ~1.5 GB regardless
        # of filter size (a whole-array int64 widen is 3*8 B/bucket —
        # tens of GB on giant filters)
        step = 1 << 26
        for lo in range(0, self.m, step):
            hi = min(lo + step, self.m)
            wide = self.counts[lo:hi].astype(np.int64) + other.counts[lo:hi].astype(np.int64)
            np.minimum(wide, int(_MAX), out=wide)
            out[lo:hi] = wide.astype(np.uint16)
        return CountingBloomFilter(self.params, out, self.n_items + other.n_items)

    # ---- serialization ----
    def to_bytes(self) -> bytes:
        return pack(self.NAME, params_to_json(self.params), self.n_items, [self.counts])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountingBloomFilter":
        name, pj, n_items, arrays = unpack(buf)
        if name != cls.NAME:
            raise ValueError(f"expected {cls.NAME}, got {name}")
        return cls(params_from_json(pj), arrays[0].astype(np.uint16, copy=False), n_items)
