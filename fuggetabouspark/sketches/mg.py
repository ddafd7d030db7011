"""Misra–Gries heavy-hitters summary [P:Misra & Gries 1982;
mergeable-summaries treatment: Agarwal, Cormode, Huang, Phillips,
Wei, Yi, "Mergeable Summaries", PODS 2012].

State: up to k (key, counter) pairs. Point guarantee: true_count -
eps*N <= est <= true_count with eps = 1/(k+1); every key with
frequency > N/(k+1) is guaranteed present. Merge (PODS 2012): add
counters keyed by key, then subtract the (k+1)-th largest counter
from all and drop non-positives — error bounds hold under ANY merge
tree.

Determinism note: the VALUE guarantees are merge-order-invariant;
exact counter values (hence bytes) can differ across merge trees when
truncation engages — unlike the monoid sketches, and stated plainly.
When k exceeds the number of distinct keys, no truncation ever
happens, counters are exact, and byte-identity DOES hold (the
configuration the oracle gate uses). Canonical serialization sorts by
(key) so equal summaries are byte-equal.

Batch update is one np.unique + merge; no per-item Python.
"""

from __future__ import annotations

import numpy as np

from ..params import params_from_json, params_to_json
from .base import Sketch, pack, unpack

from dataclasses import dataclass


@dataclass(frozen=True)
class MGParams:
    k: int = 1024  # max tracked keys; eps = 1/(k+1)


# register with params serialization
from .. import params as _params_mod

_params_mod._PARAM_TYPES.setdefault("MGParams", MGParams)


class MisraGries(Sketch):
    NAME = "mg"

    def __init__(self, params: MGParams, keys: np.ndarray | None = None,
                 counts: np.ndarray | None = None, n_items: int = 0):
        self.params = params
        self.keys = keys if keys is not None else np.zeros(0, dtype=np.int64)
        self.counts = counts if counts is not None else np.zeros(0, dtype=np.int64)
        self.n_items = int(n_items)

    @classmethod
    def zero(cls, params: MGParams) -> "MisraGries":
        return cls(params)

    def _canon(self, keys: np.ndarray, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        order = np.argsort(keys, kind="stable")
        return keys[order], counts[order]

    def _truncate(self, keys: np.ndarray, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        k = self.params.k
        if keys.size <= k:
            return self._canon(keys, counts)
        # subtract the (k+1)-th largest counter, keep positives
        # (deterministic: pure function of the counter multiset)
        kth = np.partition(counts, keys.size - (k + 1))[keys.size - (k + 1)]
        # strict > leaves at most k survivors (ties with the (k+1)-th
        # largest are dropped), and the result is a pure function of
        # the (key, count) multiset — deterministic
        keep = counts > kth
        return self._canon(keys[keep], counts[keep] - kth)

    def add_batch(self, batch_keys: np.ndarray, weights: np.ndarray | None = None) -> "MisraGries":
        batch_keys = np.asarray(batch_keys, dtype=np.int64)
        if batch_keys.size == 0:
            return self
        if weights is not None:
            w = np.asarray(weights, dtype=np.int64)
            order = np.argsort(batch_keys, kind="stable")
            sk, sw = batch_keys[order], w[order]
            edge = np.empty(sk.size, dtype=bool)
            edge[0] = True
            edge[1:] = sk[1:] != sk[:-1]
            uniq = sk[edge]
            cnt = np.add.reduceat(sw, np.flatnonzero(edge))
        else:
            uniq, cnt = np.unique(batch_keys, return_counts=True)
        total = int(cnt.sum())
        keys = np.concatenate([self.keys, uniq])
        counts = np.concatenate([self.counts, cnt])
        keys, counts = _sum_by_key(keys, counts)
        self.keys, self.counts = self._truncate(keys, counts)
        self.n_items += total
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.params != self.params:
            raise ValueError("params mismatch in MG merge")
        keys = np.concatenate([self.keys, other.keys])
        counts = np.concatenate([self.counts, other.counts])
        keys, counts = _sum_by_key(keys, counts)
        out = MisraGries(self.params, n_items=self.n_items + other.n_items)
        out.keys, out.counts = out._truncate(keys, counts)
        return out

    def top_k(self, k: int) -> list[tuple[int, int]]:
        """Top-k by estimated count, ties broken by key asc."""
        order = np.lexsort((self.keys, -self.counts))[:k]
        return [(int(self.keys[i]), int(self.counts[i])) for i in order]

    def estimate(self, probe: np.ndarray) -> np.ndarray:
        """Lower-bound counts (0 for untracked keys)."""
        probe = np.asarray(probe, dtype=np.int64)
        if self.keys.size == 0:
            return np.zeros(probe.shape, dtype=np.int64)
        idx = np.clip(np.searchsorted(self.keys, probe), 0, self.keys.size - 1)
        return np.where(self.keys[idx] == probe, self.counts[idx], 0)

    def to_bytes(self) -> bytes:
        return pack(self.NAME, params_to_json(self.params), self.n_items, [self.keys, self.counts])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "MisraGries":
        name, pj, n_items, arrays = unpack(buf)
        if name != cls.NAME:
            raise ValueError(f"expected {cls.NAME}, got {name}")
        return cls(params_from_json(pj), arrays[0].astype(np.int64, copy=False),
                   arrays[1].astype(np.int64, copy=False), n_items)


def _sum_by_key(keys: np.ndarray, counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if keys.size == 0:
        return keys, counts
    order = np.argsort(keys, kind="stable")
    sk, sc = keys[order], counts[order]
    edge = np.empty(sk.size, dtype=bool)
    edge[0] = True
    edge[1:] = sk[1:] != sk[:-1]
    return sk[edge], np.add.reduceat(sc, np.flatnonzero(edge))
