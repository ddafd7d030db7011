"""KLL quantile sketch [P:Karnin–Lang–Liberty 2016; KLL± VLDB 2021].

From-scratch, derandomized, distributed-friendly:

- ``from_values`` builds a partial by the classic KLL level-compaction
  scheme (level l holds items of weight 2^l; a full level sorts and
  promotes every other item), with the random coin replaced by a
  deterministic splitmix64 parity of (level, compaction counter) —
  required for the byte-identical merge-order invariance the north
  rule tests (SURVEY.md §7.4; Date.now()-style entropy is forbidden).
  Compaction is whole-array numpy slicing, no per-item Python.
- ``merge`` is an exact sorted multiset union of (value, weight)
  samples — associative, commutative, canonical — identical policy to
  tdigest.py; merged state is O(#partials * k).
- ``compressed()`` re-runs deterministic level compaction over the
  merged samples to bound state; applied only at checkpoint/answer
  time, never inside the merge lattice.

Rank error of a k-sized KLL is eps = O((1/k) * sqrt(log(1/delta)));
tests pin an empirical rank-error budget against exact quantiles.
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import splitmix64
from ..params import KLLParams, params_from_json, params_to_json
from .base import Sketch, pack, unpack

_C = 2.0 / 3.0  # level-capacity decay from the KLL paper


def _coin(level: int, count: int) -> int:
    """Deterministic pseudo-random bits for compaction of (level, count).

    Bit 0 chooses the even/odd offset; bit 1 chooses which end keeps the
    leftover element of an odd-sized buffer. Replaces the KLL paper's
    random coin so results are byte-reproducible (SURVEY.md §2.3
    randomness note)."""
    x = np.array([(level << 32) ^ count], dtype=np.uint64)
    return int(splitmix64(x)[0] & np.uint64(3))


def _capacity(k: int, level: int, top: int) -> int:
    return max(8, int(math.ceil(k * (_C ** (top - level)))))


def _compact_levels(levels: list[np.ndarray], k: int) -> list[np.ndarray]:
    """Run deterministic KLL compaction until every level fits."""
    counts = [0] * 64
    l = 0
    while l < len(levels):
        top = len(levels) - 1
        buf = levels[l]
        if buf.size > _capacity(k, l, top):
            buf = np.sort(buf)
            bits = _coin(l, counts[l])
            counts[l] += 1
            # odd buffer: one element stays at this level so total mass
            # (sum of weights) is exactly preserved
            if buf.size % 2:
                if bits & 2:
                    keep, body = buf[:1], buf[1:]
                else:
                    keep, body = buf[-1:], buf[:-1]
            else:
                keep, body = np.empty(0, dtype=np.float64), buf
            promoted = body[bits & 1 :: 2]
            levels[l] = keep
            if l + 1 >= len(levels):
                levels.append(np.empty(0, dtype=np.float64))
            levels[l + 1] = np.concatenate([levels[l + 1], promoted])
            l = 0  # capacities depend on top level; recheck from bottom
        else:
            l += 1
    return levels


class KLL(Sketch):
    NAME = "kll"

    def __init__(self, params: KLLParams, values: np.ndarray | None = None,
                 weights: np.ndarray | None = None, n_items: int = 0):
        self.params = params
        self.values = values if values is not None else np.zeros(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.zeros(0, dtype=np.int64)
        self.n_items = int(n_items)

    @classmethod
    def zero(cls, params: KLLParams) -> "KLL":
        return cls(params)

    @classmethod
    def from_values(cls, params: KLLParams, values: np.ndarray) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        n = int(v.size)
        levels = _compact_levels([v.copy()], params.k)
        vals, wts = _levels_to_samples(levels)
        return cls(params, vals, wts, n)

    def add(self, value: float) -> "KLL":
        return self.add_batch(np.array([value], dtype=np.float64))

    def add_batch(self, values: np.ndarray) -> "KLL":
        merged = self.merge(KLL.from_values(self.params, values))
        self.values, self.weights, self.n_items = merged.values, merged.weights, merged.n_items
        return self

    # ---- merge: exact sorted multiset union ----
    def merge(self, other: "KLL") -> "KLL":
        if other.params != self.params:
            raise ValueError("params mismatch in KLL merge")
        v = np.concatenate([self.values, other.values])
        w = np.concatenate([self.weights, other.weights])
        order = np.lexsort((w, v))  # canonical
        return KLL(self.params, v[order], w[order], self.n_items + other.n_items)

    def compressed(self) -> "KLL":
        """Deterministic level compaction of the merged samples; bounds
        state to O(k). Changes bytes; checkpoint/answer time only."""
        if self.values.size == 0:
            return KLL(self.params, n_items=self.n_items)
        lw = np.round(np.log2(self.weights)).astype(np.int64)
        if not np.array_equal(2 ** lw.astype(np.float64), self.weights.astype(np.float64)):
            raise ValueError("KLL weights must be powers of two")
        levels = [self.values[lw == l].copy() for l in range(int(lw.max()) + 1)]
        levels = _compact_levels(levels, self.params.k)
        vals, wts = _levels_to_samples(levels)
        return KLL(self.params, vals, wts, self.n_items)

    # ---- query ----
    def quantiles(self, qs: np.ndarray) -> np.ndarray:
        # values are canonically value-sorted (merge/_levels_to_samples
        # both lexsort with value primary) — no re-sort needed
        from .base import weighted_quantiles

        return weighted_quantiles(self.values, self.weights, qs)

    def quantile(self, q: float) -> float:
        return float(self.quantiles(np.asarray([q]))[0])

    def rank(self, x: float) -> float:
        if self.values.size == 0:
            return float("nan")
        hi = np.searchsorted(self.values, x, side="right")
        w = self.weights.astype(np.float64)
        return float(w[:hi].sum() / w.sum())

    def to_bytes(self) -> bytes:
        return pack(self.NAME, params_to_json(self.params), self.n_items, [self.values, self.weights])

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLL":
        name, pj, n_items, arrays = unpack(buf)
        if name != cls.NAME:
            raise ValueError(f"expected {cls.NAME}, got {name}")
        return cls(params_from_json(pj), arrays[0], arrays[1].astype(np.int64, copy=False), n_items)


def _levels_to_samples(levels: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    vals = []
    wts = []
    for l, buf in enumerate(levels):
        if buf.size:
            vals.append(buf)
            wts.append(np.full(buf.size, 2**l, dtype=np.int64))
    if not vals:
        return np.zeros(0, dtype=np.float64), np.zeros(0, dtype=np.int64)
    v = np.concatenate(vals)
    w = np.concatenate(wts)
    order = np.lexsort((w, v))
    return v[order], w[order]
