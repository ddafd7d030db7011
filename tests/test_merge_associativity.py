"""Byte-identical results under arbitrary merge orderings — the
north rule's associativity gate (BASELINE.json:6, SURVEY.md §7.4).

For each sketch type: build a fixed set of partials, merge them under
~20 seeded random binary trees / permutations, assert every ordering
serializes to identical bytes.
"""

import numpy as np
import pytest

from fuggetabouspark.params import (
    BloomParams,
    CMSParams,
    HLLParams,
    KLLParams,
    ScalingParams,
    TDigestParams,
    TimingParams,
)
from fuggetabouspark.sketches import (
    KLL,
    CountMinSketch,
    CountingBloomFilter,
    HyperLogLog,
    ScalingTimingBloomFilter,
    TDigest,
    TimingBloomFilter,
)

N_PARTIALS = 9
N_TREES = 20


def _random_tree_merge(parts, rng):
    """Merge a random permutation under a random binary tree shape."""
    items = [parts[i] for i in rng.permutation(len(parts))]
    while len(items) > 1:
        i = int(rng.integers(0, len(items) - 1))
        a = items.pop(i)
        b = items.pop(i)
        items.insert(int(rng.integers(0, len(items) + 1)), a.merge(b))
    return items[0]


def _assert_order_invariant(parts):
    rng = np.random.default_rng(7)
    ref = None
    for _ in range(N_TREES):
        got = _random_tree_merge(parts, rng).to_bytes()
        if ref is None:
            ref = got
        assert got == ref, "merge result depends on merge ordering"


@pytest.fixture(scope="module")
def key_chunks():
    rng = np.random.default_rng(123)
    keys = rng.choice(10**9, size=9_000, replace=False).astype(np.int64)
    return np.array_split(keys, N_PARTIALS)


def test_cbf(key_chunks):
    p = BloomParams(5000, 0.01)
    _assert_order_invariant([CountingBloomFilter.zero(p).add_batch(c) for c in key_chunks])


def test_tbf(key_chunks):
    p = TimingParams(5000, 0.01, window_ticks=50)
    parts = [
        TimingBloomFilter.zero(p).add_batch(c, i + 1) for i, c in enumerate(key_chunks)
    ]
    _assert_order_invariant(parts)


def test_stbf(key_chunks):
    p = ScalingParams(300, 0.01, window_ticks=50)  # small capacity => tiers grow
    parts = [
        ScalingTimingBloomFilter.zero(p).add_batch(c, i + 1)
        for i, c in enumerate(key_chunks)
    ]
    assert any(len(x.tiers) > 1 for x in parts), "fixture must exercise grown ladders"
    _assert_order_invariant(parts)


def test_hll(key_chunks):
    p = HLLParams(p=12)
    _assert_order_invariant([HyperLogLog.zero(p).add_batch(c) for c in key_chunks])


def test_cms(key_chunks):
    p = CMSParams(eps=0.01, delta=0.05)
    _assert_order_invariant([CountMinSketch.zero(p).add_batch(c) for c in key_chunks])


def test_tdigest(key_chunks):
    p = TDigestParams(compression=100)
    parts = [TDigest.from_values(p, c.astype(np.float64)) for c in key_chunks]
    _assert_order_invariant(parts)


def test_kll(key_chunks):
    p = KLLParams(k=128)
    parts = [KLL.from_values(p, c.astype(np.float64)) for c in key_chunks]
    _assert_order_invariant(parts)
