"""Published-error-bound tests for the companion sketches
(SURVEY.md §2.3): HLL rel. err, CMS eps*N overcount, t-digest/KLL
quantile rank error — each vs exact numpy ground truth.
"""

import numpy as np
import pytest

from fuggetabouspark.params import CMSParams, HLLParams, KLLParams, TDigestParams
from fuggetabouspark.sketches import KLL, CountMinSketch, HyperLogLog, TDigest, sketch_from_bytes


class TestHLL:
    @pytest.mark.parametrize("n", [100, 5_000, 200_000])
    def test_estimate_within_bound(self, rng, n):
        p = HLLParams(p=14)
        keys = rng.choice(2**62, size=n, replace=False).astype(np.int64)
        h = HyperLogLog.zero(p).add_batch(keys)
        rel = abs(h.estimate() - n) / n
        # 1.04/sqrt(2^14) ~ 0.0081 std err; allow 4 sigma
        assert rel < 4 * 1.04 / np.sqrt(p.m), f"HLL rel err {rel} out of bound at n={n}"

    def test_duplicates_dont_count(self, rng):
        keys = rng.choice(1000, size=100_000, replace=True).astype(np.int64)
        h = HyperLogLog.zero(HLLParams(p=14)).add_batch(keys)
        true = len(np.unique(keys))
        assert abs(h.estimate() - true) / true < 0.05

    def test_merge_max(self, rng):
        p = HLLParams(p=12)
        keys = rng.choice(2**62, size=10_000, replace=False).astype(np.int64)
        whole = HyperLogLog.zero(p).add_batch(keys)
        a = HyperLogLog.zero(p).add_batch(keys[:6000])
        b = HyperLogLog.zero(p).add_batch(keys[4000:])  # overlap on purpose
        m = a.merge(b)
        assert m.registers.tobytes() == whole.registers.tobytes(), "HLL merge must equal single-pass build"

    def test_roundtrip(self, rng):
        h = HyperLogLog.zero(HLLParams(p=10)).add_batch(np.arange(100))
        assert sketch_from_bytes(h.to_bytes()) == h


class TestCMS:
    def test_point_query_bounds(self, rng):
        p = CMSParams(eps=0.001, delta=0.01)
        # zipf-ish stream with known exact counts
        keys = rng.zipf(1.3, size=200_000).astype(np.int64) % 10_000
        c = CountMinSketch.zero(p).add_batch(keys)
        uniq, exact = np.unique(keys, return_counts=True)
        est = c.query_batch(uniq)
        assert (est >= exact).all(), "CMS never undercounts"
        over = est - exact
        n = keys.size
        frac_bad = (over > p.eps * n).mean()
        assert frac_bad <= p.delta, f"{frac_bad} of keys exceed eps*N overcount"

    def test_weighted(self):
        p = CMSParams(eps=0.01, delta=0.01)
        c = CountMinSketch.zero(p).add_batch(np.array([5, 7]), weights=np.array([10, 3]))
        est = c.query_batch(np.array([5, 7]))
        assert est[0] >= 10 and est[1] >= 3

    def test_merge_add(self, rng):
        p = CMSParams(eps=0.01, delta=0.05)
        keys = rng.integers(0, 1000, 10_000).astype(np.int64)
        whole = CountMinSketch.zero(p).add_batch(keys)
        a = CountMinSketch.zero(p).add_batch(keys[:5000])
        b = CountMinSketch.zero(p).add_batch(keys[5000:])
        assert a.merge(b).to_bytes() == whole.to_bytes()

    def test_roundtrip(self, rng):
        c = CountMinSketch.zero(CMSParams(eps=0.01)).add_batch(np.arange(50))
        assert sketch_from_bytes(c.to_bytes()) == c


class TestTDigest:
    def test_quantiles_lognormal(self, rng):
        vals = rng.lognormal(3.0, 1.0, 100_000)
        t = TDigest.from_values(TDigestParams(compression=200), vals)
        qs = np.array([0.01, 0.25, 0.5, 0.75, 0.99])
        est = t.quantiles(qs)
        for q, e in zip(qs, est):
            true_rank = (vals <= e).mean()
            assert abs(true_rank - q) < 0.01, f"q={q}: rank err {abs(true_rank - q)}"

    def test_merged_partials_accuracy(self, rng):
        vals = rng.normal(0, 1, 80_000)
        parts = [TDigest.from_values(TDigestParams(), vals[i::8]) for i in range(8)]
        t = parts[0]
        for p in parts[1:]:
            t = t.merge(p)
        for q in (0.1, 0.5, 0.9):
            true_rank = (vals <= t.quantile(q)).mean()
            assert abs(true_rank - q) < 0.01

    def test_compressed_bounds_state(self, rng):
        vals = rng.normal(0, 1, 50_000)
        parts = [TDigest.from_values(TDigestParams(compression=100), vals[i::16]) for i in range(16)]
        t = parts[0]
        for p in parts[1:]:
            t = t.merge(p)
        c = t.compressed()
        assert c.means.size <= 2 * 100 + 16
        assert abs((vals <= c.quantile(0.5)).mean() - 0.5) < 0.015
        assert c.n_items == t.n_items == vals.size

    def test_roundtrip(self, rng):
        t = TDigest.from_values(TDigestParams(), rng.normal(0, 1, 1000))
        assert sketch_from_bytes(t.to_bytes()) == t


class TestKLL:
    def test_rank_error(self, rng):
        vals = rng.lognormal(2.0, 1.5, 100_000)
        k = KLL.from_values(KLLParams(k=200), vals)
        for q in (0.05, 0.25, 0.5, 0.75, 0.95):
            true_rank = (vals <= k.quantile(q)).mean()
            assert abs(true_rank - q) < 0.03, f"q={q}: rank err {abs(true_rank - q)}"

    def test_merged_partials(self, rng):
        vals = rng.normal(10, 3, 60_000)
        parts = [KLL.from_values(KLLParams(k=200), vals[i::6]) for i in range(6)]
        k = parts[0]
        for p in parts[1:]:
            k = k.merge(p)
        for q in (0.1, 0.5, 0.9):
            assert abs((vals <= k.quantile(q)).mean() - q) < 0.03

    def test_compressed(self, rng):
        vals = rng.normal(0, 1, 50_000)
        parts = [KLL.from_values(KLLParams(k=200), vals[i::8]) for i in range(8)]
        k = parts[0]
        for p in parts[1:]:
            k = p.merge(k)
        c = k.compressed()
        assert c.values.size < k.values.size
        assert c.n_items == vals.size
        assert abs((vals <= c.quantile(0.5)).mean() - 0.5) < 0.04

    def test_total_weight_preserved(self, rng):
        vals = rng.normal(0, 1, 12_345)
        k = KLL.from_values(KLLParams(k=100), vals)
        assert int(k.weights.sum()) == 12_345, "compaction must preserve total mass"
        assert int(k.compressed().weights.sum()) == 12_345

    def test_roundtrip(self, rng):
        k = KLL.from_values(KLLParams(), rng.normal(0, 1, 5000))
        assert sketch_from_bytes(k.to_bytes()) == k
