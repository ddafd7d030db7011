"""Reference-semantics tests for the three Bloom-family structures —
the behaviors pinned by upstream fuggetaboutit's own suite
(SURVEY.md §5.1): FPR bound, zero false negatives in-window, expiry
after decay, scaling growth, save/load round-trip.
"""

import numpy as np
import pytest

from fuggetabouspark.params import BloomParams, ScalingParams, TimingParams
from fuggetabouspark.sketches import (
    CountingBloomFilter,
    ScalingTimingBloomFilter,
    TimingBloomFilter,
    sketch_from_bytes,
)

CAP = 20_000
ERR = 0.005


def _present_absent(rng, n=CAP):
    present = rng.choice(10**8, size=n, replace=False).astype(np.int64)
    absent = (np.arange(50_000) + 10**9).astype(np.int64)  # disjoint by construction
    return present, absent


# ---------------- CountingBloomFilter ----------------


class TestCBF:
    def test_no_false_negatives_and_fpr(self, rng):
        present, absent = _present_absent(rng)
        f = CountingBloomFilter.zero(BloomParams(CAP, ERR)).add_batch(present)
        assert f.contains_batch(present).all(), "CBF must have zero false negatives"
        fpr = f.contains_batch(absent).mean()
        assert fpr <= ERR * 1.5, f"FPR {fpr} exceeds bound {ERR}"

    def test_remove(self, rng):
        present, _ = _present_absent(rng, n=1000)
        f = CountingBloomFilter.zero(BloomParams(CAP, ERR)).add_batch(present)
        f.remove_batch(present[:500])
        # removed keys drop out (up to FPR-level residue from other keys)
        assert f.contains_batch(present[:500]).mean() <= 0.05
        assert f.contains_batch(present[500:]).all(), "remove must not evict other keys"

    def test_estimate_size(self, rng):
        present, _ = _present_absent(rng)
        f = CountingBloomFilter.zero(BloomParams(CAP, ERR)).add_batch(present)
        assert len(f) == CAP
        assert abs(f.estimate_size() - CAP) / CAP < 0.05

    def test_roundtrip(self, rng):
        present, _ = _present_absent(rng, n=100)
        f = CountingBloomFilter.zero(BloomParams(CAP, ERR)).add_batch(present)
        g = sketch_from_bytes(f.to_bytes())
        assert g == f and g.to_bytes() == f.to_bytes()

    def test_merge_is_counter_add(self, rng):
        present, _ = _present_absent(rng, n=2000)
        p = BloomParams(CAP, ERR)
        whole = CountingBloomFilter.zero(p).add_batch(present)
        a = CountingBloomFilter.zero(p).add_batch(present[:1000])
        b = CountingBloomFilter.zero(p).add_batch(present[1000:])
        assert a.merge(b).to_bytes() == whole.to_bytes()

    def test_saturation_associative(self):
        p = BloomParams(100, 0.01)
        ones = np.zeros(3, dtype=np.int64) + 7
        parts = [
            CountingBloomFilter.zero(p).add_batch(np.repeat(ones, 30000))
            for _ in range(3)
        ]
        ab_c = parts[0].merge(parts[1]).merge(parts[2])
        a_bc = parts[0].merge(parts[1].merge(parts[2]))
        assert ab_c.to_bytes() == a_bc.to_bytes()
        assert int(ab_c.counts.max()) == 0xFFFF  # actually saturated


# ---------------- TimingBloomFilter ----------------


class TestTBF:
    def test_window_membership(self, rng):
        present, absent = _present_absent(rng)
        p = TimingParams(CAP, ERR, window_ticks=10)
        f = TimingBloomFilter.zero(p)
        f.add_batch(present[: CAP // 2], 4)   # old: outside [5..14] at now=14
        f.add_batch(present[CAP // 2 :], 14)  # recent
        now = 14
        seen = f.contains_batch(present, now)
        assert seen[CAP // 2 :].all(), "zero false negatives within window"
        assert seen[: CAP // 2].mean() <= ERR * 1.5, "tick-4 items expired at now=14 (window 10)"
        assert f.contains_batch(absent, now).mean() <= ERR * 1.5

    def test_expiry_after_decay(self, rng):
        present, _ = _present_absent(rng)
        p = TimingParams(CAP, ERR, window_ticks=10)
        f = TimingBloomFilter.zero(p).add_batch(present, 1)
        assert f.contains_batch(present, now=10).all()
        f.decay(now=100)
        assert f.ticks.sum() == 0, "decay past window must zero every bucket"
        assert not f.contains_batch(present, now=100).any()

    def test_latest_sighting_wins(self, rng):
        present, _ = _present_absent(rng, n=100)
        p = TimingParams(CAP, ERR, window_ticks=10)
        f = TimingBloomFilter.zero(p)
        f.add_batch(present, 1)
        f.add_batch(present, 50)  # re-sighted later
        assert f.contains_batch(present, now=55).all(), "re-sighting must refresh expiry"

    def test_historical_window_upper_bound(self, rng):
        """A key seen only AFTER the queried now must answer False for
        a window ending at that now (latest-sighting semantics)."""
        p = TimingParams(1000, 0.001, window_ticks=30)
        f = TimingBloomFilter.zero(p)
        k = rng.choice(10**7, 50, replace=False).astype(np.int64)
        f.add_batch(k, 100)
        assert not f.contains_batch(k, now=50).any(), "future sightings leak into past windows"
        assert f.contains_batch(k, now=100).all()

    def test_many_distinct_ticks_matches_maximum_at(self, rng):
        """The >64-distinct-ticks scatter path must equal np.maximum.at
        semantics exactly (guaranteed duplicate handling) — regression
        pin for the segment-reduce rewrite (ADVICE r01): a numpy
        upgrade changing fancy-assignment behavior must fail loudly."""
        from fuggetabouspark.hashing import hash_pair, indexes_from_pair

        p = TimingParams(5_000, 0.01, window_ticks=1 << 20)
        f = TimingBloomFilter.zero(p)
        keys = rng.integers(0, 10**4, 3000).astype(np.int64)  # heavy duplicates
        ticks = rng.integers(1, 500, 3000).astype(np.int64)   # >64 distinct
        assert np.unique(ticks).size > 64, "must exercise the argsort path"
        f.add_batch(keys, ticks)
        ref = TimingBloomFilter.zero(p)
        h1, h2 = hash_pair(keys)
        idx = indexes_from_pair(h1, h2, ref.k, ref.m)
        np.maximum.at(ref.ticks, idx.ravel(), np.repeat(ticks, ref.k).astype(ref.ticks.dtype))
        assert np.array_equal(f.ticks, ref.ticks)

    def test_giant_filter_index_distribution(self):
        """m >= 2^31 takes the exact-mod path: indexes must cover the
        whole bucket range, not wrap into [0, 2^32) (Lemire overflow)."""
        from fuggetabouspark.hashing import bloom_indexes

        m = (1 << 32) + 12345
        keys = np.arange(50_000, dtype=np.int64)
        idx = bloom_indexes(keys, 4, m)
        assert idx.min() >= 0 and idx.max() < m
        frac_high = (idx >= (1 << 32)) .mean()
        # ~12345/m of indexes belong above 2^32... too small to assert;
        # instead check the upper half of the range is actually used
        assert (idx >= m // 2).mean() > 0.45, "large-m indexes biased low"

    def test_merge_max_idempotent_commutative(self, rng):
        present, _ = _present_absent(rng, n=2000)
        p = TimingParams(CAP, ERR, window_ticks=100)
        a = TimingBloomFilter.zero(p).add_batch(present[:1000], 3)
        b = TimingBloomFilter.zero(p).add_batch(present[1000:], 7)
        assert a.merge(b).ticks.tobytes() == b.merge(a).ticks.tobytes()
        aa = a.merge(a)
        assert aa.ticks.tobytes() == a.ticks.tobytes(), "max-merge is idempotent on state"

    def test_roundtrip(self, rng):
        present, _ = _present_absent(rng, n=100)
        f = TimingBloomFilter.zero(TimingParams(CAP, ERR, window_ticks=9)).add_batch(present, 4)
        g = sketch_from_bytes(f.to_bytes())
        assert g == f


# ---------------- ScalingTimingBloomFilter ----------------


class TestSTBF:
    def test_growth_and_membership(self, rng):
        p = ScalingParams(capacity=1000, error=0.01, window_ticks=1 << 30)
        f = ScalingTimingBloomFilter.zero(p)
        present = rng.choice(10**8, size=10_000, replace=False).astype(np.int64)
        f.add_batch(present, 1)
        assert len(f.tiers) > 1, "inserting 10x capacity must grow tiers"
        assert f.contains_batch(present, now=1).all(), "zero false negatives across tiers"
        absent = (np.arange(50_000) + 10**9).astype(np.int64)
        fpr = f.contains_batch(absent, now=1).mean()
        assert fpr <= p.error * 1.5, f"scaled FPR {fpr} exceeds total budget {p.error}"
        assert f.expected_error() <= p.error

    def test_decay_and_tier_drop(self, rng):
        p = ScalingParams(capacity=1000, error=0.01, window_ticks=5)
        f = ScalingTimingBloomFilter.zero(p)
        old = rng.choice(10**7, size=3000, replace=False).astype(np.int64)
        new = (rng.choice(10**7, size=500, replace=False) + 2 * 10**7).astype(np.int64)
        f.add_batch(old, 1)
        f.add_batch(new, 20)
        f.decay(now=20)
        assert not f.contains_batch(old, now=20).any() or f.contains_batch(old, now=20).mean() <= p.error * 1.5
        assert f.contains_batch(new, now=20).all()

    def test_merge_tierwise(self, rng):
        p = ScalingParams(capacity=1000, error=0.01)
        xs = rng.choice(10**8, size=6000, replace=False).astype(np.int64)
        a = ScalingTimingBloomFilter.zero(p).add_batch(xs[:4000], 2)
        b = ScalingTimingBloomFilter.zero(p).add_batch(xs[4000:], 3)
        m = a.merge(b)
        assert m.contains_batch(xs, now=3).all()
        assert m.merge(m).tiers and a.merge(b).to_bytes() == b.merge(a).to_bytes()

    def test_effective_error_calibrates_measured_fpr(self, rng):
        """effective_error() must upper-bound the measured FPR across
        fill levels — it is the honest diagnostic for merged/overfilled
        sketches, so its calibration is itself a gate."""
        absent = (np.arange(100_000) + 10**9).astype(np.int64)
        for n_ins in (500, 2_000, 8_000, 30_000):
            p = ScalingParams(capacity=1000, error=0.01)
            f = ScalingTimingBloomFilter.zero(p)
            keys = rng.choice(10**8, size=n_ins, replace=False).astype(np.int64)
            f.add_batch(keys, 1)
            measured = f.contains_batch(absent, now=1).mean()
            bound = f.effective_error(now=1)
            assert measured <= bound * 1.3 + 1e-4, (
                f"n={n_ins}: measured FPR {measured} exceeds effective_error {bound}"
            )

    def test_roundtrip(self, rng):
        p = ScalingParams(capacity=500, error=0.01, window_ticks=7)
        xs = rng.choice(10**8, size=2000, replace=False).astype(np.int64)
        f = ScalingTimingBloomFilter.zero(p).add_batch(xs, 3)
        g = sketch_from_bytes(f.to_bytes())
        assert g == f
        assert len(g.tiers) == len(f.tiers)


class TestUpstreamParitySurface:
    """Drive the sketches exactly like an upstream fuggetaboutit user:
    scalar add/remove/contains with hashable (string) keys, `in`,
    `+` for merge — thin wrappers over the batch kernels."""

    def test_cbf_scalar_flow(self):
        from fuggetabouspark.params import BloomParams
        from fuggetabouspark.sketches import CountingBloomFilter

        f = CountingBloomFilter.zero(BloomParams(1000, 0.001))
        f.add("alice").add("bob").add("alice")
        assert "alice" in f and "bob" in f and "carol" not in f
        f.remove("alice")
        assert "alice" in f  # still one copy
        f.remove("alice")
        assert "alice" not in f and "bob" in f

    def test_merge_operator(self):
        from fuggetabouspark.params import BloomParams
        from fuggetabouspark.sketches import CountingBloomFilter

        a = CountingBloomFilter.zero(BloomParams(1000, 0.001)).add("x")
        b = CountingBloomFilter.zero(BloomParams(1000, 0.001)).add("y")
        m = a + b
        assert "x" in m and "y" in m
        assert "y" not in a, "+ must not mutate operands"
        assert m == a.merge(b), "byte-identical to merge()"

    def test_tbf_stbf_scalar_window(self):
        from fuggetabouspark.params import ScalingParams, TimingParams
        from fuggetabouspark.sketches import ScalingTimingBloomFilter, TimingBloomFilter

        for f in (
            TimingBloomFilter.zero(TimingParams(1000, 0.001, window_ticks=10)),
            ScalingTimingBloomFilter.zero(ScalingParams(1000, 0.001, window_ticks=10)),
        ):
            f.add("ev-1", tick=5)
            assert f.contains("ev-1", now=10)
            assert not f.contains("ev-1", now=50), "expired outside window"
            assert not f.contains("ev-2", now=10)

    def test_companion_scalars(self):
        from fuggetabouspark.params import CMSParams, HLLParams, KLLParams, TDigestParams
        from fuggetabouspark.sketches import KLL, CountMinSketch, HyperLogLog, TDigest

        h = HyperLogLog.zero(HLLParams(p=12))
        for i in range(200):
            h.add(f"key-{i}")
        assert abs(h.estimate() - 200) < 20
        c = CountMinSketch.zero(CMSParams(eps=1e-3, delta=1e-3))
        c.add("hot", weight=5).add("hot")
        assert c.query("hot") == 6 and c.query("cold") == 0
        t = TDigest.zero(TDigestParams(100.0))
        k = KLL.zero(KLLParams(200))
        for v in range(101):
            t.add(float(v))
            k.add(float(v))
        assert abs(t.compressed().quantile(0.5) - 50.0) < 2
        assert abs(k.quantile(0.5) - 50.0) < 2
