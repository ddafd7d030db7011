"""Misra–Gries heavy-hitters: MG error bound, mergeable-summaries
guarantee under random merge trees (value-level), byte-identity in the
no-truncation configuration, top-k answer correctness vs exact.
"""

import numpy as np
import pytest

from fuggetabouspark.sketches import MGParams, MisraGries, sketch_from_bytes


def _zipf_stream(rng, n=200_000, vocab=10_000):
    return (rng.zipf(1.3, size=n) % vocab).astype(np.int64)


class TestMG:
    def test_point_bounds(self, rng):
        keys = _zipf_stream(rng)
        k = 512
        mg = MisraGries.zero(MGParams(k)).add_batch(keys)
        uniq, exact = np.unique(keys, return_counts=True)
        est = mg.estimate(uniq)
        n = keys.size
        assert (est <= exact).all(), "MG never overcounts"
        assert (exact - est <= n / (k + 1)).all(), "undercount bounded by N/(k+1)"

    def test_guaranteed_heavy_hitters_present(self, rng):
        keys = _zipf_stream(rng)
        k = 256
        mg = MisraGries.zero(MGParams(k)).add_batch(keys)
        uniq, exact = np.unique(keys, return_counts=True)
        heavy = uniq[exact > keys.size / (k + 1)]
        tracked = set(mg.keys.tolist())
        assert all(int(h) in tracked for h in heavy)

    def test_merge_bounds_any_tree(self, rng):
        keys = _zipf_stream(rng, n=120_000)
        k = 256
        chunks = np.array_split(keys, 7)
        parts = [MisraGries.zero(MGParams(k)).add_batch(c) for c in chunks]
        tree_rng = np.random.default_rng(5)
        for _ in range(10):
            items = [parts[i] for i in tree_rng.permutation(len(parts))]
            while len(items) > 1:
                i = int(tree_rng.integers(0, len(items) - 1))
                a = items.pop(i)
                b = items.pop(i)
                items.insert(int(tree_rng.integers(0, len(items) + 1)), a.merge(b))
            merged = items[0]
            uniq, exact = np.unique(keys, return_counts=True)
            est = merged.estimate(uniq)
            assert (est <= exact).all()
            assert (exact - est <= keys.size / (k + 1)).all(), "merge tree broke the bound"

    def test_exact_and_byte_identical_when_k_large(self, rng):
        """k >= distinct ⇒ no truncation ⇒ exact counts and byte-equal
        merges (the oracle-gate configuration)."""
        keys = rng.integers(0, 500, 50_000).astype(np.int64)
        p = MGParams(4096)
        whole = MisraGries.zero(p).add_batch(keys)
        a = MisraGries.zero(p).add_batch(keys[:20_000])
        b = MisraGries.zero(p).add_batch(keys[20_000:])
        assert a.merge(b).to_bytes() == whole.to_bytes() == b.merge(a).to_bytes()
        uniq, exact = np.unique(keys, return_counts=True)
        assert np.array_equal(whole.estimate(uniq), exact)

    def test_weighted_and_topk(self):
        mg = MisraGries.zero(MGParams(8))
        mg.add_batch(np.array([1, 2, 3]), weights=np.array([100, 50, 7]))
        top = mg.top_k(2)
        assert top == [(1, 100), (2, 50)]

    def test_roundtrip(self, rng):
        mg = MisraGries.zero(MGParams(64)).add_batch(_zipf_stream(rng, 10_000))
        assert sketch_from_bytes(mg.to_bytes()) == mg
