"""Property-based invariants (hypothesis): hold for ARBITRARY inputs,
not just the fixture distributions.

- Bloom family: no false negatives, ever; merge == concatenated build
  (homomorphism) for the byte-invariant monoids.
- TBF: window answers consistent under decay (decay never creates
  false negatives for in-window keys).
- Quantile sketches: quantiles always inside [min, max]; total mass
  preserved by KLL compaction.
- MG: never overcounts, undercount <= N/(k+1).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from fuggetabouspark.params import BloomParams, KLLParams, TDigestParams, TimingParams
from fuggetabouspark.sketches import (
    KLL,
    CountingBloomFilter,
    MGParams,
    MisraGries,
    TDigest,
    TimingBloomFilter,
)

keys_arrays = st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=300).map(
    lambda xs: np.asarray(xs, dtype=np.int64)
)
float_arrays = st.lists(
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False), min_size=1, max_size=400
).map(lambda xs: np.asarray(xs, dtype=np.float64))


@settings(max_examples=50, deadline=None)
@given(keys_arrays, st.integers(1, 3))
def test_cbf_no_false_negatives_and_merge_homomorphism(keys, nsplit):
    p = BloomParams(1000, 0.01)
    whole = CountingBloomFilter.zero(p).add_batch(keys)
    assert whole.contains_batch(keys).all()
    chunks = np.array_split(keys, nsplit)
    acc = CountingBloomFilter.zero(p)
    for c in chunks:
        acc = acc.merge(CountingBloomFilter.zero(p).add_batch(c))
    assert acc.to_bytes() == whole.to_bytes()


@settings(max_examples=50, deadline=None)
@given(keys_arrays, st.integers(1, 100), st.integers(1, 100))
def test_tbf_window_consistency(keys, t1, window):
    p = TimingParams(1000, 0.01, window_ticks=window)
    f = TimingBloomFilter.zero(p).add_batch(keys, t1)
    # within window: zero false negatives
    assert f.contains_batch(keys, now=t1).all()
    assert f.contains_batch(keys, now=t1 + window - 1).all()
    # decay at a 'now' that keeps the keys in-window must not evict them
    f.decay(now=t1 + window - 1)
    assert f.contains_batch(keys, now=t1 + window - 1).all()
    # past the window the keys are gone (exactly, after decay)
    f.decay(now=t1 + window + 1)
    assert not f.contains_batch(keys, now=t1 + window + 1).any()


@settings(max_examples=40, deadline=None)
@given(float_arrays)
def test_tdigest_quantiles_bounded_and_mass(vals):
    t = TDigest.from_values(TDigestParams(100.0), vals)
    qs = t.quantiles(np.array([0.0, 0.25, 0.5, 0.75, 1.0]))
    assert (qs >= vals.min() - 1e-9).all() and (qs <= vals.max() + 1e-9).all()
    assert np.all(np.diff(qs) >= -1e-9), "quantiles must be monotone"
    assert abs(t.weights.sum() - vals.size) < 1e-9


@settings(max_examples=40, deadline=None)
@given(float_arrays, st.integers(2, 5))
def test_kll_mass_preserved_under_merge_and_compact(vals, nsplit):
    p = KLLParams(64)
    parts = [KLL.from_values(p, c) for c in np.array_split(vals, nsplit)]
    acc = parts[0]
    for x in parts[1:]:
        acc = acc.merge(x)
    assert int(acc.weights.sum()) == vals.size
    assert int(acc.compressed().weights.sum()) == vals.size
    q = acc.quantile(0.5)
    assert vals.min() - 1e-9 <= q <= vals.max() + 1e-9


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=1, max_size=500), st.integers(2, 16))
def test_mg_bounds(xs, k):
    keys = np.asarray(xs, dtype=np.int64)
    mg = MisraGries.zero(MGParams(k)).add_batch(keys)
    uniq, exact = np.unique(keys, return_counts=True)
    est = mg.estimate(uniq)
    assert (est <= exact).all()
    assert (exact - est <= keys.size / (k + 1)).all()


def test_hash64_strings_golden_and_arrow_paths():
    """Pin hash64_strings byte-for-byte: these hashes are baked into
    serialized doc-keyed sketch state, so ANY drift (numpy/pyarrow
    upgrade, kernel refactor) must fail loudly. Also pins that the
    Arrow fast path (values buffer + offsets, round 3) agrees exactly
    with the legacy sequence path, including slices, large_string,
    nulls ('None'), non-strings (str()), and unicode."""
    import pyarrow as pa

    from fuggetabouspark.hashing import hash64_strings

    golden = {
        ("a",): [13906159068427031964],
        ("abc", "a", "", "abcdef"): [
            12578444927678923021, 13906159068427031964,
            14087677454934409008, 15161239791107448824,
        ],
        ("doc_000123", "doc_9"): [9857438130895252412, 3963678522459655622],
        ("日本語", "x" * 300): [16336644465870788801, 1913880023558855944],
    }
    for c, g in golden.items():
        assert hash64_strings(list(c)).tolist() == g
        assert hash64_strings(pa.array(list(c), pa.string())).tolist() == g
        assert hash64_strings(pa.array(list(c), pa.large_string())).tolist() == g
        assert hash64_strings(pa.chunked_array([pa.array(list(c))])).tolist() == g
    # seeded variant
    assert hash64_strings(["a"], seed=7).tolist() == [15405762436428462575]
    assert hash64_strings(pa.array(["a"]), seed=7).tolist() == [15405762436428462575]
    # nulls render like str(None); non-strings like str(x)
    assert hash64_strings([123, None, "None"]).tolist() == [
        9855492446265715041, 11214512052931077625, 11214512052931077625,
    ]
    assert hash64_strings(pa.array([123, None], pa.int64())).tolist() == [
        9855492446265715041, 11214512052931077625,
    ]
    # non-integer, non-string Arrow columns must hash like str(x), not
    # like Arrow's cast rendering (bool: 'True' vs 'true' — code-review
    # r03); the sequence and Arrow paths must agree for every type
    assert (
        hash64_strings(pa.array([True, False])).tolist()
        == hash64_strings([True, False]).tolist()
    )
    # sliced arrays re-anchor the shared offsets buffer
    arr = pa.array(["pad", "abc", "a", "", "abcdef"])
    assert hash64_strings(arr.slice(1)).tolist() == golden[("abc", "a", "", "abcdef")]
    assert hash64_strings([]).size == 0
    assert hash64_strings(pa.array([], pa.string())).size == 0


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.text(max_size=40), min_size=0, max_size=50),
    st.integers(0, 2**31 - 1),
)
def test_hash64_strings_arrow_equals_sequence_path(strings, seed):
    """The Arrow buffer kernel and the legacy sequence path must agree
    for ARBITRARY unicode strings (incl. empties, surrogide-free
    astral-plane chars, shared prefixes) at any seed — and slicing an
    Arrow array must not change any element's hash (offset
    re-anchoring)."""
    import pyarrow as pa

    from fuggetabouspark.hashing import hash64_strings

    seq = hash64_strings(strings, seed=seed)
    arr = pa.array(strings, pa.string())
    assert hash64_strings(arr, seed=seed).tolist() == seq.tolist()
    padded = pa.array(["_pad_"] + strings, pa.string())
    assert hash64_strings(padded.slice(1), seed=seed).tolist() == seq.tolist()


def test_hash64_strings_length_outlier_bounded():
    """Length-bucketed sweep (round 4, VERDICT r03 #7): one 100 KB
    outlier among 4096 short doc_ids must neither change any short
    string's hash (values are per-string, order-independent) nor force
    full-batch work per byte column. The timing bound is generous (the
    work is sum(lens), ~0.5 s measured vs multi-second full-batch
    sweeps before) — the hard assertions are the value ones."""
    import time

    import numpy as np

    from fuggetabouspark.hashing import hash64_strings

    ids = [f"doc_{i:07d}" for i in range(4096)]
    uniform = hash64_strings(np.array(ids, dtype=object))
    t0 = time.perf_counter()
    with_outlier = hash64_strings(np.array(ids[:-1] + ["x" * 100_000], dtype=object))
    elapsed = time.perf_counter() - t0
    assert (with_outlier[:-1] == uniform[:-1]).all()
    # the outlier itself must hash like any other string of its content
    assert with_outlier[-1] == hash64_strings(["x" * 100_000])[0]
    assert elapsed < 5.0, f"outlier batch took {elapsed:.1f}s — sweep not length-bucketed?"
