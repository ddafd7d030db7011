"""Golden serialized bytes for every sketch kind (round 3, VERDICT
r02 #8).

The canonical serialization IS the cross-partition contract: partials
built on different executors must merge byte-identically, and
checkpointed state written by one library version must load in the
next. These fixtures pin one sketch of each kind, built from a fixed
deterministic stream, byte for byte — so any drift (numpy upgrade
changing a kernel's result, a zlib build emitting different-but-valid
streams, an accidental format change) fails LOUDLY here instead of
silently corrupting resumed checkpoints.

Note base.py's zlib caveat: payloads are compressed with zlib level 1,
and zlib output bytes are only guaranteed stable for the same zlib
build. If this test ever fails with unchanged code, diff the
DECOMPRESSED state first (the roundtrip asserts below) to distinguish
a harmless zlib-build change (regenerate the fixtures) from a real
state change (a bug).

Regenerate after an INTENTIONAL format change:
    python tests/test_golden_bytes.py regen
"""

from __future__ import annotations

import os

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _stream():
    """Fixed deterministic input stream shared by all kinds."""
    from fuggetabouspark.hashing import splitmix64

    keys = splitmix64(np.arange(2000, dtype=np.uint64)).view(np.int64)
    ticks = (np.arange(2000, dtype=np.int64) % 100) + 1
    vals = (np.arange(2000, dtype=np.float64) * 0.37) % 251.0
    weights = (np.arange(2000, dtype=np.int64) % 7) + 1
    return keys, ticks, vals, weights


def build_all():
    """One sketch per kind at fixed params, fed the fixed stream."""
    from fuggetabouspark.params import (
        BloomParams,
        CMSParams,
        HLLParams,
        KLLParams,
        ScalingParams,
        TDigestParams,
        TimingParams,
    )
    from fuggetabouspark.sketches import REGISTRY, MGParams

    keys, ticks, vals, weights = _stream()
    out = {}
    cbf = REGISTRY["cbf"].zero(BloomParams(5000, 0.01))
    cbf.add_batch(keys, weights=weights)
    out["cbf"] = cbf
    tbf = REGISTRY["tbf"].zero(TimingParams(5000, 0.01, window_ticks=50))
    tbf.add_batch(keys, ticks)
    out["tbf"] = tbf
    stbf = REGISTRY["stbf"].zero(ScalingParams(1000, 0.01, window_ticks=50))
    stbf.add_batch(keys, ticks)
    out["stbf"] = stbf
    hll = REGISTRY["hll"].zero(HLLParams(p=12))
    hll.add_batch(keys)
    out["hll"] = hll
    cms = REGISTRY["cms"].zero(CMSParams(eps=1e-3, delta=1e-2))
    cms.add_batch(keys, weights=weights)
    out["cms"] = cms
    mg = REGISTRY["mg"].zero(MGParams(k=256))
    mg.add_batch(keys, weights=weights)
    out["mg"] = mg
    td = REGISTRY["tdigest"].zero(TDigestParams(100.0))
    td.add_batch(vals)
    out["tdigest"] = td
    kll = REGISTRY["kll"].zero(KLLParams(128))
    kll.add_batch(vals)
    out["kll"] = kll
    return out


def test_golden_bytes_stable():
    from fuggetabouspark.sketches import sketch_from_bytes

    built = build_all()
    assert len(built) == 8
    for kind, sk in built.items():
        path = os.path.join(GOLDEN_DIR, f"{kind}.bin")
        assert os.path.exists(path), (
            f"missing golden fixture {path} — run "
            "`python tests/test_golden_bytes.py regen` once and commit"
        )
        golden = open(path, "rb").read()
        now = sk.to_bytes()
        assert now == golden, (
            f"{kind}: serialized bytes drifted from the golden fixture "
            f"({len(now)} vs {len(golden)} bytes) — see module docstring "
            "before regenerating"
        )
        # load path: the golden bytes must deserialize to a sketch that
        # re-serializes identically (format is its own fixpoint)
        loaded = sketch_from_bytes(golden)
        assert loaded.to_bytes() == golden, f"{kind}: load/save not a fixpoint"
        assert loaded.n_items == sk.n_items


def test_corrupt_bytes_raise_value_error():
    """Corrupt/foreign bytes must fail with a clean ValueError, not a
    KeyError/struct.error leaking from header parsing (found driving
    the library surface in round 4: a clobbered magic previously
    surfaced as ``KeyError: 'e'``)."""
    import pytest

    from fuggetabouspark.sketches import sketch_from_bytes

    good = build_all()["hll"].to_bytes()
    with pytest.raises(ValueError, match="magic"):
        sketch_from_bytes(b"XXXX" + good[4:])
    # valid magic but unknown sketch name
    from fuggetabouspark.sketches.base import decompress_blob

    raw = bytearray(decompress_blob(good))
    raw[6 : 6 + 3] = b"zzz"
    with pytest.raises(ValueError, match="unknown sketch kind"):
        sketch_from_bytes(bytes(raw))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for kind, sk in build_all().items():
            path = os.path.join(GOLDEN_DIR, f"{kind}.bin")
            open(path, "wb").write(sk.to_bytes())
            print(f"wrote {path} ({os.path.getsize(path)} bytes)")
    else:
        print(__doc__)
