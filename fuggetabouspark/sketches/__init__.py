"""Sketch registry: every sketch is a commutative monoid with canonical
byte serialization (see base.py)."""

from .base import Sketch, pack, unpack
from .cbf import CountingBloomFilter
from .cms import CountMinSketch
from .hll import HyperLogLog
from .kll import KLL
from .mg import MGParams, MisraGries
from .stbf import ScalingTimingBloomFilter
from .tbf import TimingBloomFilter
from .tdigest import TDigest

REGISTRY = {
    cls.NAME: cls
    for cls in (
        CountingBloomFilter,
        TimingBloomFilter,
        ScalingTimingBloomFilter,
        HyperLogLog,
        CountMinSketch,
        TDigest,
        KLL,
        MisraGries,
    )
}


def sketch_from_bytes(buf: bytes) -> Sketch:
    """Dispatch on the serialized sketch name."""
    import struct

    from .base import decompress_blob

    from .base import MAGIC

    raw = decompress_blob(buf)
    if bytes(raw[:4]) != MAGIC:
        raise ValueError(f"bad sketch magic {bytes(raw[:4])!r}")
    nlen = struct.unpack_from("<B", raw, 5)[0]
    name = raw[6 : 6 + nlen].decode(errors="replace")
    if name not in REGISTRY:
        raise ValueError(f"unknown sketch kind {name!r}")
    return REGISTRY[name].from_bytes(raw)


__all__ = [
    "Sketch",
    "CountingBloomFilter",
    "TimingBloomFilter",
    "ScalingTimingBloomFilter",
    "HyperLogLog",
    "CountMinSketch",
    "TDigest",
    "KLL",
    "MisraGries",
    "MGParams",
    "REGISTRY",
    "sketch_from_bytes",
    "pack",
    "unpack",
]
