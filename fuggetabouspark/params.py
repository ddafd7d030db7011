"""Sketch parameter math: Bloom geometry and the scaling-filter tier ladder.

The geometry of every tier is a pure function of global config, which
is what makes distributed ScalingTimingBloomFilter partials mergeable
tier-by-tier (SURVEY.md §7.5): tier i always has capacity
``capacity * growth**i`` and error ``error * (1 - r) * r**i`` on every
executor, so elementwise max over same-tier arrays is well-defined.

Bloom math (standard, [P:Almeida et al. 2007] for the ladder):
    m = ceil(-n * ln(e) / ln(2)^2),  k = ceil((m / n) * ln(2))
"""

from __future__ import annotations

import json
import math
from dataclasses import asdict, dataclass


def bloom_geometry(capacity: int, error: float) -> tuple[int, int]:
    """(num_buckets m, num_hashes k) for target capacity and FPR."""
    if not (0.0 < error < 1.0):
        raise ValueError(f"error must be in (0,1), got {error}")
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    m = math.ceil(-capacity * math.log(error) / (math.log(2) ** 2))
    k = max(1, math.ceil((m / capacity) * math.log(2)))
    return m, k


@dataclass(frozen=True)
class BloomParams:
    """Geometry for CBF/TBF. Derived fields are deterministic."""

    capacity: int
    error: float = 0.005

    @property
    def m(self) -> int:
        return bloom_geometry(self.capacity, self.error)[0]

    @property
    def k(self) -> int:
        return bloom_geometry(self.capacity, self.error)[1]


@dataclass(frozen=True)
class TimingParams(BloomParams):
    """TBF adds an explicit decay window measured in ticks.

    Upstream fuggetaboutit quantizes wall-clock seconds into ring ticks
    of ``decay_time / num_tick_values`` and decays on a tornado IOLoop
    (SURVEY.md §2.2). We store absolute int64 event-time ticks and make
    ``now`` a query parameter: decay becomes the pure function
    ``ticks[ticks < now - window + 1] = 0`` — deterministic, associative
    under elementwise-max merge, and cluster-safe (SURVEY.md §7.6).
    """

    window_ticks: int = 1 << 30  # "decay_time" expressed in ticks
    # bucket width for the absolute tick stamps: 32-bit halves payload
    # and shuffle bytes; use 64 when tick numbers can exceed 2^31-1
    tick_bits: int = 32


@dataclass(frozen=True)
class ScalingParams:
    """Tier ladder for ScalingTimingBloomFilter.

    tier i: capacity * growth**i, error * (1-r) * r**i  (sum <= error)
    [P:Almeida et al., "Scalable Bloom Filters", IPL 2007]
    """

    capacity: int
    error: float = 0.005
    window_ticks: int = 1 << 30
    tick_bits: int = 32
    error_tightening_ratio: float = 0.5
    growth_factor: int = 2
    max_fill_factor: float = 0.8
    min_fill_factor: float = 0.2
    max_tiers: int = 32

    def tier(self, i: int) -> TimingParams:
        r = self.error_tightening_ratio
        return TimingParams(
            capacity=int(self.capacity * (self.growth_factor**i)),
            error=self.error * (1.0 - r) * (r**i),
            window_ticks=self.window_ticks,
            tick_bits=self.tick_bits,
        )

    def expected_error(self, live_tiers: int) -> float:
        """1 - prod(1 - e_i) over live tiers; always <= self.error."""
        p = 1.0
        for i in range(live_tiers):
            p *= 1.0 - self.tier(i).error
        return 1.0 - p


@dataclass(frozen=True)
class HLLParams:
    p: int = 14  # 2^p registers; rel std err ~ 1.04 / sqrt(2^p)

    @property
    def m(self) -> int:
        return 1 << self.p


@dataclass(frozen=True)
class CMSParams:
    """width w = ceil(e/eps), depth d = ceil(ln(1/delta)).

    Point-query overcount <= eps * N with prob >= 1 - delta
    [P:Cormode–Muthukrishnan 2005].
    """

    eps: float = 0.0005
    delta: float = 0.01

    @property
    def width(self) -> int:
        return math.ceil(math.e / self.eps)

    @property
    def depth(self) -> int:
        return max(1, math.ceil(math.log(1.0 / self.delta)))


@dataclass(frozen=True)
class TDigestParams:
    compression: float = 200.0  # delta; quantile err ~ q(1-q)/delta


@dataclass(frozen=True)
class KLLParams:
    k: int = 200  # top-level compactor capacity


_PARAM_TYPES = {
    "BloomParams": BloomParams,
    "TimingParams": TimingParams,
    "ScalingParams": ScalingParams,
    "HLLParams": HLLParams,
    "CMSParams": CMSParams,
    "TDigestParams": TDigestParams,
    "KLLParams": KLLParams,
}


def params_to_json(p) -> str:
    return json.dumps({"_type": type(p).__name__, **asdict(p)}, sort_keys=True)


def params_from_json(s: str):
    d = json.loads(s)
    cls = _PARAM_TYPES[d.pop("_type")]
    return cls(**d)
