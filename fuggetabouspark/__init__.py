"""fuggetabouspark — PySpark-native mergeable, time-decaying sketches.

A from-scratch reimplementation (not a port) of the query capabilities
of mynameisfiber/fuggetaboutit — CountingBloomFilter,
TimingBloomFilter, ScalingTimingBloomFilter — plus companion HLL,
count-min, t-digest and KLL sketches, as associative numpy
accumulators driven by vectorized pandas/Arrow UDFs and merged via
treeAggregate / groupBy().applyInPandas(). Blueprint: SURVEY.md.
"""

from .params import (
    BloomParams,
    CMSParams,
    HLLParams,
    KLLParams,
    ScalingParams,
    TDigestParams,
    TimingParams,
)
from .sketches import (
    KLL,
    CountingBloomFilter,
    CountMinSketch,
    HyperLogLog,
    ScalingTimingBloomFilter,
    Sketch,
    TDigest,
    TimingBloomFilter,
    sketch_from_bytes,
)

__version__ = "0.1.0"
