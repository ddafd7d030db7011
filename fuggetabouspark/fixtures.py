"""Deterministic synthetic corpus in the exact input_hint shape
(BASELINE.json:15): (doc_id:string, tokens:array<int32>, n_tok:int32,
source:string). Generation rules from FIXTURES.md §1.

Determinism contract: every row is a pure function of (seed, row
index) — row i draws from PCG64(seed + i) — so output is identical
regardless of process count or partitioning. That lets the same
corpus be produced locally (pandas) for unit tests and distributed
(mapInPandas over spark.range) for the bench without a byte of data
movement from the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
VOCAB = 50_021  # prime vocab size per FIXTURES.md
SOURCES = np.array(["web", "books", "code", "wiki", "forums"])
SOURCE_P = np.array([0.80, 0.08, 0.06, 0.04, 0.02])  # skewed: web is hot
SCALES = {"xs": 2_000, "s": 20_000, "m": 200_000, "l": 1_000_000, "xl": 4_000_000}


def rows_for_scale(scale: str | int) -> int:
    return SCALES[scale] if isinstance(scale, str) else int(scale)


def make_rows(start: int, stop: int, seed: int = SEED) -> pd.DataFrame:
    """Rows [start, stop) of the corpus — pure function of (seed, i)."""
    n = stop - start
    doc_ids = np.empty(n, dtype=object)
    tokens = np.empty(n, dtype=object)
    n_toks = np.empty(n, dtype=np.int32)
    sources = np.empty(n, dtype=object)
    for j, i in enumerate(range(start, stop)):
        rng = np.random.Generator(np.random.PCG64(seed + i))
        src = SOURCES[rng.choice(len(SOURCES), p=SOURCE_P)]
        n_tok = int(np.clip(np.round(rng.lognormal(np.log(128), 0.8)), 16, 2048))
        toks = np.minimum(rng.zipf(1.2, size=n_tok) - 1, VOCAB - 1).astype(np.int32)
        doc_ids[j] = f"{src}-{i:012d}"
        tokens[j] = toks
        n_toks[j] = n_tok
        sources[j] = src
    return pd.DataFrame(
        {"doc_id": doc_ids, "tokens": tokens, "n_tok": n_toks, "source": sources}
    )


def docs_per_tick(rows: int) -> int:
    """FIXTURES.md §2: tick(doc_id) = i // DOCS_PER_TICK, 1000 ticks."""
    return max(1, rows // 1000)


def local_corpus(scale: str | int = "xs", seed: int = SEED) -> pd.DataFrame:
    """In-process pandas corpus for unit tests."""
    return make_rows(0, rows_for_scale(scale), seed)


CORPUS_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def spark_corpus(spark, scale: str | int = "xs", seed: int = SEED, partitions: int = 32):
    """Distributed corpus DataFrame: spark.range → mapInPandas, each
    task generating its own row range (no driver-side data)."""
    rows = rows_for_scale(scale)

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            if idx.size:
                yield make_rows(int(idx.min()), int(idx.max()) + 1, seed)

    return (
        spark.range(0, rows, 1, partitions)
        .mapInPandas(gen, schema=CORPUS_DDL)
    )


def write_corpus(spark, path: str, scale: str | int, seed: int = SEED, partitions: int = 32) -> str:
    """Materialize the corpus as parquet in an Iceberg-shaped layout
    (partitioned by source, FIXTURES.md §1)."""
    df = spark_corpus(spark, scale, seed, partitions)
    df.write.mode("overwrite").partitionBy("source").parquet(path)
    return path
