"""Driver contract for the spark-graft builder (PySpark target).

queries() entries map 1:1 to implemented operators (SURVEY.md §2):
the sketch verbs flow through the real distributed pipeline
(build_sketches → merge → probe), the dataops entries through
fuggetabouspark.dataops, and the relational plumbing through plain
DataFrame ops. Every oracle is designed for EXACT cross-engine parity:
booleans/ints only (cents instead of float sums, 4×-scaled quantiles,
bool window membership), so value-hash comparison is meaningful.

Approximate estimators (HLL/t-digest/KLL estimates, LSH candidates)
are rows-only by design — their correctness is pinned against exact
answers in tests/ with published error bounds instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# probe vocabulary for membership queries: present-ish common generator
# words + guaranteed-absent ones
PROBE_WORDS = sorted(
    [
        "the", "fast", "key", "order", "sort", "table", "scan", "merge",
        "part", "window", "small", "hash", "join", "spark", "group",
        "query", "row", "data", "slow", "filter", "customer", "line",
        "batch", "value",
    ]
    + [f"zzzq{i}" for i in range(8)]
)
WINDOW = 50   # ticks
NOW = 100     # tick of "now"; tick(doc) = doc_id % 100 + 1
STOPWORDS = ("the", "and", "of", "a", "to", "in")


def _ship(spark: SparkSession) -> None:
    from fuggetabouspark.session import ship_package

    ship_package(spark)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → input_hint-shaped corpus: tokens are 64-bit word
    hashes (collision-free key space so word-truth == token-truth),
    tick = doc_id % 100 + 1 (deterministic event time, FIXTURES.md §2)."""
    _ship(spark)
    docs = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(words, lambda w: F.xxhash64(w)).alias("tokens"),
        F.size(words).cast("int").alias("n_tok"),
        "source",
        (F.col("doc_id") % 100 + 1).cast("long").alias("tick"),
    )


def _probe_tokens(spark: SparkSession) -> dict[str, int]:
    rows = (
        spark.createDataFrame([(w,) for w in PROBE_WORDS], "word string")
        .select("word", F.xxhash64("word").alias("tok"))
        .collect()
    )
    return {r["word"]: r["tok"] for r in rows}


def _build(spark, sf_dir, specs, partitions=8, salt_mod=4):
    from fuggetabouspark.pipeline import build_sketches, merge_rows_to_sketches

    corpus = _corpus(spark, sf_dir)
    rows = build_sketches(
        corpus, specs, group_cols=("source",), tick_col=F.col("tick"),
        partitions=partitions, salt_mod=salt_mod,
    ).collect()
    return rows, merge_rows_to_sketches(rows)


# --------------------------------------------------------------------
# sketch-verb queries (through the full distributed pipeline)
# --------------------------------------------------------------------


def _membership_query(kind: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        import numpy as np

        from fuggetabouspark.params import ScalingParams, TimingParams
        from fuggetabouspark.pipeline import SketchSpec

        params = (
            TimingParams(capacity=20_000, error=1e-8, window_ticks=WINDOW)
            if kind == "tbf"
            else ScalingParams(capacity=20_000, error=1e-8, window_ticks=WINDOW)
        )
        _, sks = _build(spark, sf_dir, [SketchSpec("m", kind, params, "tokens")])
        tok = _probe_tokens(spark)
        probes = np.array([tok[w] for w in PROBE_WORDS], dtype=np.int64)
        out = []
        for (sname, group), sk in sorted(sks.items()):
            seen = sk.contains_batch(probes, NOW)
            out.extend((group, w, bool(s)) for w, s in zip(PROBE_WORDS, seen))
        return spark.createDataFrame(out, "source string, word string, seen boolean")

    return run


def _membership_oracle() -> str:
    vals = ", ".join(f"('{w}')" for w in PROBE_WORDS)
    return f"""
    WITH probes(word) AS (VALUES {vals}),
    d AS (SELECT source, doc_id, string_split(text, ' ') AS ws FROM documents)
    SELECT d.source AS source, p.word AS word,
           COALESCE(bool_or(list_contains(d.ws, p.word)
                    AND ((d.doc_id % 100) + 1 BETWEEN {NOW - WINDOW + 1} AND {NOW})), false) AS seen
    FROM d CROSS JOIN probes p
    GROUP BY d.source, p.word
    """


def q_tbf_last_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'WHEN was word X last seen, per source' from the TBF's
    max-stamped buckets (min over a key's k buckets; exact unless all
    k buckets were overwritten — error 1e-8 makes that effectively
    impossible here, so the exact SQL oracle applies)."""
    import numpy as np

    from fuggetabouspark import queries as Q
    from fuggetabouspark.params import TimingParams
    from fuggetabouspark.pipeline import SketchSpec

    params = TimingParams(capacity=20_000, error=1e-8, window_ticks=1 << 30)
    _, sks = _build(spark, sf_dir, [SketchSpec("ls", "tbf", params, "tokens")])
    tok = _probe_tokens(spark)
    probes = np.array([tok[w] for w in PROBE_WORDS], dtype=np.int64)
    est = Q.last_seen(sks, "ls", probes)
    out = []
    for group, ticks in est.items():
        out.extend((group, w, int(t)) for w, t in zip(PROBE_WORDS, ticks))
    return spark.createDataFrame(out, "source string, word string, last_tick long")


def q_cbf_token_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBF n_items per source == exact token count (pipeline gate)."""
    from fuggetabouspark.params import BloomParams
    from fuggetabouspark.pipeline import SketchSpec

    _, sks = _build(spark, sf_dir, [SketchSpec("c", "cbf", BloomParams(50_000, 0.001), "tokens")])
    rows = [(g, sk.n_items) for (_, g), sk in sorted(sks.items())]
    return spark.createDataFrame(rows, "source string, n_tokens long")


# effective tick window of the bucket ring at (NOW, WINDOW, bucket=10):
# windowed_merge keeps buckets lo..hi where lo = (NOW-WINDOW+1)//10 = 5,
# so the merged state covers ticks [50, NOW] (bucket-granularity slack of
# up to bucket_ticks-1 ticks below the exact window — documented in
# queries.windowed_merge). The exact oracle side uses the SAME bucket
# window so the verdict is a pure estimate-vs-exact check.
BUCKET_TICKS = 10
WIN_LO_TICK = ((NOW - WINDOW + 1) // BUCKET_TICKS) * BUCKET_TICKS  # = 50


def q_hll_decayed_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, tick-bucket) HLL ring, union of the window buckets
    → estimate, verdict-checked against the exact distributed distinct
    count (oracle-checkable: bool 'within 4σ of exact' + exact count;
    p=14 → rse = 1.04/√2^14 ≈ 0.81%, 4σ = 3.25%)."""
    from fuggetabouspark import queries as Q
    from fuggetabouspark.params import HLLParams
    from fuggetabouspark.pipeline import SketchSpec, build_sketches, merge_rows_to_sketches

    corpus = _corpus(spark, sf_dir).withColumn("bucket", (F.col("tick") / BUCKET_TICKS).cast("long"))
    rows = build_sketches(
        corpus,
        [SketchSpec("h", "hll", HLLParams(p=14), "tokens")],
        group_cols=("source", "bucket"),
        tick_col=F.col("tick"),
        partitions=8,
        salt_mod=2,
    ).collect()
    sks = merge_rows_to_sketches(rows)
    est = Q.decayed_cardinality(sks, "h", now=NOW, window=WINDOW, bucket_ticks=BUCKET_TICKS)
    # exact side, distributed (same bucket window as the ring merge)
    exact_rows = (
        _docs(spark, sf_dir)
        .where(((F.col("doc_id") % 100) + 1).between(WIN_LO_TICK, NOW))
        .select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source")
        .agg(F.countDistinct("word").alias("exact"))
        .collect()
    )
    exact = {r["source"]: r["exact"] for r in exact_rows}
    bound = 4 * 1.04 / (2**14) ** 0.5
    out = [
        (s, int(exact[s]), bool(abs(est[s] - exact[s]) <= bound * exact[s]))
        for s in sorted(exact)
    ]
    return spark.createDataFrame(out, "source string, exact_distinct long, within_4sigma boolean")


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 words per source: exact candidate set scored by the
    merged CMS. The CMS is wide enough that estimates are exact at this
    scale, making the entry oracle-checkable end to end."""
    import numpy as np

    from fuggetabouspark.params import CMSParams
    from fuggetabouspark.pipeline import SketchSpec

    _, sks = _build(spark, sf_dir, [SketchSpec("f", "cms", CMSParams(eps=1e-4, delta=1e-3), "tokens")])
    # candidate generation: distinct words per source (exact, distributed)
    cand = (
        _docs(spark, sf_dir)
        .select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source", "word")
        .count()
        .select("source", "word", F.xxhash64("word").alias("tok"))
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in cand:
        by_src.setdefault(r["source"], []).append((r["word"], r["tok"]))
    out = []
    for src, pairs in sorted(by_src.items()):
        words = [w for w, _ in pairs]
        toks = np.array([t for _, t in pairs], dtype=np.int64)
        est = sks[("f", src)].query_batch(toks)
        order = sorted(range(len(words)), key=lambda i: (-int(est[i]), words[i]))[:10]
        out.extend((src, words[i], int(est[i]), r + 1) for r, i in enumerate(order))
    return spark.createDataFrame(out, "source string, word string, cnt long, rnk long")


def _mg_top10_df(spark, sf_dir, sketches, tick_lo=None):
    """(source, word, cnt, rnk) top-10 per group from exact-regime MG
    summaries: tokens map back to words via the exact distinct
    candidate set (collision-free 64-bit hash space at this scale),
    optionally restricted to docs whose tick is in [tick_lo, NOW].
    Shared by the full and windowed MG entries so ranking/tie-break
    logic can't diverge."""
    docs = _docs(spark, sf_dir)
    if tick_lo is not None:
        docs = docs.where(((F.col("doc_id") % 100) + 1).between(tick_lo, NOW))
    cand = (
        docs.select("source", F.explode(F.split("text", " ")).alias("word"))
        .distinct()
        .select("source", "word", F.xxhash64("word").alias("tok"))
        .collect()
    )
    tok2word = {(r["source"], r["tok"]): r["word"] for r in cand}
    out = []
    for group, sk in sorted(sketches.items()):
        ranked = sorted(
            ((tok2word[(group, int(t))], int(c)) for t, c in zip(sk.keys, sk.counts)),
            key=lambda wc: (-wc[1], wc[0]),
        )[:10]
        out.extend((group, w, c, r + 1) for r, (w, c) in enumerate(ranked))
    return spark.createDataFrame(out, "source string, word string, cnt long, rnk long")


def q_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra–Gries top-10 words per source through the pipeline. k is
    sized above the distinct-word count, so counters are exact and the
    same SQL oracle as the CMS entry applies (tests pin the lossy
    regime's N/(k+1) bounds instead)."""
    from fuggetabouspark.sketches import MGParams
    from fuggetabouspark.pipeline import SketchSpec

    _, sks = _build(spark, sf_dir, [SketchSpec("g", "mg", MGParams(k=65536), "tokens")])
    return _mg_top10_df(spark, sf_dir, {g: sk for (_, g), sk in sks.items()})


def q_mg_windowed_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed (decayed) heavy hitters: Misra–Gries ring over
    (source, tick-bucket), queries.windowed_merge unions the window
    buckets [WIN_LO_TICK, NOW], top-10 per source. k above the distinct
    count keeps counters exact, so the SQL oracle recomputes the same
    windowed counts; the lossy regime's N/(k+1) bound is pinned in
    tests."""
    from fuggetabouspark import queries as Q
    from fuggetabouspark.sketches import MGParams
    from fuggetabouspark.pipeline import SketchSpec, build_sketches, merge_rows_to_sketches

    corpus = _corpus(spark, sf_dir).withColumn("bucket", (F.col("tick") / BUCKET_TICKS).cast("long"))
    rows = build_sketches(
        corpus,
        [SketchSpec("gw", "mg", MGParams(k=65536), "tokens")],
        group_cols=("source", "bucket"),
        tick_col=F.col("tick"),
        partitions=8,
        salt_mod=2,
    ).collect()
    merged = Q.windowed_merge(
        merge_rows_to_sketches(rows), "gw", now=NOW, window=WINDOW, bucket_ticks=BUCKET_TICKS
    )
    return _mg_top10_df(spark, sf_dir, merged, tick_lo=WIN_LO_TICK)


def q_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-vocabulary estimate between source pairs via HLL
    inclusion–exclusion (|A|+|B|−|A∪B|; union = register max, exact
    for HLL). Verdict-gated: the exact intersection is recomputed
    distributed AND by the oracle; the estimate must land within
    6σ·(|A|+|B|+|A∪B|) of it, the standard absolute-error model for
    I-E on sketches (σ = 1.04/√2^14 per estimate). First 5 sources
    (sorted) → 10 pairs."""
    from fuggetabouspark import queries as Q
    from fuggetabouspark.params import HLLParams
    from fuggetabouspark.pipeline import SketchSpec

    _, sks = _build(spark, sf_dir, [SketchSpec("hx", "hll", HLLParams(p=14), "tokens")])
    groups = sorted(g for (_, g) in sks)[:5]
    # exact per-pair intersection, distributed: distinct (source, word)
    # pairs self-joined on word
    words = (
        _docs(spark, sf_dir)
        .where(F.col("source").isin(groups))
        .select("source", F.explode(F.split("text", " ")).alias("word"))
        .distinct()
    )
    a = words.select(F.col("source").alias("src_a"), "word")
    b = words.select(F.col("source").alias("src_b"), "word")
    exact_rows = (
        a.join(b, "word")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("exact_shared"))
        .collect()
    )
    exact = {(r["src_a"], r["src_b"]): r["exact_shared"] for r in exact_rows}
    sigma = 1.04 / (2**14) ** 0.5
    out = []
    for i, ga in enumerate(groups):
        for gb in groups[i + 1 :]:
            sa, sb = sks[("hx", ga)], sks[("hx", gb)]
            if (ga, gb) not in exact:
                continue  # zero shared words: the SQL join emits no row
            est = Q.hll_intersection(sa, sb)
            na, nb, nu = sa.estimate(), sb.estimate(), sa.merge(sb).estimate()
            bound = 6 * sigma * (na + nb + nu)
            ex = exact[(ga, gb)]
            out.append((ga, gb, int(ex), bool(abs(est - ex) <= bound)))
    return spark.createDataFrame(
        out, "src_a string, src_b string, exact_shared long, within_bound boolean"
    )


def q_top_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL window-function plumbing: 3 longest docs per source."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        _docs(spark, sf_dir)
        .select("source", "doc_id", "n_chars", F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= 3)
        .select("source", "doc_id", F.col("n_chars").cast("long").alias("n_chars"), F.col("rnk").cast("long").alias("rnk"))
    )


def _quantile_verdicts(spark, sf_dir, qhat, eps, tick_lo=None):
    """Rank-error verdict for sketch quantile estimates q̂ at
    φ ∈ {.25,.5,.75}: q̂ passes iff its exact rank interval
    [count(<q̂), count(≤q̂)] intersects [(φ-ε)n, (φ+ε)n] — the standard
    KLL/t-digest guarantee form, tie-safe. Exact counts are computed
    distributed (broadcast the 20-source q̂ table, one agg pass);
    the DuckDB oracle recomputes n_docs and expects every verdict
    true, so an out-of-bound estimate breaks the value hash."""
    qdf = spark.createDataFrame(
        [(s, float(a), float(b), float(c)) for s, (a, b, c) in sorted(qhat.items())],
        "source string, q25 double, q50 double, q75 double",
    )
    corpus = _corpus(spark, sf_dir).select("source", "n_tok", "tick")
    if tick_lo is not None:
        corpus = corpus.where(F.col("tick").between(tick_lo, NOW))
    agg = (
        corpus.join(F.broadcast(qdf), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            *[
                expr
                for p in ("25", "50", "75")
                for expr in (
                    F.sum((F.col("n_tok") < F.col(f"q{p}")).cast("long")).alias(f"lo{p}"),
                    F.sum((F.col("n_tok") <= F.col(f"q{p}")).cast("long")).alias(f"hi{p}"),
                )
            ],
        )
        .collect()
    )
    out = []
    for r in sorted(agg, key=lambda r: r["source"]):
        n = r["n"]
        oks = [
            bool(r[f"lo{p}"] <= (phi + eps) * n and r[f"hi{p}"] >= (phi - eps) * n)
            for p, phi in (("25", 0.25), ("50", 0.5), ("75", 0.75))
        ]
        out.append((r["source"], int(n), *oks))
    return spark.createDataFrame(
        out, "source string, n_docs long, p25_ok boolean, p50_ok boolean, p75_ok boolean"
    )


def q_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest words-per-doc quartiles, verdict-checked against exact
    distributed ranks (ε = 0.02 rank error; tests pin < 0.01)."""
    from fuggetabouspark.params import TDigestParams
    from fuggetabouspark.pipeline import SketchSpec

    import numpy as np

    _, sks = _build(spark, sf_dir, [SketchSpec("t", "tdigest", TDigestParams(200.0), "n_tok")])
    qs = np.array([0.25, 0.5, 0.75])
    qhat = {g: sk.compressed().quantiles(qs) for (_, g), sk in sorted(sks.items())}
    return _quantile_verdicts(spark, sf_dir, qhat, eps=0.02)


def q_kll_windowed_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed quantiles from a per (source, tick-bucket) KLL ring
    (queries.windowed_merge) — words-per-doc quartiles over the
    bucket window [WIN_LO_TICK, NOW], verdict-checked against exact
    distributed ranks restricted to the same tick window (ε = 0.04)."""
    from fuggetabouspark import queries as Q
    from fuggetabouspark.params import KLLParams
    from fuggetabouspark.pipeline import SketchSpec, build_sketches, merge_rows_to_sketches

    corpus = _corpus(spark, sf_dir).withColumn("bucket", (F.col("tick") / BUCKET_TICKS).cast("long"))
    rows = build_sketches(
        corpus,
        [SketchSpec("kw", "kll", KLLParams(200), "n_tok")],
        group_cols=("source", "bucket"),
        tick_col=F.col("tick"),
        partitions=8,
        salt_mod=2,
    ).collect()
    sks = merge_rows_to_sketches(rows)
    merged = Q.windowed_merge(sks, "kw", now=NOW, window=WINDOW, bucket_ticks=BUCKET_TICKS)
    import numpy as np

    qs = np.array([0.25, 0.5, 0.75])
    qhat = {g: sk.quantiles(qs) for g, sk in merged.items()}
    return _quantile_verdicts(spark, sf_dir, qhat, eps=0.04, tick_lo=WIN_LO_TICK)


def q_kll_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL words-per-doc quartiles, verdict-checked against exact
    distributed ranks (ε = 0.04 rank error; k=200 tests pin < 0.03)."""
    from fuggetabouspark.params import KLLParams
    from fuggetabouspark.pipeline import SketchSpec

    _, sks = _build(spark, sf_dir, [SketchSpec("k", "kll", KLLParams(200), "n_tok")])
    qhat = {
        g: (sk.quantile(0.25), sk.quantile(0.5), sk.quantile(0.75))
        for (_, g), sk in sorted(sks.items())
    }
    return _quantile_verdicts(spark, sf_dir, qhat, eps=0.04)


def q_lineage_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent token-content digest from the lineage rows
    (ingest invariant, BASELINE.json:15). Rows-only: the digest has no
    SQL equivalent; the exact row/token totals from the same lineage
    rows are oracle-gated separately in lineage_totals."""
    from fuggetabouspark.params import HLLParams
    from fuggetabouspark.pipeline import SketchSpec, corpus_digest

    rows, _ = _build(spark, sf_dir, [SketchSpec("h", "hll", HLLParams(p=10), "tokens")])
    return spark.createDataFrame(
        [(int(corpus_digest(rows) % (1 << 63)),)], "digest long"
    )


def q_lineage_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-level lineage fidelity (round 3, SURVEY §3.3): a 4-shard
    resumable build must record, per shard, exact row/token totals and
    file-level provenance. The entry sums the per-shard meta totals
    (oracle recomputes them from documents) and checks every shard's
    recorded input_files equals the actual parquet file set of the
    source table (hash shards scan every file by construction)."""
    import json
    import shutil
    import tempfile

    from fuggetabouspark.params import HLLParams
    from fuggetabouspark.pipeline import SketchSpec
    from fuggetabouspark.state import build_resumable

    corpus = _corpus(spark, sf_dir)
    ck = tempfile.mkdtemp(prefix="fgs_lineage_files_")
    try:
        build_resumable(
            spark, corpus, [SketchSpec("h", "hll", HLLParams(p=10), "tokens")],
            ck, n_shards=4, tick_col=F.col("tick"), partitions=4,
        )
        metas = [
            json.loads(r["meta"])
            for r in spark.read.parquet(f"{ck}/lineage").collect()
        ]
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    expected = set(spark.read.parquet(f"{sf_dir}/documents.parquet").inputFiles())
    files_ok = bool(expected) and all(
        set(m["input_files"]) == expected for m in metas
    )
    return spark.createDataFrame(
        [(
            len(metas),
            int(sum(m["n_rows"] for m in metas)),
            int(sum(m["n_tokens"] for m in metas)),
            bool(files_ok),
        )],
        "n_shards_done long, n_rows_total long, n_tokens_total long, files_ok boolean",
    )


def q_lineage_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact row/token totals carried by the per-partition lineage rows
    of a pipeline build — oracle-checkable ingest accounting (the
    lineage invariant: nothing dropped, nothing double-counted)."""
    from fuggetabouspark.params import HLLParams
    from fuggetabouspark.pipeline import SketchSpec, lineage_from_rows

    rows, _ = _build(spark, sf_dir, [SketchSpec("h", "hll", HLLParams(p=10), "tokens")])
    lin = lineage_from_rows(rows)
    return spark.createDataFrame(
        [(sum(e["n_rows"] for e in lin), sum(e["n_tokens"] for e in lin))],
        "n_rows long, n_tokens long",
    )


# --------------------------------------------------------------------
# relational plumbing (scan/filter/agg/join — SURVEY.md §2.1)
# --------------------------------------------------------------------


def q_distinct_words_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source")
        .agg(F.countDistinct("word").alias("n_distinct"))
    )


def q_ntok_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles of words-per-doc, ×4 so every value
    is integral (cross-engine float-safe)."""
    return (
        _docs(spark, sf_dir)
        .select("source", F.size(F.split("text", " ")).alias("n_words"))
        .groupBy("source")
        .agg(
            F.round(F.expr("percentile(n_words, 0.25) * 4")).cast("long").alias("p25x4"),
            F.round(F.expr("percentile(n_words, 0.5) * 4")).cast("long").alias("p50x4"),
            F.round(F.expr("percentile(n_words, 0.75) * 4")).cast("long").alias("p75x4"),
        )
    )


def q_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )


def q_orders_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_cents"),
        )
    )


def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("count_order"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_cents"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_price_cents"),
        )
    )


# --------------------------------------------------------------------
# training-data ops (dedup / similarity / text analysis / multimodal)
# --------------------------------------------------------------------


def q_exact_dedup_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _docs(spark, sf_dir)
        .groupBy("text")
        .agg(F.count("*").alias("n_copies"))
        .groupBy("n_copies")
        .agg(F.count("*").alias("n_groups"))
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fuggetabouspark.dataops import token_counts

    _ship(spark)
    return token_counts(_docs(spark, sf_dir)).select(
        "doc_id", F.col("n_words").cast("long").alias("n_words")
    )


def q_regex_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex pre-tokenizer counts (round 3): the pattern is
    restricted to constructs with identical Java-regex/RE2 semantics,
    so DuckDB's regexp_extract_all recomputes the counts exactly."""
    from fuggetabouspark.dataops import regex_token_counts

    _ship(spark)
    return regex_token_counts(_docs(spark, sf_dir)).select("doc_id", "n_bpe_tokens")


def q_langid_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fuggetabouspark.dataops import language_id

    _ship(spark)
    return language_id(_docs(spark, sf_dir)).groupBy("lang_pred").agg(F.count("*").alias("n"))


def q_quality_ingredients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer ingredients of the quality score (float-free oracle)."""
    docs = _docs(spark, sf_dir)
    words = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    return docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_intersect(words, stop)).cast("long").alias("n_stop_distinct"),
        F.length("text").cast("long").alias("n_chars_obs"),
    )


PACK_SEQ_LEN = 256
PACK_BUCKETS = 8


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing accounting + PAYLOAD checksum (round 4 — was
    counts-only): pack word-LENGTH tokens (DuckDB can recompute those;
    xxhash64 tokens it cannot) into 256-token sequences in 8
    deterministic doc_id%8 buckets. Besides the round-3 count gates
    (n_seqs = floor(bucket tokens / 256), exact lengths), the entry
    now emits a positional checksum — sum of token × (1-based global
    stream position) over each bucket's kept prefix — so the oracle
    verifies the right tokens land in the right order, not just the
    right sequence count. Docs order by LONG doc_id inside a bucket,
    mirrored by the oracle's row_number ORDER BY doc_id."""
    from fuggetabouspark.dataops import pack_sequences, packing_accounting

    _ship(spark)
    words = F.split(F.col("text"), " ")
    src = _docs(spark, sf_dir).select(
        "doc_id",
        F.transform(words, lambda w: F.length(w).cast("long")).alias("tokens"),
    )
    packed = pack_sequences(
        src, PACK_SEQ_LEN,
        bucket_expr=F.col("doc_id").cast("long") % PACK_BUCKETS,
        n_buckets=PACK_BUCKETS,
    )
    return packing_accounting(packed, PACK_SEQ_LEN, checksum=True)


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style quality filter (round 3): per-doc repetition
    signals (exact word / distinct / max-frequency counts) plus the
    composite keep verdict — all integer rules, exactly reproducible
    in SQL."""
    from fuggetabouspark.dataops import quality_filter

    _ship(spark)
    return quality_filter(_docs(spark, sf_dir)).select(
        "doc_id", "n_words", "n_distinct", "max_word_freq", "keep"
    )


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub verdict (round 3): plant one email (every 10th doc)
    and one phone number (every 20th) deterministically, redact, and
    emit per-doc match counts plus a 'nothing left after redaction'
    boolean. The oracle recomputes the planted counts from doc_id
    arithmetic (the base corpus is verified PII-free) and expects
    clean = TRUE."""
    from fuggetabouspark.dataops import redact_pii
    from fuggetabouspark.dataops.textstats import PII_PATTERNS

    _ship(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 20 == 0, F.lit(" tel 555-123-4567")).otherwise(F.lit("")),
        ),
    )
    red = redact_pii(planted)
    leftovers = sum(
        F.size(F.regexp_extract_all("text_redacted", F.lit(p), F.lit(0)))
        for p in PII_PATTERNS.values()
    )
    return red.select(
        "doc_id", "n_email", "n_phone", (leftovers == 0).alias("clean")
    )


def q_stable_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling, verdict-gated: DuckDB can't compute
    Spark's xxhash64, so the entry emits properties the oracle CAN
    recompute — exact corpus size plus booleans for (a) sample size
    within 4σ binomial of rate·N, (b) byte-stability across partition
    counts (the operator's whole point: same sample on 8 or 1000
    executors), (c) subset monotonicity (rate=0.1 sample ⊆ rate=0.3),
    (d) independent-salt overlap within 4σ of rate²·N."""
    from fuggetabouspark.dataops import stable_sample

    docs = _docs(spark, sf_dir).select("doc_id")
    n_total = docs.count()
    rate = 0.2

    def ids(df):
        return {r["doc_id"] for r in df.collect()}

    s2 = ids(stable_sample(docs.repartition(2), rate))
    s8 = ids(stable_sample(docs.repartition(8), rate))
    small = ids(stable_sample(docs, rate / 2))  # always a sub-rate of `rate`
    other = ids(stable_sample(docs, rate, salt="b"))
    n = len(s2)
    sigma = (rate * (1 - rate) * n_total) ** 0.5
    size_ok = abs(n - rate * n_total) <= 4 * sigma
    stable_ok = s2 == s8
    subset_ok = small <= s2
    ov = len(s2 & other)
    ov_sigma = max((rate * rate * n_total) ** 0.5, 1.0)
    overlap_ok = abs(ov - rate * rate * n_total) <= 4 * ov_sigma
    return spark.createDataFrame(
        [(n_total, bool(size_ok), bool(stable_ok), bool(subset_ok), bool(overlap_ok))],
        "n_total long, size_ok boolean, stable_ok boolean, subset_ok boolean, overlap_ok boolean",
    )


def q_word_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard >= 0.2 within source, integer form
    (5*|∩| >= |∪|); the verification stage of near-dup dedup."""
    docs = _docs(spark, sf_dir)
    ws = F.array_distinct(F.split("text", " "))
    g = docs.select("doc_id", "source", ws.alias("ws"))
    a = g.select(F.col("doc_id").alias("doc_a"), "source", F.col("ws").alias("wa"))
    b = g.select(F.col("doc_id").alias("doc_b"), "source", F.col("ws").alias("wb"))
    inter = F.size(F.array_intersect("wa", "wb")).cast("long")
    uni = F.size(F.array_union("wa", "wb")).cast("long")
    return (
        a.join(b, "source")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", inter.alias("inter"), uni.alias("uni"))
        .where(F.col("inter") * 5 >= F.col("uni"))
    )


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: connected components over the exact
    word-Jaccard >= 0.2 pair graph (the same edges the
    word_jaccard_pairs entry gates), component = min doc_id. Exercises
    the iterative min-label-propagation join loop; DuckDB recomputes
    the transitive closure with a recursive CTE."""
    from fuggetabouspark.dataops import connected_components

    _ship(spark)
    edges = q_word_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(edges)
    return cc.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("comp").cast("long").alias("cluster"),
    )


# planted-clone parameters for the LSH/simhash verdict entries: every
# PLANT_MOD-th doc gets an exact text clone with doc_id + PLANT_OFFSET.
# Identical text ⇒ identical signature/simhash ⇒ the pair is found with
# CERTAINTY (every band bucket matches), so booleans are deterministic
# and the oracle recomputes the planted-pair count from the same
# doc_id arithmetic. The clones live in different partitions than the
# originals (union branches), so equality across the pair also pins
# batch/partition-independence of the hashing (the round-1 bug class).
PLANT_MOD = 5
PLANT_OFFSET = 1_000_000_000


def _planted_corpus(spark: SparkSession, sf_dir: str):
    """(corpus with clones, planted originals) for the LSH verdicts."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    planted = docs.where(F.col("doc_id") % PLANT_MOD == 0)
    clones = planted.select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "source", "text"
    )
    return docs.unionByName(clones), planted


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH planted-pair verdict (oracle-gated, round 3 — was
    rows-only: DuckDB can't recompute xxhash64 band buckets, but it CAN
    recompute the planted ground truth). Exact clones share all 64
    minhashes, so every planted (doc, doc+OFFSET) pair MUST appear in
    the candidate set — n_found == n_planted deterministically.
    not_all_pairs guards the opposite failure mode (a bucket-key bug
    degenerating into an all-pairs join): candidates must stay under
    5% of the full pair count (real value ≲ 0.1%)."""
    from fuggetabouspark.dataops import minhash_lsh_candidates, minhash_signatures

    _ship(spark)
    corpus, planted = _planted_corpus(spark, sf_dir)
    sig = minhash_signatures(corpus, num_hashes=64)
    cand = minhash_lsh_candidates(sig, bands=16, rows_per_band=4)
    pairs = planted.select(
        F.col("doc_id").alias("doc_a"),
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_b"),
    )
    # one job over the candidate set: count candidates and how many are
    # planted in the same aggregation (recomputing signatures per
    # action would double the entry's cost)
    marked = cand.join(
        F.broadcast(pairs.withColumn("_p", F.lit(1))), ["doc_a", "doc_b"], "left"
    )
    row = marked.agg(
        F.count("*").alias("n_cand"),
        F.coalesce(F.sum("_p"), F.lit(0)).alias("n_found"),
    ).collect()[0]
    n_found, n_cand = int(row["n_found"]), int(row["n_cand"])
    n_planted = pairs.count()
    n_docs = corpus.count()
    not_all_pairs = n_cand < 0.05 * (n_docs * (n_docs - 1) / 2)
    return spark.createDataFrame(
        [(int(n_planted), int(n_found), bool(n_found == n_planted), bool(not_all_pairs))],
        "n_planted long, n_found long, all_found boolean, not_all_pairs boolean",
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash planted-clone verdict (oracle-gated, round 3 — same
    pattern as minhash_lsh_pairs). A clone with byte-identical text
    must get a bit-identical 64-bit simhash even though it is hashed
    in a different partition with different batch-mates — equality
    across the planted pairs pins both the simhash math and its
    batch/partition independence. The oracle recomputes n_docs and the
    planted count from doc_id arithmetic and expects every clone equal."""
    from fuggetabouspark.dataops import simhash_buckets

    _ship(spark)
    corpus, _ = _planted_corpus(spark, sf_dir)
    sh = simhash_buckets(corpus)
    orig = sh.where(F.col("doc_id") < PLANT_OFFSET).select(
        F.col("doc_id").alias("o_id"), F.col("simhash").alias("o_sh")
    )
    clone = sh.where(F.col("doc_id") >= PLANT_OFFSET).select(
        (F.col("doc_id") - PLANT_OFFSET).alias("o_id"), F.col("simhash").alias("c_sh")
    )
    row = (
        orig.join(clone, "o_id")
        .agg(
            F.count("*").alias("n_planted"),
            F.sum((F.col("o_sh") == F.col("c_sh")).cast("long")).alias("n_equal"),
        )
        .collect()[0]
    )
    n_docs = _docs(spark, sf_dir).count()
    return spark.createDataFrame(
        [(int(n_docs), int(row["n_planted"]), int(row["n_equal"]),
          bool(row["n_planted"] == row["n_equal"]))],
        "n_docs long, n_planted long, n_equal long, all_equal boolean",
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-shard dedup verdict (round 4, VERDICT r03 #1):
    shard A (even doc_ids) is ingested into a fresh checkpoint, then
    shard B (odd doc_ids + planted clones of every PLANT_MOD-th A doc)
    is deduped against the checkpointed TBF membership state WITHOUT
    re-joining shard A. The emitted counts are text-EXACT — sketch hits
    are ledger-verified, sketch misses are zero-FN proof-of-new — so
    DuckDB recomputes every one of them from plain text equality:
    n_hist = B docs whose text appears in A (all planted clones by
    construction), n_intra = first-occurrence-wins within B, n_ledger =
    distinct texts across A∪B (one ledger row per first retained fp)."""
    import shutil
    import tempfile

    from fuggetabouspark.dataops import incremental_dedup, ledger_df
    from fuggetabouspark.params import TimingParams

    _ship(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    shard_a = docs.where(F.col("doc_id") % 2 == 0)
    clones = shard_a.where(F.col("doc_id") % PLANT_MOD == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "text"
    )
    shard_b = docs.where(F.col("doc_id") % 2 == 1).unionByName(clones)
    ck = tempfile.mkdtemp(prefix="fgs_incr_dedup_")
    # gate-sized sketch: the library default (capacity 2M) is a ~115 MB
    # tick array — right for a corpus, pure overhead for 500 docs
    p = TimingParams(capacity=50_000, error=0.001, window_ticks=2**31)
    try:
        a_ann = incremental_dedup(spark, shard_a, ck, now=1, params=p, partitions=8)
        b_ann = incremental_dedup(spark, shard_b, ck, now=2, params=p, partitions=8)
        row = b_ann.agg(
            F.count("*").alias("n_b"),
            F.sum(F.col("is_dup_history").cast("long")).alias("n_hist"),
            F.sum(F.col("is_dup_intra").cast("long")).alias("n_intra"),
        ).collect()[0]
        n_a = a_ann.count()
        n_ledger = ledger_df(spark, ck).count()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    n_b, n_hist, n_intra = int(row["n_b"]), int(row["n_hist"] or 0), int(row["n_intra"] or 0)
    return spark.createDataFrame(
        [(int(n_a), n_b, n_hist, n_intra, n_b - n_hist - n_intra, int(n_ledger))],
        "n_a long, n_b long, n_hist long, n_intra long, n_retained_b long, n_ledger long",
    )


def q_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-passage (substring-level) dedup verdict (round 4,
    VERDICT r03 #3). A fixed 60-word paragraph is appended to the 8
    docs with doc_id in {0,5,...,35}; with window=50 stride=1 exactly
    60-50+1 = 11 interior window fingerprints are shared by ALL 8
    planted docs (boundary-crossing windows differ per doc — their
    prefixes are each doc's own text). The entry counts fingerprint
    groups whose full doc set equals the planted set: any rolling-hash
    positioning bug, doc-boundary leak, or aggregation miscount breaks
    the 11. DuckDB recomputes the planted construction from doc_id
    arithmetic."""
    from fuggetabouspark.dataops import repeated_passages

    _ship(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    para = " ".join(f"rp{i}" for i in range(60))
    planted_cond = (F.col("doc_id") < 40) & (F.col("doc_id") % 5 == 0)
    corpus = docs.withColumn(
        "text",
        F.when(planted_cond, F.concat_ws(" ", F.col("text"), F.lit(para)))
         .otherwise(F.col("text")),
    )
    planted_ids = sorted(str(i) for i in range(0, 40, 5))
    rp = repeated_passages(corpus, window=50, stride=1, min_docs=2, max_ids=8)
    n_full = rp.where(
        (F.col("n_docs") == len(planted_ids))
        & (F.col("doc_ids") == F.array(*[F.lit(s) for s in planted_ids]))
    ).count()
    n_docs = docs.count()
    n_planted = docs.where(planted_cond).count()
    return spark.createDataFrame(
        [(int(n_docs), int(n_planted), int(n_full), bool(n_full == 11))],
        "n_docs long, n_planted long, n_shared_fps long, all_found boolean",
    )


def q_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup verdict (round 4). Deterministic claims
    only (code-review r04: "every planted clone flagged" is NOT certain
    when an original was intra-dropped through a non-transitive
    similarity CHAIN whose cluster keeper isn't >=threshold-close):
    - a clone whose original was RETAINED in shard A is flagged with
      certainty (identical signature => shared bands => estimate 1.0),
      so all_covered := every planted clone is flagged OR its original
      was not retained — always TRUE;
    - doc 0 is always retained (string-min of any intra cluster, no
      earlier history), so its clone's catch is individually certain
      (doc0_clone_caught) — the concrete positive-path pin.
    Only planted/arithmetic counts are emitted: the full flag set
    depends on hash-estimated Jaccard SQL cannot recompute."""
    import shutil
    import tempfile

    from fuggetabouspark.dataops import incremental_near_dup

    _ship(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    shard_a = docs.where(F.col("doc_id") % 2 == 0)
    clones = shard_a.where(F.col("doc_id") % PLANT_MOD == 0).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), "text"
    )
    shard_b = docs.where(F.col("doc_id") % 2 == 1).unionByName(clones)
    ck = tempfile.mkdtemp(prefix="fgs_incr_near_")
    # gate-sized band-key sketch (≈ docs × bands keys); the library
    # default capacity 2M is a 115 MB tick array — pure decode overhead
    # for a 500-doc gate (same sizing note as q_incremental_dedup)
    from fuggetabouspark.params import TimingParams

    p = TimingParams(capacity=50_000, error=0.001, window_ticks=2**31)
    try:
        ann_a = incremental_near_dup(spark, shard_a, ck, now=1, partitions=8, params=p)
        retained_a = {
            r["doc_id"]
            for r in ann_a.where(
                "not is_near_dup_history and not is_near_dup_intra"
            ).select("doc_id").collect()
        }
        ann_a.unpersist()
        ann_b = incremental_near_dup(spark, shard_b, ck, now=2, partitions=8, params=p)
        flagged = {
            r["doc_id"]
            for r in ann_b.where("is_near_dup_history").select("doc_id").collect()
        }
        n_b = ann_b.count()
        ann_b.unpersist()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    planted = {
        str(r["doc_id"])
        for r in shard_a.where(F.col("doc_id") % PLANT_MOD == 0)
        .select("doc_id").collect()
    }
    all_covered = all(
        (str(int(orig) + PLANT_OFFSET) in flagged) or (orig not in retained_a)
        for orig in planted
    )
    doc0_caught = str(PLANT_OFFSET) in flagged  # clone of doc 0
    return spark.createDataFrame(
        [(int(n_b), len(planted), bool(all_covered), bool(doc0_caught))],
        "n_b long, n_planted long, all_covered boolean, doc0_clone_caught boolean",
    )


def q_incremental_near_dup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup RECALL on PERTURBED clones (round 5,
    VERDICT r04 #8 — the 1.00-recall drive previously lived only in
    pytest). Construction: every even doc with doc_id % PLANT_MOD == 0
    and >= 30 words gets a clone with TWO unique junk words appended
    ("zqa<id> zqb<id>"), giving a worst-case 3-gram shingle Jaccard of
    s/(s+2) >= 0.93 on this corpus — far above the 0.7 query
    threshold, so a missed clone means a broken signature/LSH/verify
    path, not bad luck (P[miss] < 1e-9 per doc at J=0.93, 64 hashes,
    16x4 bands; seeds are fixed so the outcome is reproducible).

    Cross-engine pins: n_planted and min_jac_permille — BOTH engines
    independently build the 3-gram shingle sets of original vs clone
    and compute floor(1000*|∩|/|∪|), verifying the perturbation
    construction itself, not just doc counts. The two booleans are
    bound-verdict claims (oracle emits TRUE): recall_ok = every
    eligible clone (original retained in shard A) flagged as a history
    near-dup, some_eligible = the claim is not vacuous."""
    import shutil
    import tempfile

    from fuggetabouspark.dataops import incremental_near_dup
    from fuggetabouspark.params import TimingParams

    _ship(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    ws = F.split(F.col("text"), " ")
    planted_cond = (
        (F.col("doc_id") % 2 == 0)
        & (F.col("doc_id") % PLANT_MOD == 0)
        & (F.size(ws) >= 30)
    )
    junk = F.concat_ws(
        " ",
        F.col("text"),
        F.concat(F.lit("zqa"), F.col("doc_id").cast("string")),
        F.concat(F.lit("zqb"), F.col("doc_id").cast("string")),
    )
    shard_a = docs.where(F.col("doc_id") % 2 == 0)
    clones = docs.where(planted_cond).select(
        (F.col("doc_id") + PLANT_OFFSET).alias("doc_id"), junk.alias("text")
    )
    shard_b = docs.where(F.col("doc_id") % 2 == 1).unionByName(clones)

    # cross-engine construction pin: exact 3-gram shingle Jaccard of
    # each (original, perturbed clone) pair, worst case over the plant
    def shingles(words):
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(words) - 2),
                lambda i: F.concat_ws(
                    "\x1f",
                    F.element_at(words, i),
                    F.element_at(words, i + 1),
                    F.element_at(words, i + 2),
                ),
            )
        )

    pair_stats = (
        docs.where(planted_cond)
        .select(shingles(ws).alias("so"), shingles(F.split(junk, " ")).alias("sc"))
        .agg(
            F.count("*").alias("n_planted"),
            F.min(
                F.floor(
                    F.lit(1000)
                    * F.size(F.array_intersect("so", "sc"))
                    / F.size(F.array_union("so", "sc"))
                )
            ).cast("long").alias("min_jac_permille"),
        )
        .collect()[0]
    )

    ck = tempfile.mkdtemp(prefix="fgs_incr_recall_")
    p = TimingParams(capacity=50_000, error=0.001, window_ticks=2**31)
    try:
        ann_a = incremental_near_dup(
            spark, shard_a, ck, now=1, threshold=0.7, partitions=8, params=p
        )
        retained_a = {
            r["doc_id"]
            for r in ann_a.where(
                "not is_near_dup_history and not is_near_dup_intra"
            ).select("doc_id").collect()
        }
        ann_a.unpersist()
        ann_b = incremental_near_dup(
            spark, shard_b, ck, now=2, threshold=0.7, partitions=8, params=p
        )
        flagged = {
            r["doc_id"]
            for r in ann_b.where("is_near_dup_history").select("doc_id").collect()
        }
        ann_b.unpersist()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    planted = {
        str(r["doc_id"]) for r in docs.where(planted_cond).select("doc_id").collect()
    }
    eligible = [orig for orig in planted if orig in retained_a]
    recall_ok = all(
        str(int(orig) + PLANT_OFFSET) in flagged for orig in eligible
    )
    return spark.createDataFrame(
        [(
            int(pair_stats["n_planted"]),
            int(pair_stats["min_jac_permille"]),
            bool(eligible),
            bool(recall_ok),
        )],
        "n_planted long, min_jac_permille long, some_eligible boolean, recall_ok boolean",
    )


def q_incremental_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PASSAGE-level dedup verdict (round 5): a fixed
    60-word 'ip*' paragraph is appended to the 4 EVEN docs {0,10,20,30}
    (shard A, ingested into a fresh passage checkpoint) and to the 4
    ODD docs {5,15,25,35} (shard B, annotated against that history).
    Every shard-B window lying fully inside the paragraph (pos >= the
    doc's own word count; 60-50+1 = 11 per doc) MUST be flagged
    historical — fp identity + ledger verification + the sketch's
    zero in-window false negatives make that deterministic, so DuckDB
    recomputes 11 × 4 from construction arithmetic. The masking front
    end must then strip every ip-token from shard B (history keeps its
    copy): ip_left_b = 0. The ip-words are unique to the plant, so
    natural cross-shard repeats can't perturb either count."""
    import shutil
    import tempfile

    from fuggetabouspark.dataops import incremental_passages, mask_against_history
    from fuggetabouspark.params import TimingParams

    _ship(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    para = " ".join(f"ip{i}" for i in range(60))
    plant = lambda side: (F.col("doc_id") % 2 == side) & (
        F.col("doc_id") % PLANT_MOD == 0
    ) & (F.col("doc_id") < 40)
    with_para = lambda side: F.when(
        plant(side), F.concat_ws(" ", F.col("text"), F.lit(para))
    ).otherwise(F.col("text"))
    shard_a = docs.where(F.col("doc_id") % 2 == 0).select(
        "doc_id", with_para(0).alias("text")
    )
    shard_b = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", with_para(1).alias("text")
    )
    ck = tempfile.mkdtemp(prefix="fgs_incr_pass_")
    p = TimingParams(capacity=50_000, error=0.001, window_ticks=2**31)
    try:
        incremental_passages(
            spark, shard_a, ck, now=1, window=50, params=p, partitions=8
        ).unpersist()
        ann_b = incremental_passages(
            spark, shard_b, ck, now=2, window=50, params=p, partitions=8,
            update_state=False,
        )
        own_len = docs.where(F.col("doc_id") % 2 == 1).select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.size(F.split("text", " ")).alias("_own"),
        )
        para_windows = (
            ann_b.join(own_len, "doc_id")
            .select(
                F.size(
                    F.filter("hist_positions", lambda q: q >= F.col("_own"))
                ).alias("_npw")
            )
            .agg(F.sum("_npw").cast("long").alias("s"))
            .collect()[0]["s"]
        )
        n_b = ann_b.count()
        # reuse the annotation for masking — no second kernel+probe
        # pass (code-review r05 #5)
        clean_b = mask_against_history(spark, shard_b, window=50, ann=ann_b)
        ip_words = F.filter(
            F.split("text_clean", " "), lambda w: w.rlike("^ip[0-9]+$")
        )
        ip_left = clean_b.agg(
            F.sum(F.size(ip_words)).cast("long").alias("s")
        ).collect()[0]["s"]
        ann_b.unpersist()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    n_planted_b = docs.where(plant(1)).count()
    return spark.createDataFrame(
        [(int(n_b), int(n_planted_b), int(para_windows or 0), int(ip_left or 0))],
        "n_b long, n_planted_b long, n_para_hist_windows long, ip_left_b long",
    )


def q_incremental_emb_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EMBEDDING-level (semantic) dedup verdict (round 5):
    shard A = even vec_ids ingested into a fresh emb checkpoint (no
    intra dedup ⇒ ALL of A retained, deterministically), shard B = odd
    vec_ids + an EXACT vector clone of every PLANT_MOD-th even vec
    (vec_id + PLANT_OFFSET). An identical vector shares every
    hyperplane bucket key in every table, the sketch has zero
    in-window false negatives, and exact-cosine verification yields
    1.0 ≥ threshold — so every planted clone is flagged with
    CERTAINTY. DuckDB recomputes the counts from vec_id arithmetic and
    the cosine pin from list_cosine_similarity of the planted pairing
    (identical vectors ⇒ round(1000·cos) = 1000 each)."""
    import shutil
    import tempfile

    from fuggetabouspark.dataops import incremental_embedding_dedup
    from fuggetabouspark.params import TimingParams

    _ship(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    shard_a = emb.where(F.col("vec_id") % 2 == 0)
    planted = emb.where(
        (F.col("vec_id") % 2 == 0) & (F.col("vec_id") % PLANT_MOD == 0)
    )
    clones = planted.select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"), "embedding"
    )
    shard_b = emb.where(F.col("vec_id") % 2 == 1).unionByName(clones)
    ck = tempfile.mkdtemp(prefix="fgs_incr_emb_")
    p = TimingParams(capacity=50_000, error=0.001, window_ticks=2**31)
    try:
        incremental_embedding_dedup(
            spark, shard_a, ck, now=1, dim=dim, params=p, partitions=8
        ).unpersist()
        ann_b = incremental_embedding_dedup(
            spark, shard_b, ck, now=2, dim=dim, threshold=0.9, params=p,
            partitions=8, update_state=False,
        )
        stats = (
            ann_b.where(F.col("vec_id").cast("long") >= PLANT_OFFSET)
            .agg(
                F.sum(F.col("is_emb_dup_history").cast("long")).alias("nf"),
                F.sum(
                    F.when(
                        F.col("is_emb_dup_history"),
                        F.round(F.col("cosine") * 1000),
                    ).otherwise(F.lit(0)).cast("long")
                ).alias("cs"),
            )
            .collect()[0]
        )
        n_b = ann_b.count()
        ann_b.unpersist()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    n_planted = planted.count()
    return spark.createDataFrame(
        [(
            int(n_b),
            int(n_planted),
            int(stats["nf"] or 0),
            int(stats["cs"] or 0),
        )],
        "n_b long, n_planted long, n_planted_flagged long, cos_permille_sum long",
    )


def q_mask_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-REMOVAL verdict (round 4): same planted construction as
    repeated_passages (60-word 'rp*' paragraph appended to the 8 docs
    doc_id ∈ {0,5,...,35}), then mask_repeated_passages must leave the
    paragraph in EXACTLY ONE doc — the (min doc_id, min pos) keeper,
    doc 0 — and strip every rp-token from the other seven, leaving
    60 rp tokens corpus-wide. The rp-words are unique to the plant, so
    natural repeats in the base corpus can't perturb these counts;
    DuckDB recomputes them from the construction arithmetic."""
    from fuggetabouspark.dataops import mask_repeated_passages

    _ship(spark)
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    para = " ".join(f"rp{i}" for i in range(60))
    planted_cond = (F.col("doc_id") < 40) & (F.col("doc_id") % 5 == 0)
    corpus = docs.withColumn(
        "text",
        F.when(planted_cond, F.concat_ws(" ", F.col("text"), F.lit(para)))
         .otherwise(F.col("text")),
    )
    clean = mask_repeated_passages(corpus, window=50, stride=1, min_docs=2)
    rp_words = F.filter(
        F.split("text_clean", " "), lambda w: w.rlike("^rp[0-9]+$")
    )
    row = clean.agg(
        F.count("*").alias("n_docs"),
        F.sum((F.size(rp_words) > 0).cast("long")).alias("docs_with_rp"),
        F.sum(F.size(rp_words)).alias("rp_tokens"),
        F.sum(
            ((F.col("doc_id") == 0) & (F.size(rp_words) == 60)).cast("long")
        ).alias("keeper_intact"),
    ).collect()[0]
    return spark.createDataFrame(
        [(
            int(row["n_docs"]),
            int(row["docs_with_rp"] or 0),
            int(row["rp_tokens"] or 0),
            bool(row["keeper_intact"] == 1),
        )],
        "n_docs long, docs_with_rp long, rp_tokens long, keeper_intact boolean",
    )


def q_ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fuggetabouspark.dataops import brute_force_topk

    _ship(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    res = brute_force_topk(emb, qs, k=10)
    return res.select("query_id", "vec_id", F.col("rank").cast("long").alias("rnk"))


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat top-k at nprobe == n_lists (scores every list) —
    mathematically identical to brute force, so the exact cosine
    oracle applies; partial-probe recall is pinned in tests."""
    from fuggetabouspark.dataops import ivf_topk

    _ship(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    res = ivf_topk(emb, qs, dim=dim, k=10, n_lists=8, nprobe=8)
    return res.select("query_id", "vec_id", F.col("rank").cast("long").alias("rnk"))


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact verify path at this
    scale; the LSH-bucketed candidate path is pinned by a
    planted-duplicate unit test since this synthetic table's closest
    pair is cos≈0.51)."""
    from fuggetabouspark.dataops import embedding_near_dup

    _ship(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    return embedding_near_dup(emb, dim=dim, threshold=0.5, exact=True)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe hyperplane-LSH top-k at n_probes == 2^bits (probes
    every bucket) — provably identical to brute force, so the exact
    cosine oracle applies (same pattern as ann_ivf_topk at
    nprobe == n_lists); partial-probe recall (0.98 at 8/64 buckets on
    the clustered fixture) is pinned in tests/test_dataops.py."""
    from fuggetabouspark.dataops import lsh_bucket_topk

    _ship(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    res = lsh_bucket_topk(emb, qs, dim=dim, k=10, bits=4, n_probes=16)
    return res.select("query_id", "vec_id", F.col("rank").cast("long").alias("rnk"))


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-rank (round 3): the scan
    reads only 16-byte PQ codes (asymmetric-distance lookup tables),
    keeps a 64-vector shortlist per query, and re-ranks the shortlist
    with exact cosine. At shortlist=64 of 500 the exact top-10 fully
    survives the ADC cut on this table (measured, deterministic —
    seeded codebooks, hash-ordered training sample), so the exact
    cosine oracle applies; lossy-regime recall is pinned in tests."""
    from fuggetabouspark.dataops import pq_topk

    _ship(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    res = pq_topk(emb, qs, dim=dim, k=10, m=16, ksub=64, shortlist=64)
    return res.select("query_id", "vec_id", F.col("rank").cast("long").alias("rnk"))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode path (round 2; PNG added round 4): synthesized
    RIFF/PCM16 payloads AND real zlib-compressed PNGs are genuinely
    parsed on executors (pure stdlib/numpy codecs — the PNG path runs
    chunk walk, inflate, and scanline unfiltering) and features
    extracted per sampled frame. Rows-only: features are floats and
    SQL can't decode WAV/PNG; codec roundtrips and feature math are
    pinned in tests/test_dataops.py (TestMultimodal, TestPNGCodec)."""
    from fuggetabouspark.dataops.multimodal import decode_and_featurize, synthesize_media

    _ship(spark)
    wav = synthesize_media(spark, n=32, kind="wav")
    png = synthesize_media(spark, n=16, kind="png", seed=77)
    feats = decode_and_featurize(wav, frames_per_media=2, fake=False).unionByName(
        decode_and_featurize(png, frames_per_media=1, fake=False)
        .withColumn("frame_idx", F.col("frame_idx") + 1000)  # disjoint key space
    )
    return feats.select("media_id", "frame_idx")


# --------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: seen_within over sf0.001 through the full pipeline."""
    return _membership_query("tbf")(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tbf_seen_within": _membership_query("tbf"),
        "stbf_seen_within": _membership_query("stbf"),
        "cbf_token_totals": q_cbf_token_totals,
        "tbf_last_seen": q_tbf_last_seen,
        "hll_decayed_cardinality": q_hll_decayed_cardinality,
        "hll_intersection": q_hll_intersection,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "mg_heavy_hitters": q_mg_heavy_hitters,
        "mg_windowed_heavy_hitters": q_mg_windowed_heavy_hitters,
        "top_docs_per_source": q_top_docs_per_source,
        "tdigest_quantiles": q_tdigest_quantiles,
        "kll_quantiles": q_kll_quantiles,
        "kll_windowed_quantiles": q_kll_windowed_quantiles,
        "lineage_digest": q_lineage_digest,
        "lineage_totals": q_lineage_totals,
        "lineage_files": q_lineage_files,
        "distinct_words_per_source": q_distinct_words_per_source,
        "ntok_percentiles": q_ntok_percentiles,
        "events_by_type": q_events_by_type,
        "orders_customer_join": q_orders_customer_join,
        "lineitem_pricing": q_lineitem_pricing,
        "exact_dedup_histogram": q_exact_dedup_histogram,
        "token_counts": q_token_counts,
        "regex_token_counts": q_regex_token_counts,
        "langid_counts": q_langid_counts,
        "quality_ingredients": q_quality_ingredients,
        "stable_sample": q_stable_sample,
        "repetition_filter": q_repetition_filter,
        "pack_sequences": q_pack_sequences,
        "pii_redaction": q_pii_redaction,
        "word_jaccard_pairs": q_word_jaccard_pairs,
        "dup_clusters": q_dup_clusters,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash": q_simhash,
        "incremental_dedup": q_incremental_dedup,
        "incremental_near_dup": q_incremental_near_dup,
        "incremental_near_dup_recall": q_incremental_near_dup_recall,
        "incremental_passages": q_incremental_passages,
        "incremental_emb_dedup": q_incremental_emb_dedup,
        "repeated_passages": q_repeated_passages,
        "mask_passages": q_mask_passages,
        "ann_topk_cosine": q_ann_topk_cosine,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_pq_topk": q_ann_pq_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "multimodal_features": q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    langs = {
        "en": ["the", "and", "of"],
        "es": ["el", "la", "los"],
        "de": ["der", "die", "und"],
        "fr": ["le", "les", "des"],
        "zh": ["de", "shi", "bu"],
    }
    h = {
        l: f"len(list_intersect(string_split(text,' '), {ms}))" for l, ms in langs.items()
    }
    best = "greatest(" + ", ".join(f"h_{l}" for l in langs) + ")"
    lang_case = "CASE WHEN " + best + " <= 0 THEN 'und' " + " ".join(
        f"WHEN h_{l} = {best} THEN '{l}'" for l in langs
    ) + " END"
    stop_list = list(STOPWORDS)
    return {
        "tbf_seen_within": _membership_oracle(),
        "stbf_seen_within": _membership_oracle(),
        "cbf_token_totals": (
            "SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens "
            "FROM documents GROUP BY source"
        ),
        "tbf_last_seen": f"""
            WITH probes(word) AS (VALUES {', '.join(f"('{w}')" for w in PROBE_WORDS)}),
            d AS (SELECT source, doc_id, string_split(text, ' ') AS ws FROM documents)
            SELECT d.source AS source, p.word AS word,
                   COALESCE(MAX(CASE WHEN list_contains(d.ws, p.word)
                                     THEN (d.doc_id % 100) + 1 END), 0) AS last_tick
            FROM d CROSS JOIN probes p
            GROUP BY d.source, p.word
        """,
        "cms_heavy_hitters": """
            WITH w AS (SELECT source, unnest(string_split(text,' ')) AS word FROM documents),
            c AS (SELECT source, word, count(*) AS cnt FROM w GROUP BY source, word),
            r AS (SELECT source, word, cnt,
                         row_number() OVER (PARTITION BY source ORDER BY cnt DESC, word) AS rnk
                  FROM c)
            SELECT source, word, cnt, rnk FROM r WHERE rnk <= 10
        """,
        "mg_heavy_hitters": """
            WITH w AS (SELECT source, unnest(string_split(text,' ')) AS word FROM documents),
            c AS (SELECT source, word, count(*) AS cnt FROM w GROUP BY source, word),
            r AS (SELECT source, word, cnt,
                         row_number() OVER (PARTITION BY source ORDER BY cnt DESC, word) AS rnk
                  FROM c)
            SELECT source, word, cnt, rnk FROM r WHERE rnk <= 10
        """,
        "mg_windowed_heavy_hitters": f"""
            WITH w AS (SELECT source, unnest(string_split(text,' ')) AS word
                       FROM documents
                       WHERE (doc_id % 100) + 1 BETWEEN {WIN_LO_TICK} AND {NOW}),
            c AS (SELECT source, word, count(*) AS cnt FROM w GROUP BY source, word),
            r AS (SELECT source, word, cnt,
                         row_number() OVER (PARTITION BY source ORDER BY cnt DESC, word) AS rnk
                  FROM c)
            SELECT source, word, cnt, rnk FROM r WHERE rnk <= 10
        """,
        "top_docs_per_source": """
            SELECT source, doc_id, n_chars, rnk FROM (
                SELECT source, doc_id, n_chars,
                       row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rnk
                FROM documents) t
            WHERE rnk <= 3
        """,
        "distinct_words_per_source": """
            SELECT source, count(DISTINCT word) AS n_distinct
            FROM (SELECT source, unnest(string_split(text,' ')) AS word FROM documents) t
            GROUP BY source
        """,
        "hll_decayed_cardinality": f"""
            SELECT source, count(DISTINCT word) AS exact_distinct, TRUE AS within_4sigma
            FROM (SELECT source, unnest(string_split(text, ' ')) AS word,
                         (doc_id % 100) + 1 AS tick
                  FROM documents) t
            WHERE tick BETWEEN {WIN_LO_TICK} AND {NOW}
            GROUP BY source
        """,
        "hll_intersection": """
            WITH g AS (SELECT DISTINCT source FROM documents ORDER BY source LIMIT 5),
            w AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS word
                  FROM documents WHERE source IN (SELECT source FROM g))
            SELECT a.source AS src_a, b.source AS src_b,
                   count(*) AS exact_shared, TRUE AS within_bound
            FROM w a JOIN w b ON a.word = b.word AND a.source < b.source
            GROUP BY a.source, b.source
        """,
        "tdigest_quantiles": """
            SELECT source, count(*) AS n_docs,
                   TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
            FROM documents GROUP BY source
        """,
        "kll_quantiles": """
            SELECT source, count(*) AS n_docs,
                   TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
            FROM documents GROUP BY source
        """,
        "kll_windowed_quantiles": f"""
            SELECT source, count(*) AS n_docs,
                   TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
            FROM documents
            WHERE (doc_id % 100) + 1 BETWEEN {WIN_LO_TICK} AND {NOW}
            GROUP BY source
        """,
        "lineage_totals": (
            "SELECT count(*) AS n_rows, "
            "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens "
            "FROM documents"
        ),
        "lineage_files": (
            "SELECT CAST(4 AS BIGINT) AS n_shards_done, "
            "count(*) AS n_rows_total, "
            "CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens_total, "
            "TRUE AS files_ok FROM documents"
        ),
        "ntok_percentiles": """
            SELECT source,
                   CAST(round(quantile_cont(n_words, 0.25) * 4) AS BIGINT) AS p25x4,
                   CAST(round(quantile_cont(n_words, 0.5) * 4) AS BIGINT) AS p50x4,
                   CAST(round(quantile_cont(n_words, 0.75) * 4) AS BIGINT) AS p75x4
            FROM (SELECT source, len(string_split(text,' ')) AS n_words FROM documents) t
            GROUP BY source
        """,
        "events_by_type": """
            SELECT event_type, count(*) AS n,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM events GROUP BY event_type
        """,
        "orders_customer_join": """
            SELECT c_mktsegment, count(*) AS n_orders,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus, count(*) AS count_order,
                   CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
                   CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "exact_dedup_histogram": """
            SELECT n_copies, count(*) AS n_groups
            FROM (SELECT count(*) AS n_copies FROM documents GROUP BY text) t
            GROUP BY n_copies
        """,
        "token_counts": (
            "SELECT doc_id, len(string_split(text, ' ')) AS n_words FROM documents"
        ),
        "regex_token_counts": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens "
            "FROM documents"
        ),
        "langid_counts": (
            "WITH s AS (SELECT "
            + ", ".join(f"{expr} AS h_{l}" for l, expr in h.items())
            + f" FROM documents) SELECT {lang_case} AS lang_pred, count(*) AS n FROM s GROUP BY 1"
        ),
        "quality_ingredients": f"""
            SELECT doc_id,
                   len(string_split(text,' ')) AS n_words,
                   len(list_intersect(string_split(text,' '), {stop_list})) AS n_stop_distinct,
                   length(text) AS n_chars_obs
            FROM documents
        """,
        "stable_sample": (
            "SELECT count(*) AS n_total, TRUE AS size_ok, TRUE AS stable_ok, "
            "TRUE AS subset_ok, TRUE AS overlap_ok FROM documents"
        ),
        "repetition_filter": """
            WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
            c AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY 1, 2)
            SELECT doc_id,
                   CAST(SUM(cnt) AS BIGINT) AS n_words,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(MAX(cnt) AS BIGINT) AS max_word_freq,
                   (SUM(cnt) BETWEEN 10 AND 100000
                    AND MAX(cnt) * 10 <= SUM(cnt)
                    AND count(*) * 2 >= SUM(cnt)) AS keep
            FROM c GROUP BY doc_id
        """,
        "pack_sequences": f"""
            WITH t AS (
                SELECT doc_id % {PACK_BUCKETS} AS bucket, doc_id,
                       unnest(list_transform(string_split(text, ' '), w -> len(w))) AS tok,
                       unnest(range(1, len(string_split(text, ' ')) + 1)) AS wpos
                FROM documents),
            p AS (
                SELECT bucket, CAST(tok AS BIGINT) AS tok,
                       row_number() OVER (PARTITION BY bucket
                                          ORDER BY doc_id, wpos) AS pos,
                       count(*) OVER (PARTITION BY bucket) AS n
                FROM t)
            SELECT bucket,
                   CAST(MAX(n) // {PACK_SEQ_LEN} AS BIGINT) AS n_seqs,
                   CAST((MAX(n) // {PACK_SEQ_LEN}) * {PACK_SEQ_LEN} AS BIGINT) AS n_tokens_packed,
                   TRUE AS all_len_ok,
                   CAST(SUM(CASE WHEN pos <= (n // {PACK_SEQ_LEN}) * {PACK_SEQ_LEN}
                            THEN tok * pos ELSE 0 END) AS BIGINT) AS checksum
            FROM p GROUP BY bucket
            HAVING MAX(n) >= {PACK_SEQ_LEN}
        """,
        "pii_redaction": """
            SELECT doc_id,
                   CAST(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_email,
                   CAST(CASE WHEN doc_id % 20 = 0 THEN 1 ELSE 0 END AS BIGINT) AS n_phone,
                   TRUE AS clean
            FROM documents
        """,
        "word_jaccard_pairs": """
            WITH s AS (SELECT doc_id, source, list_distinct(string_split(text,' ')) AS ws
                       FROM documents)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.ws, b.ws)) AS inter,
                   len(list_distinct(list_concat(a.ws, b.ws))) AS uni
            FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
            WHERE len(list_intersect(a.ws, b.ws)) * 5 >= len(list_distinct(list_concat(a.ws, b.ws)))
        """,
        "dup_clusters": """
            WITH RECURSIVE pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                FROM (SELECT doc_id, source, list_distinct(string_split(text,' ')) AS ws
                      FROM documents) a
                JOIN (SELECT doc_id, source, list_distinct(string_split(text,' ')) AS ws
                      FROM documents) b
                  ON a.source = b.source AND a.doc_id < b.doc_id
                WHERE len(list_intersect(a.ws, b.ws)) * 5
                      >= len(list_distinct(list_concat(a.ws, b.ws)))
            ),
            e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                  UNION SELECT doc_b, doc_a FROM pairs),
            walk(n, m) AS (
                SELECT a, a FROM e
                UNION
                SELECT walk.n, e.b FROM walk JOIN e ON walk.m = e.a
            )
            SELECT n AS doc_id, MIN(m) AS cluster FROM walk GROUP BY n
        """,
        "minhash_lsh_pairs": f"""
            SELECT CAST(count(*) AS BIGINT) AS n_planted,
                   CAST(count(*) AS BIGINT) AS n_found,
                   TRUE AS all_found, TRUE AS not_all_pairs
            FROM documents WHERE doc_id % {PLANT_MOD} = 0
        """,
        "simhash": f"""
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN doc_id % {PLANT_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_planted,
                   CAST(SUM(CASE WHEN doc_id % {PLANT_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
                   TRUE AS all_equal
            FROM documents
        """,
        "repeated_passages": """
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN doc_id < 40 AND doc_id % 5 = 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_planted,
                   -- 60-token planted paragraph, window 50, stride 1:
                   -- 60 - 50 + 1 fully-interior shared windows
                   CAST(60 - 50 + 1 AS BIGINT) AS n_shared_fps,
                   TRUE AS all_found
            FROM documents
        """,
        "incremental_near_dup": f"""
            SELECT CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                        + SUM(CASE WHEN doc_id % 2 = 0 AND doc_id % {PLANT_MOD} = 0
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                   CAST(SUM(CASE WHEN doc_id % 2 = 0 AND doc_id % {PLANT_MOD} = 0
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_planted,
                   TRUE AS all_covered,
                   TRUE AS doc0_clone_caught
            FROM documents
        """,
        "incremental_near_dup_recall": f"""
            WITH p AS (
                SELECT doc_id,
                       string_split(text, ' ') AS wo,
                       string_split(
                           text || ' zqa' || CAST(doc_id AS VARCHAR)
                                || ' zqb' || CAST(doc_id AS VARCHAR), ' '
                       ) AS wc
                FROM documents
                WHERE doc_id % 2 = 0 AND doc_id % {PLANT_MOD} = 0
                  AND len(string_split(text, ' ')) >= 30
            ),
            sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           range(1, len(wo) - 1),
                           i -> wo[i] || chr(31) || wo[i+1] || chr(31) || wo[i+2]
                       )) AS so,
                       list_distinct(list_transform(
                           range(1, len(wc) - 1),
                           i -> wc[i] || chr(31) || wc[i+1] || chr(31) || wc[i+2]
                       )) AS sc
                FROM p
            )
            SELECT CAST(count(*) AS BIGINT) AS n_planted,
                   CAST(min(floor(
                       1000.0 * len(list_intersect(so, sc))
                       / len(list_distinct(list_concat(so, sc)))
                   )) AS BIGINT) AS min_jac_permille,
                   TRUE AS some_eligible,
                   TRUE AS recall_ok
            FROM sh
        """,
        "incremental_passages": f"""
            SELECT CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                   CAST(SUM(CASE WHEN doc_id % 2 = 1 AND doc_id % {PLANT_MOD} = 0
                            AND doc_id < 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_planted_b,
                   -- 60-token paragraph, window 50: 11 fully-interior
                   -- windows per planted shard-B doc, all historical
                   CAST((60 - 50 + 1) * SUM(CASE WHEN doc_id % 2 = 1
                            AND doc_id % {PLANT_MOD} = 0 AND doc_id < 40
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_para_hist_windows,
                   -- drop-all-on-the-new-side: history keeps the copy
                   CAST(0 AS BIGINT) AS ip_left_b
            FROM documents
        """,
        "incremental_emb_dedup": f"""
            WITH pl AS (
                SELECT vec_id, embedding FROM embeddings
                WHERE vec_id % 2 = 0 AND vec_id % {PLANT_MOD} = 0
            )
            SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id % 2 = 1)
                        + (SELECT count(*) FROM pl) AS BIGINT) AS n_b,
                   CAST((SELECT count(*) FROM pl) AS BIGINT) AS n_planted,
                   -- identical vector ⇒ identical buckets in every
                   -- table + zero-FN sketch + cosine 1.0: certain
                   CAST((SELECT count(*) FROM pl) AS BIGINT) AS n_planted_flagged,
                   CAST((SELECT SUM(ROUND(1000 * list_cosine_similarity(
                        embedding, embedding))) FROM pl) AS BIGINT)
                        AS cos_permille_sum
            FROM (SELECT 1)
        """,
        "mask_passages": """
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(1 AS BIGINT) AS docs_with_rp,
                   -- one 60-token keeper paragraph survives corpus-wide
                   CAST(60 AS BIGINT) AS rp_tokens,
                   TRUE AS keeper_intact
            FROM documents
        """,
        "incremental_dedup": f"""
            WITH a AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
            b AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
                UNION ALL
                SELECT doc_id + {PLANT_OFFSET}, text FROM documents
                WHERE doc_id % 2 = 0 AND doc_id % {PLANT_MOD} = 0
            ),
            flags AS (
                SELECT
                    (text IN (SELECT text FROM a)) AS hist,
                    -- mirror Spark's string-typed doc_id: first occurrence
                    -- is the LEXICOGRAPHIC min of CAST(doc_id AS VARCHAR)
                    (text NOT IN (SELECT text FROM a)
                     AND CAST(doc_id AS VARCHAR)
                         != MIN(CAST(doc_id AS VARCHAR)) OVER (PARTITION BY text)
                    ) AS intra
                FROM b
            )
            SELECT
                CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
                CAST(count(*) AS BIGINT) AS n_b,
                CAST(SUM(CASE WHEN hist THEN 1 ELSE 0 END) AS BIGINT) AS n_hist,
                CAST(SUM(CASE WHEN intra THEN 1 ELSE 0 END) AS BIGINT) AS n_intra,
                CAST(SUM(CASE WHEN hist OR intra THEN 0 ELSE 1 END) AS BIGINT) AS n_retained_b,
                CAST((SELECT count(DISTINCT text) FROM (SELECT text FROM a UNION ALL SELECT text FROM b)) AS BIGINT) AS n_ledger
            FROM flags
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
        """,
        "ann_ivf_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3)
            SELECT qid AS query_id, vec_id, rnk FROM (
                SELECT q.qid, e.vec_id,
                       row_number() OVER (PARTITION BY q.qid
                           ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id) AS rnk
                FROM embeddings e, q) t
            WHERE rnk <= 10
        """,
        "ann_lsh_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3)
            SELECT qid AS query_id, vec_id, rnk FROM (
                SELECT q.qid, e.vec_id,
                       row_number() OVER (PARTITION BY q.qid
                           ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id) AS rnk
                FROM embeddings e, q) t
            WHERE rnk <= 10
        """,
        "ann_pq_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3)
            SELECT qid AS query_id, vec_id, rnk FROM (
                SELECT q.qid, e.vec_id,
                       row_number() OVER (PARTITION BY q.qid
                           ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id) AS rnk
                FROM embeddings e, q) t
            WHERE rnk <= 10
        """,
        "ann_topk_cosine": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3)
            SELECT qid AS query_id, vec_id, rnk FROM (
                SELECT q.qid, e.vec_id,
                       row_number() OVER (PARTITION BY q.qid
                           ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id) AS rnk
                FROM embeddings e, q) t
            WHERE rnk <= 10
        """,
    }
