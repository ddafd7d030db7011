"""End-to-end training-data pipeline demo: how the fuggetabouspark
operators compose into the standard corpus-preparation flow.

    raw documents
      → quality filter   (Gopher-style integer rules)
      → PII redaction    (email/phone scrub)
      → exact dedup      (keep one per byte-identical group)
      → near-dup dedup   (MinHash-LSH → Jaccard verify → connected
                          components → keep cluster minimum)
      → passage removal  (repeated >=20-token spans dropped,
                          one occurrence kept corpus-wide)
      → incremental guard (checkpointed decaying membership state;
                          day-2 shards dedup against history without
                          re-joining it)
      → tokenize         (JVM-side word hashing)
      → pack sequences   (fixed-length training sequences)
      → sketch build     (per-source membership/frequency state +
                          lineage accounting of what survived)

Run:  python examples/training_data_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001; finishes in ~1 min on local[8])

Every stage is a DataFrame→DataFrame function, so the same script is a
spark-submit job on a real cluster — the stages shuffle on document
keys only (the quality/PII/tokenize stages are pure projections).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main(sf_dir: str) -> None:
    from fuggetabouspark.dataops import (
        connected_components,
        minhash_lsh_candidates,
        minhash_signatures,
        ngram_jaccard_pairs,
        pack_sequences,
        packing_accounting,
        quality_filter,
        redact_pii,
    )
    from fuggetabouspark.dataops.textstats import tokens_from_text
    from fuggetabouspark.params import BloomParams, HLLParams
    from fuggetabouspark.pipeline import (
        SketchSpec,
        build_sketches,
        lineage_from_rows,
        merge_rows_to_sketches,
    )
    from fuggetabouspark.session import get_spark

    spark = get_spark("training-data-pipeline", cpus=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    n0 = docs.count()

    # 1. quality filter: integer keep/drop rules. Each surviving-docs
    # stage is localCheckpoint()ed so the later count()/collect()
    # actions don't recompute the whole upstream chain.
    kept_ids = quality_filter(docs).where("keep").select("doc_id")
    docs = docs.join(kept_ids, "doc_id").localCheckpoint()
    n1 = docs.count()

    # 2. PII scrub: redacted text replaces raw text downstream
    docs = redact_pii(docs).select(
        "doc_id", "source", F.col("text_redacted").alias("text")
    )

    # 3. exact dedup: keep the smallest doc_id per byte-identical text.
    # At scale this is one min-aggregation + semi-join (bounded state
    # for ANY group size — never materialize a duplicate group's id
    # list); exact_dedup() is the audit view of the same groups.
    winners = (
        docs.select(F.xxhash64("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs = docs.join(winners, "doc_id", "left_semi").localCheckpoint()
    n2 = docs.count()

    # 4. near-dup dedup: LSH candidates → exact Jaccard verify →
    #    transitive clustering → keep each cluster's minimum doc_id
    sig = minhash_signatures(docs, num_hashes=64)
    cand = minhash_lsh_candidates(sig, bands=16, rows_per_band=4)
    verified = ngram_jaccard_pairs(docs, threshold=0.8, candidates=cand)
    clusters = connected_components(verified.select("doc_a", "doc_b"))
    near_losers = clusters.where("node != comp").select(F.col("node").alias("doc_id"))
    docs = docs.join(near_losers, "doc_id", "left_anti").localCheckpoint()
    n3 = docs.count()

    # 4b. repeated-passage removal (substring level): whole-doc dedup
    # can't see a 20-token boilerplate block shared by otherwise-
    # distinct docs; drop every occurrence but one corpus-wide
    from fuggetabouspark.dataops import mask_repeated_passages

    cleaned = mask_repeated_passages(docs, window=20, min_docs=2).localCheckpoint()
    n_passage_tokens = cleaned.agg(F.sum("n_tokens_removed")).collect()[0][0] or 0
    docs = (
        docs.join(cleaned.select("doc_id", "text_clean"), "doc_id")
        .select("doc_id", "source", F.col("text_clean").alias("text"))
        .localCheckpoint()
    )

    # 4c. incremental ingest guard: checkpoint the surviving corpus's
    # membership state (decaying TBF + fp ledger), then dedup a
    # simulated day-2 re-crawl against it — the day-2 shard never
    # joins day-1 text, it probes the broadcast sketch and verifies
    # the (tiny) hit set against the 30-byte-per-doc ledger. This is
    # the stage that makes the pipeline INCREMENTAL at 100 TB: each
    # new crawl shard pays O(shard), not O(corpus).
    import shutil
    import tempfile

    from fuggetabouspark.dataops import incremental_dedup
    from fuggetabouspark.params import TimingParams

    ck = tempfile.mkdtemp(prefix="fgs_pipeline_dedup_")
    tp = TimingParams(capacity=200_000, error=0.001, window_ticks=2**31)
    incremental_dedup(spark, docs, ck, now=1, params=tp, partitions=8)
    day2 = docs.limit(50).select(
        (F.col("doc_id") + 10**9).alias("doc_id"), "source", "text"
    )
    ann = incremental_dedup(spark, day2, ck, now=2, params=tp, partitions=8)
    n_blocked = ann.where("is_dup_history").count()

    # ... and its NEAR-dup sibling: day-2 docs that are only ALMOST
    # re-crawls (trailing edit) still probe the checkpointed LSH band
    # state instead of re-joining day-1 text
    from fuggetabouspark.dataops import incremental_near_dup

    incremental_near_dup(spark, docs, ck, now=1, params=tp, partitions=8).unpersist()
    day2n = docs.limit(50).select(
        (F.col("doc_id") + 2 * 10**9).alias("doc_id"),
        F.concat_ws(" ", "text", F.lit("minor trailing edit")).alias("text"),
    )
    ann_n = incremental_near_dup(
        spark, day2n, ck, now=2, params=tp, partitions=8,
        threshold=0.7, update_state=False,
    )
    n_near_blocked = ann_n.where("is_near_dup_history").count()

    # day-N hygiene (round 5): compaction folds each half's per-shard
    # sketch rows into one shard=-1 row and expiry prunes decayed
    # ledger rows — the maintenance that keeps a month-long ingest's
    # state O(retained docs) instead of O(all shards ever). With this
    # demo's effectively-infinite window nothing decays yet; the calls
    # are safe and idempotent at any time.
    from fuggetabouspark.dataops import (
        compact_dedup_checkpoint,
        compact_near_checkpoint,
        expire_ledgers,
    )

    compact_dedup_checkpoint(spark, ck)
    compact_near_checkpoint(spark, ck)
    expire_ledgers(spark, ck, now=2)
    shutil.rmtree(ck, ignore_errors=True)

    # 5. tokenize (JVM-side) + 6. pack into 256-token sequences
    corpus = docs.select(
        "doc_id", "source", tokens_from_text().alias("tokens"),
        F.size(F.split("text", " ")).cast("int").alias("n_tok"),
    )
    packed = pack_sequences(
        corpus, seq_len=256, bucket_expr=F.pmod(F.xxhash64("doc_id"), F.lit(8))
    )
    acct = packing_accounting(packed, 256).collect()
    n_seqs = sum(r["n_seqs"] for r in acct)

    # 7. sketch state over the surviving corpus + lineage accounting
    rows = build_sketches(
        corpus,
        [
            SketchSpec("member", "cbf", BloomParams(50_000, 0.001), "tokens"),
            SketchSpec("vocab", "hll", HLLParams(p=14), "tokens"),
        ],
        group_cols=("source",),
        partitions=8,
    ).collect()
    sks = merge_rows_to_sketches(rows)
    lineage = lineage_from_rows(rows)
    n_tokens = sum(e["n_tokens"] for e in lineage)

    print(f"documents:        {n0}")
    print(f"after quality:    {n1}")
    print(f"after exact-dup:  {n2}")
    print(f"after near-dup:   {n3}")
    print(f"passage tokens:   {n_passage_tokens} removed (repeated >=20-token spans)")
    print(f"day-2 re-crawl:   {n_blocked}/50 blocked by the checkpointed state")
    print(f"day-2 near-crawl: {n_near_blocked}/50 edited re-crawls blocked (LSH state)")
    print(f"packed sequences: {n_seqs} x 256 tokens")
    print(f"tokens sketched:  {n_tokens} ({len(sks)} sketch states, "
          f"{len(lineage)} lineage rows)")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
