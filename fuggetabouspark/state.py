"""Checkpointed, resumable builds with per-shard lineage
(SURVEY.md §3.3; BASELINE.json:6 "per-partition lineage rows and
checkpointed sketch state for resumable runs").

Granularity: the input is split into ``n_shards`` deterministic shards
by ``pmod(xxhash64(doc_id), n_shards)``. Each shard is built and its
final per-shard sketch rows + lineage row are appended to the
checkpoint directory; a lineage row is only visible after its shard's
sketch rows were durably written (written in the same job, lineage
last). Resume lists completed shard ids from lineage and anti-joins
them away — a killed run re-does at most one shard. The final answer
merges every shard's sketch rows; correctness under retries holds
because shard partials are deduplicated by (spec, group, shard) before
the merge, so a half-written retry can never double-count.

At cluster scale, shards double as a unit of incremental ingest: a new
partition of an Iceberg table is just one more shard appended to the
same checkpoint.
"""

from __future__ import annotations

import json
import os

from .pipeline import LINEAGE_SPEC, SketchSpec, build_sketches, merge_rows_to_sketches

SHARD_DDL = "spec string, group string, payload binary, n_items long, shard int"


def _paths(checkpoint_dir: str) -> tuple[str, str]:
    return os.path.join(checkpoint_dir, "sketch_state"), os.path.join(checkpoint_dir, "lineage")


def completed_shards(spark, checkpoint_dir: str, expect_n_shards: int | None = None) -> set[int]:
    """Shard ids with durable lineage. When ``expect_n_shards`` is
    given, refuses to resume a checkpoint built with a different shard
    count — shard membership is pmod(hash, n_shards), so mixing counts
    would re-process documents already covered by completed shards and
    double-count every additive sketch."""
    _, lineage_path = _paths(checkpoint_dir)
    try:
        rows = spark.read.parquet(lineage_path).select("shard", "meta").collect()
    except Exception:
        return set()
    if expect_n_shards is not None and rows:
        recorded = json.loads(rows[0]["meta"]).get("n_shards")
        if recorded != expect_n_shards:
            raise ValueError(
                f"checkpoint was built with n_shards={recorded}; resuming with "
                f"n_shards={expect_n_shards} would double-count — use the original value"
            )
    return {r["shard"] for r in rows}


def build_resumable(
    spark,
    df,
    specs: list[SketchSpec],
    checkpoint_dir: str,
    n_shards: int = 8,
    group_cols: tuple[str, ...] = ("source",),
    tick_col=None,
    partitions: int | None = None,
    salt_mod: int = 16,
    stbf_fanin: int | None = None,
    fail_after_shard: int | None = None,
):
    """Build shard-by-shard with checkpointing; safe to re-invoke after
    a crash — completed shards are skipped via the lineage anti-join.

    ``fail_after_shard`` deliberately raises after N shards (test hook
    for the kill-and-resume gate in BASELINE.md).
    Returns the merged final sketch rows as a list of pyspark Rows.
    """
    from pyspark.sql import functions as F

    state_path, lineage_path = _paths(checkpoint_dir)
    done = completed_shards(spark, checkpoint_dir, expect_n_shards=n_shards)
    shard_col = F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int")

    built = 0
    for shard in range(n_shards):
        if shard in done:
            continue
        sub = df.where(shard_col == shard)
        final = build_sketches(
            sub, specs, group_cols=group_cols, tick_col=tick_col,
            partitions=partitions, salt_mod=salt_mod,
            # an STBF tier's union spans every shard's partials, so a
            # caller-requested split is multiplied by the shard count;
            # fanin<=1 means "no split" and must stay that way
            stbf_fanin=(stbf_fanin * n_shards) if stbf_fanin and stbf_fanin > 1 else None,
        ).withColumn("shard", F.lit(shard)).persist()
        try:
            # sketch rows first, lineage row last: a shard is only
            # "completed" once its state is durable
            sketch_rows = final.where(F.col("spec") != LINEAGE_SPEC)
            sketch_rows.write.mode("append").parquet(state_path)
            # shard-level audit lineage (SURVEY §3.3, round 3): exact
            # per-shard row/token totals + ingest digest from the cached
            # build's per-partition lineage rows (no recompute), plus
            # the file-level provenance of the scan. Hash shards read
            # every input file (membership is pmod(hash, n_shards)), so
            # input_files is the full file set per shard — plan
            # metadata, not an extra data pass; empty for
            # non-file-backed frames.
            from .pipeline import corpus_digest, lineage_from_rows

            lin_rows = final.where(F.col("spec") == LINEAGE_SPEC).collect()
        finally:
            final.unpersist()
        lin = lineage_from_rows(lin_rows)
        meta = {
            "shard": shard,
            "n_shards": n_shards,
            "specs": [s.name for s in specs],
            "n_rows": sum(e["n_rows"] for e in lin),
            "n_tokens": sum(e["n_tokens"] for e in lin),
            "token_digest": corpus_digest(lin_rows),
            "input_files": sorted(sub.inputFiles()),
        }
        spark.createDataFrame(
            [(shard, json.dumps(meta, sort_keys=True))], "shard int, meta string"
        ).write.mode("append").parquet(lineage_path)
        built += 1
        if fail_after_shard is not None and built >= fail_after_shard:
            raise RuntimeError(f"injected failure after shard {shard}")
    return load_state(spark, checkpoint_dir)


def compact_checkpoint(spark, checkpoint_dir: str, now: int, drop_groups_before: int | None = None):
    """Decay-aware checkpoint GC: fold all shard rows per (spec, group),
    apply decay(now) to every time-decaying sketch, drop expired HLL
    ring buckets (group suffix '\\x1f<bucket>' older than
    ``drop_groups_before``), and rewrite the state as one compacted
    shard (-1). Safe to run any time: merges are idempotent-per-partial
    and the rewrite replaces the directory atomically at the end.

    This is the batch analogue of upstream's periodic IOLoop decay —
    at 10^12 scale it also bounds checkpoint growth: state stays
    O(groups × m) forever instead of O(shards × groups × m).

    Crash-safety: the rewrite renames the old state aside before
    moving the new state in, and load_state falls back to the aside
    copy if a crash struck between the two renames. NOTE this uses
    driver-local filesystem renames — on an object store deployment
    replace with a manifest swap (Iceberg snapshot commit).
    """
    import shutil

    from .pipeline import GROUP_SEP

    state_path, lineage_path = _paths(checkpoint_dir)
    sketches = load_state(spark, checkpoint_dir)
    rows = []
    for (spec, group), sk in sorted(sketches.items()):
        if drop_groups_before is not None and GROUP_SEP in group:
            try:
                if int(group.rsplit(GROUP_SEP, 1)[1]) < drop_groups_before:
                    continue
            except ValueError:
                pass
        if hasattr(sk, "decay"):
            sk.decay(now)
        rows.append((spec, group, bytearray(sk.to_bytes()), sk.n_items, -1))
    tmp = state_path + "_compacting"
    old = state_path + "_old"
    spark.createDataFrame(rows, SHARD_DDL).coalesce(4).write.mode("overwrite").parquet(tmp)
    # re-entrant swap: only retire the _old fallback once a live
    # state_path exists. If a previous compaction crashed between the
    # two renames (state missing, _old = the only live copy — which
    # load_state above just read), we must NOT delete _old before the
    # new state is in place.
    if os.path.exists(state_path):
        shutil.rmtree(old, ignore_errors=True)
        shutil.move(state_path, old)  # crash here → load_state falls back to _old
    shutil.move(tmp, state_path)
    shutil.rmtree(old, ignore_errors=True)
    return load_state(spark, checkpoint_dir)


def load_state(spark, checkpoint_dir: str):
    """Read checkpointed shard rows, dedupe retries, return
    {(spec, group): merged sketch}."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    import os

    state_path, _ = _paths(checkpoint_dir)
    if not os.path.exists(state_path) and os.path.exists(state_path + "_old"):
        state_path = state_path + "_old"  # compaction crashed mid-swap
    df = spark.read.parquet(state_path)
    # dedupe half-written retries: keep one row per (spec, group, shard)
    w = Window.partitionBy("spec", "group", "shard").orderBy(F.col("n_items").desc())
    df = df.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")
    return merge_rows_to_sketches(df.collect())
