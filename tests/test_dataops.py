"""Training-data ops over the driver testdata (read-only sf0.001):
dedup family, similarity search, text analysis, multimodal plumbing —
with DuckDB as the exact oracle where SQL can express the answer.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from fuggetabouspark.dataops import (
    brute_force_topk,
    embedding_near_dup,
    exact_dedup,
    language_id,
    lsh_bucket_topk,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_score,
    simhash_buckets,
    token_counts,
)
from fuggetabouspark.dataops.multimodal import decode_and_featurize, synthesize_media

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


class TestTextStats:
    def test_token_counts_match_duckdb(self, docs):
        got = {r.doc_id: r.n_words for r in token_counts(docs).collect()}
        want = dict(
            duckdb.sql(
                f"select doc_id, len(string_split(text,' ')) from '{SF}/documents.parquet'"
            ).fetchall()
        )
        assert got == want

    def test_regex_token_counts_match_duckdb(self, spark, docs):
        """The BPE-ish pre-tokenizer pattern must count identically in
        Java regex (Spark) and RE2 (DuckDB) — including punctuation and
        digit splitting, pinned on a handcrafted doc."""
        from pyspark.sql import Row

        from fuggetabouspark.dataops import regex_token_counts
        from fuggetabouspark.dataops.textstats import BPE_ISH_PATTERN

        crafted = spark.createDataFrame(
            [Row(doc_id=999_999, source="x", text="ab12,cd!  e3")]
        )
        rows = regex_token_counts(
            docs.select("doc_id", "source", "text").unionByName(crafted)
        ).collect()
        got = {r.doc_id: r.n_bpe_tokens for r in rows}
        # ab|1|2|,|cd|!|e|3 → 8 tokens
        assert got[999_999] == 8
        want = dict(
            duckdb.sql(
                f"select doc_id, len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) "
                f"from '{SF}/documents.parquet'"
            ).fetchall()
        )
        assert {k: v for k, v in got.items() if k != 999_999} == want

    def test_quality_deterministic_and_bounded(self, docs):
        rows = quality_score(docs).collect()
        assert all(0.0 <= r.quality <= 1.0 for r in rows)
        again = {r.doc_id: r.quality for r in quality_score(docs).collect()}
        assert {r.doc_id: r.quality for r in rows} == again

    def test_language_id_covers_all_docs(self, docs):
        rows = language_id(docs).collect()
        assert len(rows) == docs.count()
        assert {r.lang_pred for r in rows} <= {"en", "es", "de", "fr", "zh", "und"}


class TestDedup:
    def test_exact_dedup_matches_duckdb(self, spark, docs):
        from pyspark.sql import Row

        with_dup = docs.select("doc_id", "text").unionAll(
            spark.createDataFrame(
                [Row(doc_id=99901, text=docs.first()["text"]),
                 Row(doc_id=99902, text=docs.first()["text"])]
            )
        ).withColumn("source", F.lit("x"))
        groups = exact_dedup(with_dup).collect()
        assert len(groups) == 1 and groups[0]["n_copies"] == 3

    def test_minhash_lsh_finds_planted_near_dup(self, spark, docs):
        from pyspark.sql import Row

        base = docs.first()["text"]
        near = base + " extra"
        aug = docs.select("doc_id", "source", "text").unionAll(
            spark.createDataFrame([Row(doc_id=88801, source="x", text=near)])
        )
        sig = minhash_signatures(aug, num_hashes=64)
        cand = minhash_lsh_candidates(sig, bands=16, rows_per_band=4)
        pairs = {(r.doc_a, r.doc_b) for r in cand.collect()}
        first_id = docs.first()["doc_id"]
        assert (min(first_id, 88801), max(first_id, 88801)) in pairs

    def test_simhash_near_dup_shares_band(self, spark, docs):
        from pyspark.sql import Row

        base = docs.first()["text"]
        aug = docs.select("doc_id", "source", "text").unionAll(
            spark.createDataFrame([Row(doc_id=88802, source="x", text=base + " z")])
        )
        sh = {r.doc_id: r for r in simhash_buckets(aug).collect()}
        a, b = sh[docs.first()["doc_id"]], sh[88802]
        bands_a = [a[f"band{i}"] for i in range(4)]
        bands_b = [b[f"band{i}"] for i in range(4)]
        assert any(x == y for x, y in zip(bands_a, bands_b)), "near-dup must share a simhash band"
        ham = bin((a.simhash ^ b.simhash) & ((1 << 64) - 1)).count("1")
        assert ham <= 8

    def test_ngram_jaccard_exact_vs_duckdb(self, spark, docs):
        """Exact 3-gram jaccard on a planted pair matches hand math."""
        from pyspark.sql import Row

        t1 = "a b c d e f g h"
        t2 = "a b c d e f g x"
        df = spark.createDataFrame(
            [Row(doc_id=1, source="s", text=t1), Row(doc_id=2, source="s", text=t2)]
        )
        got = ngram_jaccard_pairs(df, threshold=0.0).collect()
        assert len(got) == 1
        # 6 trigrams each, 5 shared -> 5/7
        assert abs(got[0]["jaccard"] - 5 / 7) < 1e-3


class TestSimilarity:
    def test_brute_force_matches_duckdb(self, spark, emb):
        qs = emb.orderBy("vec_id").limit(3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        got = [(r.query_id, r.vec_id, r.rank) for r in
               brute_force_topk(emb, qs, k=5).orderBy("query_id", "rank").collect()]
        want = duckdb.sql(
            f"""
            with e as (select * from '{SF}/embeddings.parquet'),
            q as (select vec_id qid, embedding qv from e where vec_id < 3)
            select qid, vec_id, rnk from (
              select qid, vec_id, row_number() over
                (partition by qid order by list_cosine_similarity(embedding, qv) desc, vec_id) rnk
              from e, q) t where rnk <= 5 order by qid, rnk
            """
        ).fetchall()
        assert got == [tuple(w) for w in want]

    def test_lsh_topk_recall(self, spark, emb):
        dim = len(emb.select("embedding").first()[0])
        qs = emb.orderBy("vec_id").limit(5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        exact = brute_force_topk(emb, qs, k=1).collect()
        approx = lsh_bucket_topk(emb, qs, dim=dim, k=1, bits=6).collect()
        # self-vector (cos=1) must always be found: it shares its own bucket
        exact_top = {(r.query_id, r.vec_id) for r in exact}
        approx_top = {(r.query_id, r.vec_id) for r in approx}
        assert exact_top == approx_top


class TestIVF:
    def test_recall_curve_and_exact_at_full_probe(self, spark, emb):
        from fuggetabouspark.dataops import ivf_topk

        dim = len(emb.select("embedding").first()[0])
        qs = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        ex = {}
        for r in brute_force_topk(emb, qs, k=5).collect():
            ex.setdefault(r.query_id, set()).add(r.vec_id)

        def recall(nprobe):
            ap = {}
            for r in ivf_topk(emb, qs, dim=dim, k=5, n_lists=8, nprobe=nprobe).collect():
                ap.setdefault(r.query_id, set()).add(r.vec_id)
            return sum(len(ex[q] & ap.get(q, set())) for q in ex) / sum(len(s) for s in ex.values())

        r2, r8 = recall(2), recall(8)
        assert r8 == 1.0, "nprobe == n_lists must equal brute force"
        assert r2 <= r8
        # the query's own vector always lands in a probed list
        ap2 = {}
        for r in ivf_topk(emb, qs, dim=dim, k=5, n_lists=8, nprobe=1).collect():
            ap2.setdefault(r.query_id, set()).add(r.vec_id)
        assert all(q in ap2[q] for q in ap2)


class TestEmbeddingNearDup:
    def test_lsh_path_finds_planted_duplicate(self, spark, emb):
        from pyspark.sql import Row

        dim = len(emb.select("embedding").first()[0])
        base = emb.first()
        dup = [float(x) * 1.0001 for x in base["embedding"]]  # near-identical
        aug = emb.unionAll(
            spark.createDataFrame([Row(vec_id=999999, embedding=dup, label=0)])
        )
        pairs = {
            (r.vec_a, r.vec_b)
            for r in embedding_near_dup(aug, dim=dim, threshold=0.99, bits=6).collect()
        }
        assert (base["vec_id"], 999999) in pairs
        # and nothing else sneaks in at 0.99 in this table
        assert all(b == 999999 for _, b in pairs)

    def test_exact_path_matches_duckdb(self, spark, emb):
        dim = len(emb.select("embedding").first()[0])
        got = {
            (r.vec_a, r.vec_b)
            for r in embedding_near_dup(emb, dim=dim, threshold=0.45, exact=True).collect()
        }
        want = {
            tuple(r)
            for r in duckdb.sql(
                f"""SELECT a.vec_id, b.vec_id
                    FROM '{SF}/embeddings.parquet' a JOIN '{SF}/embeddings.parquet' b
                    ON a.vec_id < b.vec_id
                    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45"""
            ).fetchall()
        }
        assert got == want


class TestStableSample:
    def test_deterministic_monotone_and_unbiased(self, spark, docs):
        from fuggetabouspark.dataops import stable_sample

        ids = lambda df: {r.doc_id for r in df.select("doc_id").collect()}
        s_a = ids(stable_sample(docs.repartition(2), 0.3))
        s_b = ids(stable_sample(docs.repartition(7), 0.3))
        assert s_a == s_b, "sample must not depend on partitioning"
        assert ids(stable_sample(docs, 0.1)) <= s_a, "rate growth only adds rows"
        n_total = docs.count()
        assert abs(len(s_a) - 0.3 * n_total) <= 4 * (0.3 * 0.7 * n_total) ** 0.5
        assert ids(stable_sample(docs, 0.0)) == set()
        assert len(ids(stable_sample(docs, 1.0))) == n_total
        # different salt -> a (near-)independent draw, not the same set
        assert ids(stable_sample(docs, 0.3, salt="other")) != s_a


class TestConnectedComponents:
    def test_planted_components_and_chain(self, spark):
        """Two disjoint clusters + a 9-node path (transitive chaining —
        the case pair-level dedup can't answer); min-id labeling."""
        from fuggetabouspark.dataops import connected_components

        edges = (
            [(1, 2), (2, 3), (1, 3)]        # triangle -> comp 1
            + [(10, 11)]                     # pair -> comp 10
            + [(i, i + 1) for i in range(20, 28)]  # path 20..28 -> comp 20
        )
        df = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {r.node: r.comp for r in connected_components(df).collect()}
        assert got == {
            1: 1, 2: 1, 3: 1,
            10: 10, 11: 10,
            **{i: 20 for i in range(20, 29)},
        }

    def test_non_convergence_raises(self, spark):
        from fuggetabouspark.dataops import connected_components

        df = spark.createDataFrame([(i, i + 1) for i in range(6)], "doc_a long, doc_b long")
        with pytest.raises(RuntimeError, match="converge"):
            connected_components(df, max_iter=1)


class TestDedupScaleShapes:
    def test_cc_giant_star_and_long_path(self, spark):
        """Skew + adversarial-diameter robustness (round 3, VERDICT r02
        #5): one giant 10^5-leaf star (the near-clique dedup shape at
        its most skewed) plus a 256-edge path chain (the worst case for
        plain min-label propagation, which needs diameter=256 rounds).
        Pointer jumping must converge within max_iter=12 ≈
        log2(256) + slack — the max_iter bound doubles as the
        round-count assertion (non-convergence raises)."""
        from fuggetabouspark.dataops import connected_components

        star = spark.range(1, 100_001).select(
            F.lit(0).alias("doc_a"), F.col("id").alias("doc_b")
        )
        base = 10_000_000
        path = spark.createDataFrame(
            [(base + i, base + i + 1) for i in range(256)], "doc_a long, doc_b long"
        )
        cc = connected_components(star.unionAll(path), max_iter=12)
        comps = {r["node"]: r["comp"] for r in cc.collect()}
        assert len(comps) == 100_001 + 257
        assert all(comps[i] == 0 for i in range(100_001))
        assert all(comps[base + i] == base for i in range(257))

    def test_exact_dedup_caps_huge_group(self, spark):
        """A planted 10^5-copy group must stay O(max_ids) per output
        row (VERDICT r01 #7): n_copies exact, id sample bounded."""
        big = spark.range(100_000).select(
            F.col("id").alias("doc_id"), F.lit("same boilerplate text").alias("text")
        )
        uniq = spark.range(100_000, 100_010).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("unique "), F.col("id").cast("string")).alias("text"),
        )
        out = exact_dedup(big.unionAll(uniq), max_ids=8)
        # round 3: the bounded sample must come from two-level
        # aggregation, never a rank window — a Window.partitionBy(fp)
        # would sort the whole pathological group in ONE task
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        groups = out.collect()
        assert len(groups) == 1
        g = groups[0]
        assert g["n_copies"] == 100_000
        assert len(g["doc_ids"]) == 8
        assert g["doc_ids"] == list(range(8))  # lowest ids, sorted

    def test_shingle4_short_batch_no_crash(self, spark):
        """shingle > 3 with a tiny trailing batch (total tokens < 2n-2)
        used to crash the boundary-masked accumulator with a broadcast
        ValueError (code-review r02); docs shorter than the shingle
        fall back to single-word signatures."""
        from pyspark.sql import Row

        df = spark.createDataFrame(
            [Row(doc_id=1, source="s", text="a b"), Row(doc_id=2, source="s", text="x")]
        ).repartition(1)
        rows = {r.doc_id: list(r.sig) for r in minhash_signatures(df, num_hashes=8, shingle=4).collect()}
        assert len(rows) == 2 and all(len(v) == 8 for v in rows.values())
        # doc 1 and doc 2 must differ (single-word fallback hashes)
        assert rows[1] != rows[2]

    def test_minhash_batch_matches_per_doc_reference(self, spark):
        """The flattened batch shingle+segment-min formulation must be
        value-identical to the straightforward per-doc reference, incl.
        short-doc (< shingle) fallback (VERDICT r01 #4)."""
        from pyspark.sql import Row

        from fuggetabouspark.hashing import splitmix64

        texts = [
            "a b c d e f g h i j",
            "one",            # shorter than shingle: single-word fallback
            "two words",
            "x y z",          # exactly shingle words -> one shingle
            "the quick brown fox jumps over the lazy dog again and again",
        ]
        df = spark.createDataFrame(
            [Row(doc_id=i, source="s", text=t) for i, t in enumerate(texts)]
        )
        num_hashes, shingle = 16, 3
        got = {
            r.doc_id: list(r.sig)
            for r in minhash_signatures(df, num_hashes=num_hashes, shingle=shingle).collect()
        }
        # reference: per-doc loop over JVM word hashes
        wh = {
            r.doc_id: np.array(r.w, dtype=np.int64).view(np.uint64)
            for r in df.select(
                "doc_id",
                F.transform(F.split("text", " "), lambda w: F.xxhash64(w)).alias("w"),
            ).collect()
        }
        seeds = splitmix64(np.arange(1, num_hashes + 1, dtype=np.uint64))
        for doc_id, words in wh.items():
            if words.size < shingle:
                sh = splitmix64(words)
            else:
                with np.errstate(over="ignore"):
                    acc = words[: words.size - shingle + 1].copy()
                    for j in range(1, shingle):
                        acc = splitmix64(acc ^ words[j : words.size - shingle + 1 + j])
                sh = acc
            with np.errstate(over="ignore"):
                hs = splitmix64(sh[None, :] ^ seeds[:, None])
            want = (hs.min(axis=1) >> np.uint64(1)).astype(np.int64)
            assert got[doc_id] == want.tolist(), f"doc {doc_id}"


class TestMinhashTokens:
    def test_token_path_finds_planted_near_dup(self, spark):
        """Pre-tokenized (input_hint-shaped) corpus: near-identical
        token arrays must land in a shared LSH bucket; NULL arrays get
        the sentinel signature without crashing the Arrow path."""
        from pyspark.sql import Row

        from fuggetabouspark.dataops import minhash_signatures_tokens

        rng = np.random.default_rng(5)
        base = [int(x) for x in rng.integers(0, 50_000, 200)]
        rows = [
            Row(doc_id="d0", source="s", tokens=base),
            Row(doc_id="d1", source="s", tokens=base + [7, 8, 9]),  # near-dup
            Row(doc_id="dnull", source="s", tokens=None),
        ] + [
            Row(doc_id=f"r{i}", source="s", tokens=[int(x) for x in rng.integers(0, 50_000, 150)])
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id string, source string, tokens array<int>")
        sig = minhash_signatures_tokens(df, num_hashes=64)
        got = {r.doc_id: list(r.sig) for r in sig.collect()}
        assert got["dnull"] == [np.iinfo(np.int64).max] * 64
        from fuggetabouspark.dataops import minhash_lsh_candidates

        cand = minhash_lsh_candidates(sig, bands=16, rows_per_band=4)
        pairs = {(r.doc_a, r.doc_b) for r in cand.collect()}
        assert ("d0", "d1") in pairs or ("d1", "d0") in pairs


def _clustered_embeddings(spark, n_clusters=16, per_cluster=32, dim=64, noise=0.03):
    """Deterministic clustered vectors — the realistic ANN workload
    (near-dup embeddings cluster; the sf fixtures are near-uniform
    random, where no sublinear method can have high recall)."""
    rng = np.random.default_rng(7)
    cents = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    pts = np.repeat(cents, per_cluster, axis=0) + noise * rng.standard_normal(
        (n_clusters * per_cluster, dim)
    ).astype(np.float32)
    return spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<float>",
    )


class TestMultiProbeLSH:
    def test_multiprobe_recall_gate(self, spark):
        """recall@10 >= 0.9 at bits=6, n_probes=8 (scoring only 8 of 64
        buckets — real 8x pruning) on clustered data, and multi-probe
        must beat single-probe (VERDICT r01 #5). Measured 0.98 vs 0.48
        single-probe at these params."""
        emb = _clustered_embeddings(spark)
        qs = emb.where(F.col("vec_id") % 32 == 5).limit(6).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        ex = {}
        for r in brute_force_topk(emb, qs, k=10).collect():
            ex.setdefault(r.query_id, set()).add(r.vec_id)

        def recall(n_probes):
            ap = {}
            for r in lsh_bucket_topk(emb, qs, dim=64, k=10, bits=6, n_probes=n_probes).collect():
                ap.setdefault(r.query_id, set()).add(r.vec_id)
            return sum(len(ex[q] & ap.get(q, set())) for q in ex) / sum(
                len(s) for s in ex.values()
            )

        r1, r8 = recall(1), recall(8)
        assert r8 >= 0.9, f"multi-probe recall@10 {r8:.2f} < 0.9"
        assert r8 > r1, f"multi-probe {r8:.2f} must beat single-probe {r1:.2f}"

    def test_lazy_enumeration_matches_exhaustive_ranking(self):
        """The heap enumeration must yield ALL 2^bits distinct buckets
        in nondecreasing flipped-margin order at any bits — including
        bits > 8, where the old fixed-table version silently drew flips
        from only the 8 lowest-margin bits (code-review r02)."""
        from fuggetabouspark.dataops.similarity import _multiprobe_buckets

        rng = np.random.default_rng(11)
        for bits in (5, 10):
            qproj = rng.standard_normal((3, bits))
            probe = _multiprobe_buckets(qproj, bits, 1 << bits)
            margins = np.abs(qproj)
            weights = np.int64(1) << np.arange(bits, dtype=np.int64)
            base = ((qproj > 0).astype(np.int64) * weights).sum(axis=1)
            for qi in range(3):
                assert len(set(probe[qi].tolist())) == 1 << bits, "all buckets, no dups"
                # recompute each emitted bucket's flipped-margin cost;
                # must be nondecreasing
                flipped = probe[qi] ^ base[qi]
                costs = [
                    margins[qi][(np.int64(f) >> np.arange(bits)) & 1 == 1].sum()
                    for f in flipped
                ]
                assert probe[qi][0] == base[qi], "own bucket first"
                assert all(a <= b + 1e-12 for a, b in zip(costs, costs[1:]))

    def test_full_probe_equals_exact(self, spark, emb):
        """n_probes = 2^bits probes every bucket — must equal brute
        force even on the adversarial near-uniform fixture."""
        qs = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        ex = {(r.query_id, r.vec_id, r.rank) for r in brute_force_topk(emb, qs, k=10).collect()}
        ap = {
            (r.query_id, r.vec_id, r.rank)
            for r in lsh_bucket_topk(emb, qs, dim=64, k=10, bits=4, n_probes=16).collect()
        }
        assert ex == ap


class TestIVFHighDim:
    def test_ivf_dim768_no_plan_explosion(self, spark):
        """dim=768 mean step via mapInArrow partial-sums (VERDICT r01
        #6): must run and match brute force at nprobe == n_lists."""
        from fuggetabouspark.dataops import ivf_topk

        rng = np.random.default_rng(3)
        pts = rng.standard_normal((200, 768)).astype(np.float32)
        emb768 = spark.createDataFrame(
            [(i, [float(x) for x in pts[i]]) for i in range(200)],
            "vec_id long, embedding array<float>",
        )
        qs = emb768.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        ex = {(r.query_id, r.vec_id, r.rank) for r in brute_force_topk(emb768, qs, k=5).collect()}
        ap = {
            (r.query_id, r.vec_id, r.rank)
            for r in ivf_topk(emb768, qs, dim=768, k=5, n_lists=4, nprobe=4).collect()
        }
        assert ex == ap


class TestMultimodal:
    def test_feature_plumbing(self, spark):
        media = synthesize_media(spark, n=12, kind="video")
        feats = decode_and_featurize(media, frames_per_media=2)
        rows = feats.collect()
        assert all(len(r.feature) == 8 for r in rows)
        n_frames = {r["media_id"]: r["n_frames"] for r in media.collect()}
        got = {}
        for r in rows:
            got.setdefault(r.media_id, 0)
            got[r.media_id] += 1
        assert all(got[m] == min(2, n_frames[m]) for m in got)

    def test_real_decode_is_marked_stub_for_codec_formats(self, spark):
        media = synthesize_media(spark, n=2)  # kind='image': raw fake bytes
        with pytest.raises(Exception, match="NotImplementedError|decode"):
            decode_and_featurize(media, fake=False).collect()

    def test_wav_codec_roundtrip_and_spectral_centroid(self):
        from fuggetabouspark.dataops.multimodal import (
            _audio_features,
            decode_wav,
            encode_wav,
        )

        rate = 16_000
        t = np.arange(8192) / rate
        f0 = 1000.0
        x = (0.8 * 32767 * np.sin(2 * np.pi * f0 * t)).astype(np.int16)
        back, r2 = decode_wav(encode_wav(x, rate))
        assert r2 == rate and np.array_equal(back, x), "PCM16 roundtrip must be exact"
        feats = _audio_features(x, rate)
        rms, zcr, centroid = feats[0], feats[1], feats[2]
        assert abs(rms - 0.8 / np.sqrt(2)) < 0.01, "sine RMS = A/sqrt(2)"
        assert abs(centroid - f0) < 25, f"spectral centroid {centroid} != {f0}"
        assert abs(zcr - 2 * f0 / rate) < 0.01, "2 zero crossings per cycle"

    def test_ppm_codec_roundtrip(self):
        from fuggetabouspark.dataops.multimodal import decode_ppm, encode_ppm

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)
        with pytest.raises(ValueError):
            decode_ppm(b"P5\n1 1\n255\n\x00")

    def test_real_wav_and_ppm_featurize_end_to_end(self, spark):
        """fake=False genuinely decodes the synthesized RIFF/P6 payloads
        on executors and extracts finite real features."""
        for kind, frames in (("wav", 2), ("ppm", 1)):
            media = synthesize_media(spark, n=8, kind=kind)
            rows = decode_and_featurize(media, frames_per_media=2, fake=False).collect()
            assert len(rows) == 8 * frames
            for r in rows:
                assert len(r.feature) == 8
                assert all(np.isfinite(v) for v in r.feature)
            if kind == "wav":
                # synthesized sines have f0 in [200, 3000]; the decoded
                # spectral centroid must land in that band (+noise slack)
                assert all(100 < r.feature[2] < 4000 for r in rows)


class TestPQ:
    def test_full_shortlist_equals_exact(self, spark, emb):
        """shortlist = n re-ranks every vector — must equal brute force
        rank-for-rank even on the adversarial near-uniform fixture."""
        from fuggetabouspark.dataops import brute_force_topk, pq_topk

        n = emb.count()
        qs = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        ex = {(r.query_id, r.vec_id, r.rank) for r in brute_force_topk(emb, qs, k=10).collect()}
        ap = {
            (r.query_id, r.vec_id, r.rank)
            for r in pq_topk(emb, qs, dim=64, k=10, m=16, ksub=64, shortlist=n).collect()
        }
        assert ex == ap

    def test_lossy_shortlist_recall_on_clusters(self, spark):
        """Real pruning: a 32-vector shortlist of 512 (16× fewer exact
        scores) on clustered data must keep recall@10 >= 0.9 — the
        regime PQ exists for. Codes are 16 bytes vs 256-byte vectors."""
        from fuggetabouspark.dataops import brute_force_topk, pq_topk

        emb = _clustered_embeddings(spark)
        qs = emb.where(F.col("vec_id") % 32 == 5).limit(6).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        ex = {}
        for r in brute_force_topk(emb, qs, k=10).collect():
            ex.setdefault(r.query_id, set()).add(r.vec_id)
        ap = {}
        for r in pq_topk(emb, qs, dim=64, k=10, m=16, ksub=64, shortlist=32).collect():
            ap.setdefault(r.query_id, set()).add(r.vec_id)
        rec = sum(len(ex[q] & ap.get(q, set())) for q in ex) / sum(len(s) for s in ex.values())
        assert rec >= 0.9, f"PQ+rerank recall@10 {rec:.2f} < 0.9 at 16x pruning"

    def test_encode_deterministic_across_partitionings(self, spark, emb):
        """PQ codes are a pure function of the vector and the (seeded,
        sample-trained) codebook — repartitioning must not change any
        code (the partition-independence contract all dataops share)."""
        from fuggetabouspark.dataops import pq_encode, pq_train

        cbs = pq_train(emb, dim=64, m=16, ksub=64)
        a = {r.vec_id: r.code for r in pq_encode(emb.repartition(2), cbs).collect()}
        b = {r.vec_id: r.code for r in pq_encode(emb.repartition(7), cbs).collect()}
        assert a == b

    def test_train_deterministic_with_string_ids(self, spark, emb):
        """The hash sample must be deterministic for STRING ids too
        (ADVICE r03: xxhash64(id + seed) cast a string id to NULL,
        tying every sort key and making codebooks depend on partition
        order): identical codebooks / IVF centroids across arbitrary
        repartitionings of a string-keyed table."""
        from fuggetabouspark.dataops import pq_train
        from fuggetabouspark.dataops.similarity import ivf_centroids

        s = emb.select(
            F.concat(F.lit("id_"), F.col("vec_id").cast("string")).alias("vec_id"),
            "embedding",
        )
        a = pq_train(s.repartition(3), dim=64, m=16, ksub=64, sample=100)
        b = pq_train(s.repartition(11), dim=64, m=16, ksub=64, sample=100)
        assert np.array_equal(a, b)
        ca = ivf_centroids(s.repartition(3), dim=64, n_lists=4, iters=1)
        cb = ivf_centroids(s.repartition(11), dim=64, n_lists=4, iters=1)
        assert np.array_equal(ca, cb)


class TestQualityFilterAndPII:
    def test_quality_filter_rules_handmath(self, spark):
        """Pin the integer rules on handcrafted docs: too short, too
        repetitive (top word > 10%), low distinct ratio, and a clean
        doc that passes all three."""
        from pyspark.sql import Row

        from fuggetabouspark.dataops import quality_filter

        clean = " ".join(f"w{i}" for i in range(20))          # 20 distinct words
        short = "a b c"                                        # < 10 words
        repet = "x " * 5 + " ".join(f"y{i}" for i in range(15))  # x 5/20 = 25%
        lowdist = " ".join(["a", "b"] * 10)                    # 2 distinct / 20
        df = spark.createDataFrame(
            [Row(doc_id=1, source="s", text=clean),
             Row(doc_id=2, source="s", text=short),
             Row(doc_id=3, source="s", text=repet.strip()),
             Row(doc_id=4, source="s", text=lowdist)]
        )
        got = {r.doc_id: r.keep for r in quality_filter(df).collect()}
        assert got == {1: True, 2: False, 3: False, 4: False}

    def test_redact_pii_counts_and_scrubs(self, spark):
        from pyspark.sql import Row

        from fuggetabouspark.dataops import redact_pii

        df = spark.createDataFrame(
            [Row(doc_id=1, source="s",
                 text="mail me at jane.doe+x@sub.example.org or call 555-123-4567 x2"),
             Row(doc_id=2, source="s", text="no pii here at all")]
        )
        rows = {r.doc_id: r for r in redact_pii(df).collect()}
        assert rows[1].n_email == 1 and rows[1].n_phone == 1
        assert rows[2].n_email == 0 and rows[2].n_phone == 0
        assert "<EMAIL>" in rows[1].text_redacted and "<PHONE>" in rows[1].text_redacted
        assert "@" not in rows[1].text_redacted
        assert rows[2].text_redacted == rows[2].text


class TestSequencePacking:
    def test_handcrafted_packing_exact(self, spark):
        """Pin the packing semantics exactly: doc_id order within
        bucket, greedy seq_len cuts, trailing partial dropped, empty
        buckets emit nothing."""
        from pyspark.sql import Row

        from fuggetabouspark.dataops import pack_sequences, packing_accounting

        df = spark.createDataFrame(
            [Row(doc_id=2, tokens=[10, 11, 12, 13]),
             Row(doc_id=0, tokens=[0, 1, 2, 3, 4, 5]),
             Row(doc_id=1, tokens=[100, 101, 102])],
            "doc_id long, tokens array<int>",
        )
        packed = pack_sequences(df, seq_len=4, bucket_expr=F.col("doc_id") % 2)
        rows = sorted((r.bucket, r.seq_idx, tuple(r.tokens)) for r in packed.collect())
        # bucket 0 = docs 0,2 → [0..5,10..13] → [0,1,2,3],[4,5,10,11]; drop [12,13]
        # bucket 1 = doc 1 (3 tokens < 4) → nothing
        assert rows == [(0, 0, (0, 1, 2, 3)), (0, 1, (4, 5, 10, 11))]
        acct = {r.bucket: (r.n_seqs, r.n_tokens_packed, r.all_len_ok)
                for r in packing_accounting(packed, 4).collect()}
        assert acct == {0: (2, 8, True)}

    def test_packing_partition_invariant(self, spark, docs):
        """The packed corpus is a pure function of (corpus, bucketing,
        seq_len): repartitioning must reproduce every sequence."""
        from fuggetabouspark.dataops import pack_sequences

        tok = docs.select(
            "doc_id", F.transform(F.split("text", " "), lambda w: F.xxhash64(w)).alias("tokens")
        )
        def run(d):
            return sorted(
                (r.bucket, r.seq_idx, tuple(r.tokens))
                for r in pack_sequences(d, 64, bucket_expr=F.col("doc_id") % 4).collect()
            )
        a, b = run(tok.repartition(2)), run(tok.repartition(7))
        assert a == b and len(a) > 0


class TestNewOpGuards:
    def test_pack_rejects_nonpositive_seq_len(self, spark):
        from fuggetabouspark.dataops import pack_sequences

        df = spark.createDataFrame([(1, [1, 2])], "doc_id long, tokens array<int>")
        with pytest.raises(ValueError, match="seq_len"):
            pack_sequences(df, 0)

    def test_pq_rejects_bad_geometry(self, spark, emb):
        from fuggetabouspark.dataops import pq_train

        with pytest.raises(ValueError, match="not divisible"):
            pq_train(emb, dim=64, m=7)
        with pytest.raises(ValueError, match="uint8"):
            pq_train(emb, dim=64, m=16, ksub=512)


class TestRepeatedPassages:
    """Substring-level dedup (round 4, VERDICT r03 #3): windowed
    rolling token fingerprints — the distributed approximation of Lee
    et al. 2022's repeated-passage removal."""

    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_shared_passage(self, spark):
        from fuggetabouspark.dataops import repeated_passages

        para = " ".join(f"p{i}" for i in range(8))  # 8 shared tokens
        mk = lambda pre, i: (i, f"{pre} {para}")
        df = self._mk(
            spark,
            [
                mk("alpha beta gamma delta", 1),
                mk("one two three", 2),
                mk("x y z w q r", 3),
                (4, "totally unrelated words only here nothing shared"),
            ],
        )
        got = repeated_passages(df, window=5, stride=1, min_docs=2).collect()
        # the 8-token paragraph contributes 8-5+1=4 fully-interior
        # windows shared by docs 1,2,3; boundary-crossing windows
        # differ per doc (different prefixes)
        full = [r for r in got if r.n_docs == 3]
        assert len(full) == 4
        for r in full:
            assert r.doc_ids == ["1", "2", "3"]
            assert r.n_occ == 3

    def test_partition_invariance_and_intra_doc(self, spark):
        from fuggetabouspark.dataops import passage_fingerprints, repeated_passages

        rep = " ".join(f"t{i}" for i in range(6))
        df = self._mk(
            spark,
            [(1, f"{rep} filler filler2 {rep}"), (2, "a b c d e f g h")],
        )
        a = sorted(
            (r.fp, r.n_docs, r.n_occ) for r in
            repeated_passages(df.repartition(1), window=6, min_docs=1).collect()
        )
        b = sorted(
            (r.fp, r.n_docs, r.n_occ) for r in
            repeated_passages(df.repartition(5), window=6, min_docs=1).collect()
        )
        assert a == b
        # doc 1 contains the 6-token run twice -> that fp has n_occ=2
        pf = passage_fingerprints(df, window=6).where("doc_id = 1")
        assert {r.n_occ for r in pf.collect()} >= {1, 2}
        twice = [r for r in pf.collect() if r.n_occ == 2]
        assert len(twice) == 1 and twice[0].first_pos == 0

    def test_short_docs_and_stride(self, spark):
        from fuggetabouspark.dataops import passage_fingerprints

        df = self._mk(spark, [(1, "a b c"), (2, " ".join("w%d" % i for i in range(10)))])
        got = passage_fingerprints(df, window=5, stride=2).collect()
        assert all(r.doc_id == 2 for r in got)  # doc 1 too short
        assert sorted(r.first_pos for r in got) == [0, 2, 4]


class TestDenseBucketCap:
    """embedding_near_dup dense-bucket cap (round 4, VERDICT r03 #4):
    a mode-collapse cluster must not produce a quadratic task, and the
    cap must be invisible on under-cap buckets."""

    def test_planted_dense_cluster_finishes_star(self, spark):
        import numpy as np

        from fuggetabouspark.dataops import embedding_near_dup

        rng = np.random.default_rng(3)
        base = rng.normal(size=16).astype("float32")
        n = 3000
        rows = [
            (i, (base + rng.normal(scale=1e-4, size=16).astype("float32")).tolist())
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        pairs = embedding_near_dup(
            df, dim=16, threshold=0.999, bits=4, max_bucket=256
        )
        got = pairs.collect()
        # star pairing: O(n) rows, every member pairs with the min-id
        # representative -> one connected component, never n^2 rows
        assert len(got) == n - 1
        assert {r.vec_a for r in got} == {0}
        assert {r.vec_b for r in got} == set(range(1, n))

    def test_cap_invisible_on_normal_buckets(self, spark, emb):
        from fuggetabouspark.dataops import embedding_near_dup

        dim = len(emb.select("embedding").first()[0])
        uncapped = {
            (r.vec_a, r.vec_b)
            for r in embedding_near_dup(
                emb, dim=dim, threshold=0.5, bits=4, max_bucket=None
            ).collect()
        }
        capped = {
            (r.vec_a, r.vec_b)
            for r in embedding_near_dup(
                emb, dim=dim, threshold=0.5, bits=4, max_bucket=10**6
            ).collect()
        }
        assert capped == uncapped

    def test_fine_split_separates_distinct_colliders(self, spark):
        """Distinct (non-near-dup) vectors crammed into one coarse
        bucket by low bits must be SPLIT by the fine bits, keeping
        all-pairs semantics for the true near-dups planted inside."""
        import numpy as np

        from fuggetabouspark.dataops import embedding_near_dup

        rng = np.random.default_rng(9)
        # bits=1 -> at most 2 coarse buckets; 600 random vectors force
        # both far over a cap of 64
        rows = [(i, rng.normal(size=16).astype("float32").tolist()) for i in range(600)]
        v = rng.normal(size=16).astype("float32")
        rows += [(1000, v.tolist()), (1001, (v * 1.0001).tolist())]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        pairs = {
            (r.vec_a, r.vec_b)
            for r in embedding_near_dup(
                df, dim=16, threshold=0.999, bits=1, max_bucket=64, fine_bits=12
            ).collect()
        }
        assert (1000, 1001) in pairs


class TestPQQueryChunking:
    def test_chunked_scoring_identical(self, spark, emb):
        """The query-axis chunking that bounds the dense score matrix
        (round 4, VERDICT r03 #6) must be output-invisible: chunk=2
        (forcing many chunks for 6 queries) and one giant chunk give
        identical rank-for-rank results."""
        from fuggetabouspark.dataops import pq_topk

        qs = emb.where(F.col("vec_id") < 6).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        kw = dict(dim=64, k=10, m=16, ksub=64, shortlist=48)
        a = {
            (r.query_id, r.vec_id, r.rank)
            for r in pq_topk(emb, qs, query_chunk=2, **kw).collect()
        }
        b = {
            (r.query_id, r.vec_id, r.rank)
            for r in pq_topk(emb, qs, query_chunk=10**9, **kw).collect()
        }
        assert a == b and len({q for q, _, _ in a}) == 6


class TestPackingChecksum:
    def test_positional_checksum_handmath(self, spark):
        """checksum = sum token*(global 1-based position) over the kept
        prefix (round 4, VERDICT r03 #8) — pinned by hand arithmetic,
        and it must CHANGE when two tokens swap (order sensitivity is
        the whole point of a positional checksum)."""
        from pyspark.sql import Row

        from fuggetabouspark.dataops import pack_sequences, packing_accounting

        df = spark.createDataFrame(
            [Row(doc_id=0, tokens=[5, 7, 1, 3]), Row(doc_id=1, tokens=[2, 8])],
            "doc_id long, tokens array<int>",
        )
        packed = pack_sequences(df, seq_len=3, bucket_expr=F.lit(0))
        # stream: 5 7 1 3 2 8 -> seqs [5,7,1],[3,2,8]; positions 1..6
        want = 5*1 + 7*2 + 1*3 + 3*4 + 2*5 + 8*6
        got = packing_accounting(packed, 3, checksum=True).collect()[0]
        assert (got.n_seqs, got.n_tokens_packed, got.checksum) == (2, 6, want)

        swapped = spark.createDataFrame(
            [Row(doc_id=0, tokens=[7, 5, 1, 3]), Row(doc_id=1, tokens=[2, 8])],
            "doc_id long, tokens array<int>",
        )
        packed2 = pack_sequences(swapped, seq_len=3, bucket_expr=F.lit(0))
        got2 = packing_accounting(packed2, 3, checksum=True).collect()[0]
        assert got2.n_seqs == 2 and got2.checksum != want


class TestPNGCodec:
    """Real PNG decode (round 4, VERDICT r03 #5): zlib chunk walk +
    all five scanline unfilters, stdlib+numpy only."""

    def test_roundtrip_exercises_all_filters(self):
        import numpy as np

        from fuggetabouspark.dataops.multimodal import decode_png, encode_png

        rng = np.random.default_rng(5)
        # >= 5 rows so the cycling encoder emits every filter type;
        # gradient + noise makes each filter's arithmetic non-trivial
        img = (
            np.linspace(0, 255, 11 * 17 * 3).reshape(11, 17, 3)
            + rng.integers(0, 64, (11, 17, 3))
        ).astype(np.uint8)
        buf = encode_png(img)
        assert buf[:8] == b"\x89PNG\r\n\x1a\n"
        back = decode_png(buf)
        assert back.shape == (11, 17, 3) and (back == img).all()
        # filter-0-only encoding decodes identically too
        flat = encode_png(img, cycle_filters=False)
        assert (decode_png(flat) == img).all()
        assert flat != buf  # genuinely different filter plans

    def test_corrupt_and_unsupported(self):
        import numpy as np
        import pytest

        from fuggetabouspark.dataops.multimodal import decode_png, encode_png

        img = np.zeros((6, 6, 3), np.uint8)
        buf = encode_png(img)
        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"JUNK" + buf[4:])
        # flip IHDR color type to 5 (not a PNG color type): clear error
        bad = bytearray(buf)
        bad[8 + 8 + 9] = 5
        with pytest.raises(ValueError, match="color types"):
            decode_png(bytes(bad))
        # flip to a SUPPORTED type (6, RGBA) without re-encoding: the
        # payload stride no longer matches — caught, not garbage pixels
        bad[8 + 8 + 9] = 6
        with pytest.raises(ValueError, match="payload"):
            decode_png(bytes(bad))
        # truncation mid-IHDR and corrupt IDAT must be ValueError too,
        # never a leaked struct.error/zlib.error (code-review r04)
        with pytest.raises(ValueError):
            decode_png(buf[:20])
        broken = bytearray(buf)
        broken[8 + 12 + 13 + 12] ^= 0xFF  # first IDAT payload byte
        with pytest.raises(ValueError):
            decode_png(bytes(broken))

    def test_gray_alpha_and_palette_roundtrips(self):
        """Round 5 (VERDICT r04 #7): color types 0/3/4/6 — grayscale
        is a reshape, palette one PLTE LUT gather — with every filter
        branch exercised via the cycling encoder."""
        import numpy as np
        import pytest

        from fuggetabouspark.dataops.multimodal import (
            decode_png,
            encode_png,
            encode_png_indexed,
        )

        rng = np.random.default_rng(7)
        gray = rng.integers(0, 256, (9, 13), dtype=np.uint8)
        back = decode_png(encode_png(gray))
        assert back.shape == (9, 13) and (back == gray).all()
        ga = rng.integers(0, 256, (9, 13, 2), dtype=np.uint8)
        assert (decode_png(encode_png(ga)) == ga).all()
        rgba = rng.integers(0, 256, (9, 13, 4), dtype=np.uint8)
        assert (decode_png(encode_png(rgba)) == rgba).all()
        # palette: indices survive filtering and the LUT gather
        # reproduces the exact RGB the palette defines
        palette = rng.integers(0, 256, (17, 3), dtype=np.uint8)
        idx = rng.integers(0, 17, (9, 13), dtype=np.uint8)
        out = decode_png(encode_png_indexed(idx, palette))
        assert out.shape == (9, 13, 3) and (out == palette[idx]).all()
        # out-of-range palette index rejected at encode AND decode
        with pytest.raises(ValueError, match="palette"):
            encode_png_indexed(np.full((2, 2), 17, np.uint8), palette)
        buf = bytearray(encode_png_indexed(idx, palette))
        plte_at = buf.find(b"PLTE")
        del buf[plte_at - 4 : plte_at + 4 + 17 * 3 + 4]  # strip PLTE
        with pytest.raises(ValueError, match="PLTE"):
            decode_png(bytes(buf))

    def test_png_featurize_end_to_end(self, spark):
        """The Spark path over planted PNGs: synthesize -> decode ->
        _image_features must equal featurizing the locally-decoded
        image (same seed => same pixels)."""
        import numpy as np

        from fuggetabouspark.dataops.multimodal import (
            _image_features,
            decode_and_featurize,
            decode_png,
            synthesize_media,
        )

        media = synthesize_media(spark, n=8, kind="png", seed=11)
        rows = {r.media_id: r for r in media.collect()}
        feats = {
            r.media_id: list(r.feature)
            for r in decode_and_featurize(media, fake=False).collect()
        }
        assert set(feats) == set(rows)
        for mid, row in rows.items():
            img = decode_png(bytes(row.payload))
            assert img.shape == (row.height, row.width, 3)
            want = _image_features(img)
            assert np.allclose(feats[mid], want, rtol=1e-6)


class TestMaskRepeatedPassages:
    """Passage REMOVAL (round 4): drop-all-but-one-occurrence
    semantics at window granularity."""

    def test_keeper_semantics_handcrafted(self, spark):
        from fuggetabouspark.dataops import mask_repeated_passages

        para = " ".join(f"p{i}" for i in range(8))
        df = spark.createDataFrame(
            [(1, f"alpha beta {para} tail1"), (2, f"x y z {para}"),
             (3, f"{para} end1 end2"), (4, "nothing shared here at all ok")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in
               mask_repeated_passages(df, window=5, min_docs=2).collect()}
        # keeper = (doc 1, first paragraph window): doc 1 untouched
        assert out[1].n_tokens_removed == 0 and "p0" in out[1].text_clean
        assert out[2].text_clean == "x y z" and out[2].n_tokens_removed == 8
        assert out[3].text_clean == "end1 end2" and out[3].n_tokens_removed == 8
        assert out[4].n_tokens_removed == 0

    def test_intra_doc_repeat_dropped(self, spark):
        from fuggetabouspark.dataops import mask_repeated_passages

        rep = " ".join(f"t{i}" for i in range(5))
        df = spark.createDataFrame(
            [(1, f"{rep} mid1 mid2 {rep}"), (2, f"lead {rep}")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in
               mask_repeated_passages(df, window=5, min_docs=2).collect()}
        # keeper = (1, 0): doc 1 keeps the FIRST occurrence, loses the
        # second; doc 2 loses its copy entirely
        assert out[1].text_clean == f"{rep} mid1 mid2"
        assert out[1].n_tokens_removed == 5
        assert out[2].text_clean == "lead" and out[2].n_tokens_removed == 5

    def test_partition_invariant(self, spark):
        from fuggetabouspark.dataops import mask_repeated_passages

        para = " ".join(f"q{i}" for i in range(7))
        rows = [(i, f"w{i}a w{i}b {para} w{i}c") for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted((r.doc_id, r.text_clean, r.n_tokens_removed) for r in
                   mask_repeated_passages(df.repartition(1), window=5).collect())
        b = sorted((r.doc_id, r.text_clean, r.n_tokens_removed) for r in
                   mask_repeated_passages(df.repartition(7), window=5).collect())
        assert a == b
        kept = [t for t in a if "q0" in t[1]]
        assert len(kept) == 1 and kept[0][0] == 0  # keeper = min doc_id

    def test_matches_brute_force_on_real_corpus(self, spark, docs):
        """Full equality against an independent brute-force keeper
        reference over the REAL sf0.001 corpus (which genuinely
        contains 876 cross-doc shared 20-grams — the generator reuses
        sentence material like a crawl does): per-doc removed counts
        AND cleaned text must match exactly, including the 13 docs
        that are fully masked."""
        from collections import defaultdict

        from fuggetabouspark.dataops import mask_repeated_passages

        W = 20
        # keeper ordering follows the doc_id COLUMN TYPE (long here),
        # so the reference must compare ints, not strings
        got = {int(r.doc_id): (r.n_tokens_removed, r.text_clean)
               for r in mask_repeated_passages(docs, window=W, min_docs=2).collect()}
        rows = {int(r.doc_id): r.text.split() for r in docs.collect()}
        grams = defaultdict(list)
        for did in sorted(rows):
            ws = rows[did]
            for i in range(len(ws) - W + 1):
                grams[tuple(ws[i:i + W])].append((did, i))
        cover = defaultdict(set)
        for occ in grams.values():
            if len({d for d, _ in occ}) < 2:
                continue
            keeper = min(occ)
            for d, p in occ:
                if (d, p) != keeper:
                    cover[d].update(range(p, p + W))
        for did, ws in rows.items():
            want = (
                len(cover.get(did, ())),
                " ".join(w for i, w in enumerate(ws) if i not in cover.get(did, ())),
            )
            assert got[did] == want, did
