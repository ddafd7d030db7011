"""Training-data pipeline operators over the driver testdata tables
(documents, embeddings): deduplication, similarity search, text
analysis, multimodal plumbing. All Spark-first: built-in functions
where possible, Arrow-vectorized UDFs where not, never per-row Python.
"""

from .textstats import (
    doc_fingerprint,
    language_id,
    quality_filter,
    quality_score,
    redact_pii,
    repetition_stats,
    stable_sample,
    regex_token_counts,
    token_counts,
    tokenize_words,
)
from .dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    minhash_signatures_tokens,
    mask_repeated_passages,
    ngram_jaccard_pairs,
    passage_fingerprints,
    passage_positions,
    repeated_passages,
    simhash_buckets,
)
from .incremental import (
    StreamingIngestGuard,
    compact_dedup_checkpoint,
    compact_near_checkpoint,
    expire_ledgers,
    incremental_near_dup,
    completed_shards as dedup_completed_shards,
    incremental_dedup,
    ledger_df,
    load_dedup_state,
)
from .packing import pack_sequences, packing_accounting
from .similarity import (
    brute_force_topk,
    embedding_near_dup,
    ivf_topk,
    lsh_bucket_topk,
    pq_encode,
    pq_topk,
    pq_train,
)

__all__ = [
    "tokenize_words",
    "token_counts",
    "regex_token_counts",
    "language_id",
    "quality_score",
    "quality_filter",
    "repetition_stats",
    "redact_pii",
    "stable_sample",
    "doc_fingerprint",
    "exact_dedup",
    "connected_components",
    "minhash_signatures",
    "minhash_signatures_tokens",
    "minhash_lsh_candidates",
    "simhash_buckets",
    "ngram_jaccard_pairs",
    "passage_fingerprints",
    "passage_positions",
    "repeated_passages",
    "mask_repeated_passages",
    "brute_force_topk",
    "embedding_near_dup",
    "lsh_bucket_topk",
    "ivf_topk",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "pack_sequences",
    "packing_accounting",
    "incremental_dedup",
    "load_dedup_state",
    "ledger_df",
    "dedup_completed_shards",
    "StreamingIngestGuard",
    "incremental_near_dup",
    "compact_dedup_checkpoint",
    "compact_near_checkpoint",
    "expire_ledgers",
]
