"""Training-data pipeline operators (beyond the reference's own surface;
first-class per the task brief): dedup, text analysis, similarity
search, multimodal plumbing."""

from .dedup import (
    cut_duplicate_spans,
    dedup_clusters,
    duplicate_spans,
    duplicated_ngram_stats,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_verified_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_pairs,
)
from .textstats import (
    bm25_scores,
    unigram_lm_score,
    bpe_token_count,
    contamination_check,
    ngram_decontaminate,
    doc_fingerprint,
    language_id,
    normalize_text,
    pii_redact,
    quality_score,
    repetition_stats,
    tfidf_top_terms,
    token_count,
    vocabulary,
)
from .cooccur import token_cooccurrence
from .embed_eval import linkpred_auc, negative_pairs
from .packing import chunk_documents, pack_sequences
from .sample import proportional_sample, stratified_sample, weighted_sample
from .sessions import sessionize_events
from .sketches import cms_probe_counts, cms_sketch, kmv_distinct_tokens
from .similarity import (
    ann_recall,
    cosine_topk,
    knn_label_accuracy,
    knn_label_accuracy_ann,
    embedding_neardup_pairs,
    ivf_cosine_topk,
    lsh_cosine_topk,
    pq_topk,
    semantic_dedup,
)

__all__ = [
    "duplicate_spans",
    "duplicated_ngram_stats",
    "cut_duplicate_spans",
    "exact_duplicates",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_verified_pairs",
    "dedup_clusters",
    "semantic_dedup",
    "simhash64",
    "simhash_pairs",
    "token_count",
    "pii_redact",
    "repetition_stats",
    "bpe_token_count",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "vocabulary",
    "tfidf_top_terms",
    "bm25_scores",
    "unigram_lm_score",
    "normalize_text",
    "contamination_check",
    "ngram_decontaminate",
    "cms_probe_counts",
    "sessionize_events",
    "cms_sketch",
    "kmv_distinct_tokens",
    "weighted_sample",
    "stratified_sample",
    "proportional_sample",
    "linkpred_auc",
    "negative_pairs",
    "chunk_documents",
    "pack_sequences",
    "token_cooccurrence",
    "cosine_topk",
    "knn_label_accuracy",
    "knn_label_accuracy_ann",
    "ann_recall",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "pq_topk",
    "embedding_neardup_pairs",
]
