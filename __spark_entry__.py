"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship mood pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose every SURVEY.md §2 capability
for the sf0.01 DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["mood_pipeline"](spark, "/root/testdata/sf0.001")


# The driver's CORRECTNESS gate caps at ~50 rows per round. _FRONT
# holds this round's must-grade set. Oracle-backed entries sort first
# within this list (see _ordered), then the rows-only tail.
# Previously-green rows whose plans did NOT change stay out on
# purpose; ~50 slots rotate each round (VERDICT r4 item 5: re-grade
# the stalest cohort).
_FRONT = [
    # --- r6 stale-cohort rotation (VERDICT r5 item 1): the six rows
    # not driver-graded since ROUND 1 ---
    "event_type_pivot",
    "window_distribution",
    "distinct_counts",
    "approx_distinct_hll",
    "moving_avg_range",
    "ts_pattern_topk",
    # --- r2-era cohort (not re-graded since round 2): 33 of the 47.
    # The six whose physical plans ALSO changed this round (the
    # per-vector norm hoist) lead; the twelve left for r7 are the
    # lowest-risk map-only deterministic samplers/counters/hashers
    # (mixture_sample, temperature_sample, stratified_kfold,
    # doc_chunking, stopword_removal, ngram_freq, token_count, and —
    # yielded to the five late-r6 queries below — doc_fingerprint,
    # lang_id, text_quality, sequence_packing, repetition_ratio,
    # pii_redaction) ---
    "embedding_ann_lsh",
    "embedding_topk",
    "hybrid_search",
    "rrf_fusion",
    "dedup_embedding",
    "knn_classify",
    "balanced_sample",
    "bloom_dedup",
    "bm25_topk",
    "connected_components_star",
    "contamination_check",
    "corpus_prep_pipeline",
    "corpus_stats",
    "dedup_clusters",
    "dedup_containment",
    "dedup_exact",
    "dedup_incremental",
    "dedup_index_probe",
    "dedup_minhash_pairs",
    "dedup_ngram_topk",
    "dedup_prefix_filter",
    "dedup_report",
    "edit_distance_pairs",
    "minhash_estimate_accuracy",
    "reaggregate_monthly",
    "repeated_ngram_spans",
    "simhash_portable",
    "tfidf_topk",
    "token_df_stats",
    "train_test_split",
    "triangle_count",
    "word_cooccurrence",
    # --- r6 oracle-changed guards: the probe-training CTE chain
    # gained sentinel rows (empty-doc boundary closure) — the driver
    # row is the proof the oracle rewrite is still exact ---
    "quality_classifier",
    "grad_match_select",
    # --- new r6 queries (first driver rows). Two r2-era rows yielded
    # their slots to keep the 50-cap: minhash_signatures (its sig
    # pipeline is fully contained in dedup_minhash_pairs's graded
    # path) and cluster_representatives (rides dedup_clusters) ---
    "citymood_source_agg",
    "cross_dedup_fuzzy",
    "rolling_active_users",
    "cusum_alerts",
    # --- late-r6 queries (first driver rows): MMR diverse reranking,
    # the log-free char-diversity junk filter, per-doc marginal
    # novelty, and the two governance gates (k-anonymity distribution,
    # FK referential-integrity audit) ---
    "mmr_select",
    "char_gini_quality",
    "ngram_novelty",
    "k_anonymity",
    "fk_integrity_audit",
    "clustering_coefficient",
]


def _ordered(d: dict) -> dict:
    # Within the front block, oracle-backed entries come first: each
    # yields a hard hash_match row in the driver gate, while rows-only
    # entries only prove they run — under any gate cap the hard-signal
    # rows must land inside it. Stable sort keeps the family grouping.
    front = sorted((k for k in _FRONT if k in d), key=lambda k: k not in ORACLES)
    out = {k: d[k] for k in front}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for ops whose
    hashing is not oracle-portable — e.g. xxhash64 simhash)."""
    return _ordered(dict(ORACLES))
