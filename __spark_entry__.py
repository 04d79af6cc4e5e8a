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
    # --- new r7 queries (first driver rows): the privacy twin,
    # Benford digit conformance, lagged autocorrelation, burst
    # intervals, integer STL decomposition, common-neighbor link
    # prediction, and RAKE keyword extraction ---
    "l_diversity",
    "benford_quality",
    "acf_lag",
    "burst_detection",
    "stl_decompose",
    "linkpred_topk",
    "keyword_rake",
    "wilson_ranking",
    "zipf_profile",
    "feature_binning",
    "attribution_last_touch",
    "order_total_reconciliation",
    "kendall_tau_rankings",
    # --- r7 second batch (first driver rows): t-closeness EMD gate,
    # chi-square independence, Theil-Sen robust trend, Markov
    # transitions, graph mixing, revenue Gini, Flesch readability,
    # and domain-indicative vocabulary ---
    "t_closeness",
    "chi2_independence",
    "theil_sen_trend",
    "event_transition_matrix",
    "degree_assortativity",
    "revenue_gini",
    "readability_scores",
    "domain_token_lift",
    # --- r7 third batch (first driver rows): rank-sum A/B test,
    # trigram path mining, offline changepoint, RFM segments ---
    "mann_whitney_u",
    "session_path_topk",
    "changepoint_detection",
    "rfm_segmentation",
    # --- r7 fourth batch (first driver rows): FD profiling and
    # Haar timescale energy ---
    "fd_discovery",
    "haar_energy",
    # --- r7 fifth batch (first driver rows): graph tail profile and
    # SQ8 distortion QA ---
    "degree_distribution",
    "sq8_recon_error",
    # --- r7 sixth batch (first driver rows): KS shape test and
    # Spearman rank correlation ---
    "ks_test",
    "spearman_rho",
    # --- stale-cohort rotation (VERDICT r4 item 5 discipline): the
    # fifteen rows not driver-graded since ROUND 2 ---
    "cluster_representatives",
    "doc_chunking",
    "doc_fingerprint",
    "lang_id",
    "minhash_signatures",
    "mixture_sample",
    "ngram_freq",
    "pii_redaction",
    "repetition_ratio",
    "sequence_packing",
    "stopword_removal",
    "stratified_kfold",
    "temperature_sample",
    "text_quality",
    "token_count",
    # --- 14 of the 39 rows last graded in ROUND 3 (oracle-backed
    # ones only — rows-only pagerank_topk / binary_ingest and the
    # window/rollup family (shard_export, snapshot_time_travel,
    # data_quality_report, gap_fill_minutes, robust_outliers,
    # multi_res_rollup, paned_sliding_window, session_window_native,
    # dedup_embedding_banded, ewma_minutes, seasonal_baseline,
    # negative_sampling, association_rules, cdc_apply,
    # cohort_retention, and — yielded to the eight batch-2 r7 queries
    # — late_sole_suppliers, multimodal_meta, nation_market_share,
    # nation_trade_volume, returned_revenue_customers,
    # revenue_concentration, small_qty_revenue, supplier_part_variety)
    # wait for the r8 rotation so every r7 gate slot lands a hard
    # hash_match row (batches 3-6 took ten more slots:
    # important_parts, join_key_skew_profile, kcore_portable,
    # label_propagation, heavy_hitters_cms, hll_portable_rollup,
    # funnel_analysis, hard_negative_mining, dominant_part_suppliers,
    # embedding_outlier_score also wait for r8) ---
    "bpe_merges",
    "conversion_lag",
    "customer_order_distribution",
    "distribution_drift",
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
