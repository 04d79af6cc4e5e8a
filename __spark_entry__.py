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


# The driver's CORRECTNESS gate caps at ~50 rows per round. Rounds
# 1+2 hard-graded 99 distinct queries; _FRONT holds the never-graded
# entries (VERDICT r2 "Next round" item 1) plus every round-3
# addition. Oracle-backed entries sort first within this list (see
# _ordered), then the rows-only tail — exactly 50 entries, 47 of them
# hard-signal after the late-r3 oracle conversions. Previously-green
# rows stay out of the front block on purpose; the rows-only ops whose
# signal is carried elsewhere yield their slots (see the tail comment).
_FRONT = [
    # --- oracle-backed, never driver-graded in r1+r2 ---
    # OLAP shapes added after round 1
    "late_sole_suppliers",
    "revenue_concentration",
    "nation_trade_volume",
    "nation_market_share",
    "multi_res_rollup",
    "priority_linestatus",
    "customer_order_distribution",
    "small_qty_revenue",
    "returned_revenue_customers",
    "important_parts",
    "supplier_part_variety",
    "dominant_part_suppliers",
    # event analytics
    "funnel_analysis",
    "cohort_retention",
    "cdc_apply",
    "session_window_native",
    "robust_outliers",
    "association_rules",
    "conversion_lag",
    "seasonal_baseline",
    "gap_fill_minutes",
    "join_key_skew_profile",
    "paned_sliding_window",
    # data quality / sketch / sampling / multimodal
    "data_quality_report",
    "distribution_drift",
    "heavy_hitters_cms",
    "multimodal_meta",
    "negative_sampling",
    "shard_export",
    # new in round 3 (oracle-backed; LPA + k-means also moved to
    # oracle-backed this round — _ordered resolves via ORACLES)
    "dedup_embedding_banded",
    "embedding_outlier_score",
    "hll_portable_rollup",
    "boilerplate_removal",
    "exact_quantiles",
    "pagerank_portable",
    "hard_negative_mining",
    "ewma_minutes",
    "kcore_portable",
    "snapshot_time_travel",
    # --- rows-only or converted-late; _ordered sorts by ORACLES ---
    "label_propagation",
    "binary_ingest",
    "embedding_ann_ivf_trained",
    "kmeans_embeddings",
    "semantic_dedup",
    "image_dedup_dhash",
    "ivfpq_index_probe",
    "bpe_encode",
    "pq_ann_topk",
    "bpe_merges",
    "pagerank_topk",
    # dedup_simhash, hll_merge_rollup, multimodal_frames, quantile_sketch
    # and kcore_decomposition deliberately NOT front-loaded: the 50-row
    # cap can't fit every never-graded entry, and these are the
    # rows-only ops whose signal is carried elsewhere (bitwise twins
    # simhash_portable / hll_portable_rollup / exact_quantiles /
    # kcore_portable; multimodal_meta's oracle row + binary_ingest's
    # runs row for the same plumbing) — a rows-only row only proves
    # "runs", so the slots go to oracle-backed entries; all still
    # follow in registry order after the front block
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
