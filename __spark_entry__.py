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
    # --- r8 re-planned queries (fresh hash rows for the new plans):
    # the two ex-NTILE global-sort queries now scored map-only
    # against ntile_boundary_values literals, and acf_lag's
    # degenerate-grid n_pairs>0 guard ---
    "feature_binning",
    "rfm_segmentation",
    "acf_lag",
    # --- new r8 queries (first driver rows): weighted bipartite
    # projection, per-day drift timeline, the IVF recall-vs-nprobe
    # curve, and isotonic (PAVA minimax) calibration ---
    "bipartite_projection",
    "drift_timeline",
    "ivf_nprobe_recall",
    "isotonic_calibration",
    # --- r8 second batch (first driver rows): smoothed target
    # encoding, dyadic half-life LTV, Welch parametric A/B, Hamilton
    # apportionment, dedup threshold knob curve ---
    "target_encoding",
    "time_decay_ltv",
    "welch_ttest",
    "sample_allocation",
    "dedup_threshold_sweep",
    # linkpred_topk's adaptive cap provably keeps sf0.01 rows
    # identical to its green r7 grade (cap >= max degree there), so
    # it yields its gate slot to the new queries and rotates in r9
    # --- r8 third batch (first driver rows): split-conformal
    # calibration thresholds and winsorized robust moments ---
    "conformal_thresholds",
    "winsorize_stats",
    "decile_lift",
    # --- the full ≤r3 stale cohort (VERDICT r7 item 2): every query
    # whose latest driver grade is round 3 — oracle-backed ones give
    # hard hash rows; _ordered pushes the two rows-only members
    # (binary_ingest, pagerank_topk) behind the hash-backed block ---
    "association_rules",
    "binary_ingest",
    "cdc_apply",
    "cohort_retention",
    "data_quality_report",
    "dedup_embedding_banded",
    "dominant_part_suppliers",
    "embedding_outlier_score",
    "ewma_minutes",
    "funnel_analysis",
    "gap_fill_minutes",
    "hard_negative_mining",
    "heavy_hitters_cms",
    "hll_portable_rollup",
    "important_parts",
    "join_key_skew_profile",
    "kcore_portable",
    "label_propagation",
    "late_sole_suppliers",
    "multi_res_rollup",
    "multimodal_meta",
    "nation_market_share",
    "nation_trade_volume",
    "negative_sampling",
    "pagerank_topk",
    "paned_sliding_window",
    "returned_revenue_customers",
    "revenue_concentration",
    "robust_outliers",
    "seasonal_baseline",
    "session_window_native",
    "shard_export",
    "small_qty_revenue",
    "snapshot_time_travel",
    "supplier_part_variety",
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
