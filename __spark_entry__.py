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
    # --- new r9 queries (first driver rows): Kaplan–Meier survival,
    # Benjamini–Hochberg FDR over the permutation-null test family,
    # seasonal-naive rolling-origin backtest, HLL registers as join
    # payloads, and decision-stump Gini split scoring ---
    "kaplan_meier",
    "log_rank",
    "bh_fdr",
    "seasonal_backtest",
    "hll_sketch_join",
    "best_split_gini",
    # --- r9 re-planned / re-derived queries (fresh hash rows):
    # pagerank_topk moved from float rows-only to fixed-point
    # oracle-backed (VERDICT r8 item 4); dedup_threshold_sweep's
    # oracle casts fixed (the one red r8 row); ivf_nprobe_recall's
    # recall denominator re-derived from the query set (r8 ADVICE);
    # plus the four whose r8 plan changes rode stale grades
    # (VERDICT r8 item 2) ---
    "pagerank_topk",
    "dedup_threshold_sweep",
    "ivf_nprobe_recall",
    "linkpred_topk",
    "triangle_count",
    "clustering_coefficient",
    "degree_assortativity",
    # the exact-set-similarity family's shingle front end was
    # re-planned in r9 (array frame materialized before the explode —
    # ~2.7× family speedup, values unchanged): fresh rows for all
    # three plan-changed consumers (threshold_sweep already above)
    "dedup_ngram_topk",
    "dedup_containment",
    "dedup_prefix_filter",
    # --- the full r4 stale cohort (VERDICT r8 item 2): every query
    # whose latest driver grade is round 4 — after this rotation
    # nothing on the board is older than r5. _ordered pushes the
    # rows-only members (dedup_simhash, hll_merge_rollup,
    # kcore_decomposition) behind the hash-backed block ---
    "audio_dedup_energy",
    "big_orders",
    "bpe_encode",
    "brand_revenue",
    "daily_summary",
    "dedup_simhash",
    "embedding_sq8_topk",
    "exact_quantiles",
    "hll_merge_rollup",
    "image_dedup_dhash",
    "kcore_decomposition",
    "minute_agg_traffic",
    "minute_agg_weather",
    "mood_distribution",
    "mood_pipeline",
    "mood_rollup",
    "multimodal_frames",
    "news_sentiment",
    "order_priority",
    "orders_no_lineitem",
    "pagerank_portable",
    "pricing_summary",
    "priority_linestatus",
    "quality_filter",
    "regional_revenue",
    "revenue_filter",
    "rp_rerank_topk",
    "shipping_priority",
    "sliding_window_events",
    "tokenizer_fertility",
    "top_customers",
    "traffic_scoring",
    "ts_analog_topk",
    "window_rank",
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
