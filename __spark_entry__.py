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
    # --- the r4 driver red: quantile_sketch crashed the canonicalizer
    # on its array<double> column (its ONLY-ever gate appearance);
    # now emits p50/p95/p99 scalars — needs its first spark_rows row ---
    "quantile_sketch",
    # --- new r5 queries: domain capping, leakage-safe group split,
    # vocab sizing, CCNet perplexity terciles, LESS-style
    # gradient-matching selection — first driver rows ---
    "domain_cap_sample",
    "group_holdout_split",
    "vocab_coverage",
    "ccnet_buckets",
    "grad_match_select",
    "corpus_diff",
    "embedding_dim_stats",
    # --- r5 changed-plan guards: every query whose physical plan
    # changed this round (BIGINT gopher fold, cache-release refactor,
    # linear dedup reassembly, fold-exact numpy Lloyd rounds, text-index
    # stats guard) — the oracle row is the bitwise proof the
    # optimization changed nothing ---
    "gopher_rules",
    "bigram_lm_score",
    "dsir_sample",
    "moore_lewis_select",
    "quality_classifier",
    "kcenter_coreset",
    "filter_funnel_report",
    "token_budget_mixture",
    "bm25_index_probe",
    "exact_substring_dedup",
    "paragraph_dedup",
    "boilerplate_removal",
    "ivfpq_index_probe",
    "kmeans_embeddings",
    "pq_ann_topk",
    "embedding_ann_ivf_trained",
    "semantic_dedup",
    "embedding_ann_ivf",
    "ann_recall_eval",
    # --- stale-cohort rotation (VERDICT r4 item 5): r1-era greens not
    # re-graded since round 1 — oldest first ---
    "events_cube",
    "grouping_sets_mixed",
    "events_unpivot",
    "above_avg_orders",
    "percentile_stats",
    "set_ops_users",
    "full_outer_minutes",
    "skew_salted_join",
    "dim_upsert",
    "json_ingest",
    "min_cost_supplier",
    "promo_revenue_share",
    "top_supplier",
    "disjunctive_filter",
    "idle_rich_customers",
    "supplier_nation_profit",
    "asof_join",
    "interval_join",
    "sessionization",
    "weather_transition",
    "scd2_intervals",
    "value_histogram",
    "user_running_total",
    # (moving_avg_range / ts_pattern_topk / event_type_pivot / window_distribution / distinct_counts /
    # approx_distinct_hll yielded their slots to the five new r5
    # queries — next round's stale rotation leads with them)
    # new r5 queries are appended here as they land; remaining gate
    # slots fall through to registry order
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
