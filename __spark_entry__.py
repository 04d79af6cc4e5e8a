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
    # --- r3 driver reds, fixed this round; need a green r4 row ---
    "pagerank_portable",  # oracle rank_fp now CAST AS BIGINT (HUGEINT artifact)
    "bpe_encode",  # sample column stringified (driver canon can't hash lists)
    "priority_linestatus",  # shipdate slice moved into 1995 data (was vacuous 0-row)
    # --- the 6 queries never driver-graded in any round (VERDICT r3
    # item 4) — rows-only by design; their hash signal rides in-gate
    # twins (simhash_portable / hll_portable_rollup / exact_quantiles /
    # kcore_portable / multimodal_meta), this rotation closes the
    # "every registry query has >=1 driver row ever" loop ---
    "audio_dedup_energy",
    "dedup_simhash",
    "hll_merge_rollup",
    "kcore_decomposition",
    "multimodal_frames",
    "quantile_sketch",
    # --- perf-guard re-grades: queries whose plans change this round
    # (trainer-round fusion, broadcast removal) — the oracle row is the
    # bitwise guard that the optimization changed nothing ---
    "ivfpq_index_probe",
    "bm25_index_probe",
    "embedding_ann_ivf_trained",
    "exact_quantiles",
    "kmeans_embeddings",
    "pq_ann_topk",
    # --- newly oracle-backed in r4: the binary-decode stretch item —
    # needs its first HASH row (r3's row was rows-only) ---
    "image_dedup_dhash",
    # --- new r4 queries: corpus LM scoring / importance resampling /
    # curation observability ---
    "bigram_lm_score",
    "dsir_sample",
    "filter_funnel_report",
    "token_budget_mixture",
    "quality_classifier",
    "kcenter_coreset",
    "moore_lewis_select",
    "ts_analog_topk",
    "embedding_sq8_topk",
    "paragraph_dedup",
    "rp_rerank_topk",
    "exact_substring_dedup",
    "tokenizer_fertility",
    "gopher_rules",
    # new r4 queries are appended here as they land; remaining gate
    # slots fall through to registry order (long-green r1 rows —
    # harmless repeat confirmations)
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
