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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for ops whose
    hashing is not oracle-portable — e.g. xxhash64 simhash)."""
    return dict(ORACLES)
