"""Registry-wide cache-leak scan.

Runs every registry query at a toy scale factor and reports which ones
leave state behind after a full materialization:

- ``sql_cache_nonempty`` — a DataFrame ``persist`` still registered in
  the session CacheManager. This is the REAL leak class: the
  ContextCleaner never reclaims CacheManager entries, so a long-lived
  session accumulates them until OOM/GC pressure (r4-r6 ADVICE).
- ``persistent_rdds`` — RDD blocks in the block manager. Checkpoint
  blocks from ``localCheckpoint`` show up here until the Python/JVM
  references drop and the ContextCleaner runs; a nonzero count with an
  EMPTY SQL cache is usually benign (reference-driven reclamation),
  which is why the two signals are reported separately.

Usage::

    python tools/leak_scan.py [sf_dir]    # default /root/testdata/sf0.001

The r6 sweep converted every flagged persist to a reclaimable
localCheckpoint; tests/test_oracle_parity.py::
test_selection_queries_release_their_caches pins one representative
per converted helper. Re-run this scan whenever a round adds queries.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import QUERIES

    jss = spark._jsparkSession
    jsc = spark.sparkContext._jsc
    leaks: dict[str, object] = {}
    for name, fn in sorted(QUERIES.items()):
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 — survey tool, keep scanning
            leaks[name] = f"ERR {e}"[:200]
        else:
            sql_dirty = not jss.sharedState().cacheManager().isEmpty()
            n_rdd = len(jsc.getPersistentRDDs())
            if sql_dirty or n_rdd:
                leaks[name] = {
                    "sql_cache_nonempty": sql_dirty,
                    "persistent_rdds": n_rdd,
                }
        spark.catalog.clearCache()
        for rdd in list(jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    hard = [
        k
        for k, v in leaks.items()
        if isinstance(v, dict) and v["sql_cache_nonempty"]
    ]
    print(json.dumps({"flagged": leaks, "cachemanager_leaks": hard}, indent=1))
    if hard:
        sys.exit(1)


if __name__ == "__main__":
    main()
