"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Queries are materialized with the noop sink so the full plan executes
JVM-side (no driver collect overhead in the timing).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import QUERIES
from data_engineering_demo_real_time_city_mood_tracker_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen path and every table's file listing once so
    # per-query numbers reflect steady-state execution, not startup.
    from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import load_table

    for t in ("events", "documents", "embeddings", "lineitem", "orders", "customer"):
        load_table(spark, sf_dir, t).count()
    QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    # spawn the Arrow Python worker pool once (mapInPandas/pandas-UDF
    # queries otherwise pay ~10 s of one-time worker startup).
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # Each query runs REPEAT times and reports the MIN: host-level
    # contention on shared VMs sweeps through in multi-minute phases
    # and can inflate a single timing 5-8×; the min of two spaced runs
    # is the steady-state number the plan actually earns. The headline
    # value is the sum of per-query minima (not wall clock, which
    # would double-count the repeats).
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    timings: dict[str, float] = {}
    for _ in range(repeat):
        for name in sorted(QUERIES):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            # queries that persist intermediates (dedup candidate tables)
            # must not tax later queries' timings with their cached blocks
            spark.catalog.clearCache()
            # localCheckpoint RDDs (iterative operators) bypass the SQL
            # cache manager; unpersist them too or they pile up in the
            # block manager and tax later queries with GC pressure.
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist()
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "all_queries_best_sum_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
