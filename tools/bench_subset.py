"""Bench a subset of registry queries with bench.py's protocol (same
session config, warm-up, noop sink, min-of-N) and print one JSON line
{name: min_sec}. Usage:

    python tools/bench_subset.py q1 q2 ...   # env: SPARK_GRAFT_SF_DIR,
                                             # SPARK_GRAFT_BENCH_REPEAT
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_demo_real_time_city_mood_tracker_spark.session import get_spark  # noqa: E402
from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import QUERIES  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import load_table

    for t in ("events", "documents", "embeddings", "lineitem", "orders", "customer"):
        load_table(spark, sf_dir, t).count()
    QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "2"))
    timings: dict[str, float] = {}
    for _ in range(repeat):
        for name in names:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            spark.catalog.clearCache()
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist()
    print(json.dumps(timings, sort_keys=True))


if __name__ == "__main__":
    main()
