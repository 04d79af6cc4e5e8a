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

    # streaming throughput: replay the events table through the REAL
    # Structured Streaming mood pipeline (file source → stateful agg →
    # memory sink, availableNow) and report source rows/sec. The
    # reference's consumers process ~1 event/sec/producer; this is the
    # single-node number to beat.
    streaming = {}
    try:
        streaming = _stream_throughput(spark, sf_dir)
    except Exception as e:  # never let the throughput probe kill bench
        streaming = {"error": str(e)[:200]}

    # The driver's round record keeps only the TAIL of this line when it
    # truncates, and "queries" alphabetizes — so repeat the headline
    # (best_sum) and the slowest-10 detail as the LAST keys: any suffix
    # of the line that survives still carries the numbers that matter.
    slowest10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    print(
        json.dumps(
            {
                "metric": "all_queries_best_sum_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "streaming": streaming,
                "n_queries": len(timings),
                "best_sum": total,
                "slowest10": slowest10,
            }
        )
    )


def _stream_throughput(spark, sf_dir: str) -> dict:
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import WEATHER_CODES
    from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import load_table
    from data_engineering_demo_real_time_city_mood_tracker_spark.streaming.mood_pipeline import mood_stream

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    traffic = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("event_time"),
        F.concat(F.lit("int_"), (F.col("user_id") % 4).cast("string")).alias(
            "intersection"
        ),
        F.col("value").alias("speed"),
    )
    k = F.get_json_object("props", "$.k").cast("int")
    weather = ev.filter(F.col("event_type") == "view").select(
        F.col("ts").alias("event_time"),
        F.col("value").alias("temp"),
        F.element_at(
            F.array(*[F.lit(c) for c in WEATHER_CODES]), (k % 22) + 1
        ).alias("weather"),
    )
    news = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("event_time"),
        F.when(F.col("value") < 150, "negative")
        .when(F.col("value") < 300, "neutral")
        .otherwise("positive")
        .alias("sentiment"),
    )
    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        frames = {"traffic": traffic, "weather": weather, "news": news}
        streams = {}
        for name, df in frames.items():
            path = f"{tmp}/{name}"
            df.coalesce(4).write.mode("overwrite").parquet(path)
            streams[name] = spark.readStream.schema(df.schema).parquet(path)
        out = mood_stream(
            streams["traffic"], streams["weather"], streams["news"],
            [f"int_{i}" for i in range(4)],
        )
        qname = f"bench_mood_{uuid.uuid4().hex[:8]}"
        t0 = time.time()
        q = (
            out.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        wall = time.time() - t0
        n_out = spark.table(qname).count()
        return {
            "pipeline": "mood_stream availableNow, file source -> memory sink",
            "source_rows": n_events,
            "output_rows": n_out,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(n_events / wall, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
