"""Stress: mood_stream (fan-out) vs mood_stream_highcard
(aggregate-then-join) at 10^4 intersection keys — the r2 verdict item 8
measurement.

The claim under test (streaming/mood_pipeline.py docstrings): fan-out
replicates every weather/news row across the key set before the single
stateful agg, so its state is O(windows × keys) and its unioned input
is |meta rows| × |keys|; the highcard variant keeps weather/news state
at O(windows) and joins their one-row-per-minute aggregates onto the
keyed traffic agg. With sparse traffic (100 active keys/minute out of
10^4) the fan-out variant's state should be ~|keys|/|active keys| ≈
100× larger.

Prints ONE JSON line with per-variant {union_input_rows,
state_rows_total, output_rows, wall_sec} from the progress listener
(streaming/monitor.py state-operator metrics).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_demo_real_time_city_mood_tracker_spark.session import get_spark
from data_engineering_demo_real_time_city_mood_tracker_spark.streaming.monitor import attach_recorder
from data_engineering_demo_real_time_city_mood_tracker_spark.streaming.mood_pipeline import (
    mood_stream,
    mood_stream_highcard,
)

N_KEYS = 10_000
ACTIVE_PER_MIN = 100
N_MINUTES = 10
TRAFFIC_PER_MIN = 1_000
META_PER_MIN = 60  # weather/news rows per minute (1 Hz, like the ref)


def _inputs(spark, tmp):
    t0 = "2025-01-01 10:00:00"
    base = F.to_timestamp(F.lit(t0))
    traffic = (
        spark.range(N_MINUTES * TRAFFIC_PER_MIN)
        .select(
            (base + F.make_interval(secs=(F.col("id") / TRAFFIC_PER_MIN * 60))).alias(
                "event_time"
            ),
            # 100 active keys per minute, rotating so all 10^4 exist
            F.concat(
                F.lit("int_"),
                (
                    (F.col("id") % ACTIVE_PER_MIN)
                    + (F.col("id") / TRAFFIC_PER_MIN).cast("long") * ACTIVE_PER_MIN
                ).cast("string"),
            ).alias("intersection"),
            (F.pmod(F.col("id") * 37, 90) + F.lit(5.0)).alias("speed"),
        )
    )
    meta_n = N_MINUTES * META_PER_MIN
    weather = spark.range(meta_n).select(
        (base + F.make_interval(secs=F.col("id"))).alias("event_time"),
        (F.pmod(F.col("id") * 13, 35).cast("double")).alias("temp"),
        F.when(F.col("id") % 3 == 0, "clear").otherwise("rain").alias("weather"),
    )
    news = spark.range(meta_n).select(
        (base + F.make_interval(secs=F.col("id"))).alias("event_time"),
        F.when(F.col("id") % 5 == 0, "negative")
        .when(F.col("id") % 5 == 1, "positive")
        .otherwise("neutral")
        .alias("sentiment"),
    )
    paths = {}
    for name, df in (("traffic", traffic), ("weather", weather), ("news", news)):
        p = f"{tmp}/{name}"
        df.coalesce(4).write.mode("overwrite").parquet(p)
        paths[name] = (p, df.schema)
    return paths


def _run(spark, paths, variant: str, keys: list[str]) -> dict:
    rec = attach_recorder(spark)
    streams = {
        n: spark.readStream.schema(schema).parquet(p)
        for n, (p, schema) in paths.items()
    }
    if variant == "fanout":
        out = mood_stream(streams["traffic"], streams["weather"], streams["news"], keys)
        mode = "complete"
    else:
        out = mood_stream_highcard(
            streams["traffic"], streams["weather"], streams["news"]
        )
        mode = "append"
    qname = f"hc_{variant}_{uuid.uuid4().hex[:8]}"
    t0 = time.time()
    q = (
        out.writeStream.outputMode(mode)
        .format("memory")
        .queryName(qname)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    wall = time.time() - t0
    time.sleep(1)  # let the listener bus drain the final progress event
    rows = [r for r in rec.progress if r.get("name") == qname]
    spark.streams.removeListener(rec)
    return {
        "union_input_rows": sum(r.get("num_input_rows", 0) for r in rows),
        "state_rows_total": max(
            (r.get("state_rows_total", 0) for r in rows), default=0
        ),
        "output_rows": spark.table(qname).count(),
        "wall_sec": round(wall, 2),
    }


def main() -> None:
    spark = get_spark("stress_highcard")
    spark.sparkContext.setLogLevel("ERROR")
    keys = [f"int_{i}" for i in range(N_KEYS)]
    tmp = tempfile.mkdtemp(prefix="hc_stress_")
    try:
        paths = _inputs(spark, tmp)
        res = {
            "n_keys": N_KEYS,
            "active_keys_per_min": ACTIVE_PER_MIN,
            "n_minutes": N_MINUTES,
            "highcard": _run(spark, paths, "highcard", keys),
            "fanout": _run(spark, paths, "fanout", keys),
        }
        res["state_ratio_fanout_over_highcard"] = round(
            res["fanout"]["state_rows_total"]
            / max(1, res["highcard"]["state_rows_total"]),
            1,
        )
        print(json.dumps(res))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
