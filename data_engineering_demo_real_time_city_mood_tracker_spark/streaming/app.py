"""End-to-end streaming application: the reference's docker-compose
stack (3 producers → Kafka topics → Spark job → Mongo;
docker-compose.yml + jobs/spark_mood_tracker.py:100-126) as one
self-contained, offline-runnable Spark program:

    deterministic producers → JSON lines (Kafka stand-in)
        → parse_* consumers → mood pipeline
            → parquet sink (analytic/scale path)
            → document sink (operational path; JSONL writer factory
              standing in for the injected Mongo factory)

Every piece is the production component — the producer projections,
the JSON wire format, the consumer parsers, the pipeline, the sinks —
only the transport is swapped: Kafka topics become file-stream
directories of JSON lines. On a cluster, point ``kafka_stream`` at the
brokers and pass ``mongo_writer_factory``; no pipeline code changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_engineering_demo_real_time_city_mood_tracker_spark.streaming.mood_pipeline import mood_stream
from data_engineering_demo_real_time_city_mood_tracker_spark.streaming.producers import (
    INTERSECTIONS,
    batch_source,
    news_events,
    traffic_events,
    weather_events,
)
from data_engineering_demo_real_time_city_mood_tracker_spark.streaming.sinks import (
    document_sink,
    jsonl_writer_factory,
    start_parquet_sink,
)
from data_engineering_demo_real_time_city_mood_tracker_spark.streaming.sources import (
    parse_news,
    parse_traffic,
    parse_weather,
)


def _produce_topic(events, path: str) -> None:
    """Producer side: serialize the frame to JSON lines in ``path`` —
    the offline stand-in for a Kafka topic (same payloads the
    reference's KafkaProducer serializer emits)."""
    events.select(
        F.to_json(F.struct(*[F.col(c) for c in events.columns])).alias("value")
    ).write.mode("overwrite").text(path)


def run_mood_demo(
    spark: SparkSession,
    out_dir: str,
    n_events: int = 600,
    start_ts: str = "2025-01-01 10:00:00",
    timeout_sec: int = 300,
) -> dict:
    """Produce ``n_events`` deterministic events per stream, replay
    them through the consumer parsers and the mood pipeline as a real
    streaming query (availableNow), and fan the result into both
    sinks. Returns row counts + paths.

    Deterministic end to end (hash-derived producers, min-based
    aggregates), so repeated runs produce identical output — the
    property the integration test asserts.
    """
    src = batch_source(spark, n_events, start_ts)
    topics = {
        "traffic": traffic_events(src),
        "weather": weather_events(src),
        "news": news_events(src),
    }
    for name, events in topics.items():
        _produce_topic(events, f"{out_dir}/topics/{name}")

    parse = {"traffic": parse_traffic, "weather": parse_weather, "news": parse_news}
    typed = {
        name: parse[name](spark.readStream.text(f"{out_dir}/topics/{name}"))
        for name in topics
    }
    mood = mood_stream(
        typed["traffic"], typed["weather"], typed["news"], INTERSECTIONS
    )

    parquet_path = f"{out_dir}/out/mood_parquet"
    docs_path = f"{out_dir}/out/mood_docs"
    os.makedirs(docs_path, exist_ok=True)
    # checkpoints are DETERMINISTIC under out_dir: re-running with the
    # same out_dir resumes from committed offsets (exactly-once, no
    # duplicated windows in the append sinks) instead of replaying
    # everything under a fresh checkpoint. The document sink's commit
    # log lives beside its checkpoint — the two must share a lifetime
    # (a cleared checkpoint restarts batch ids at 0, which a surviving
    # commit log would wrongly mark as delivered).
    q1 = start_parquet_sink(
        mood, parquet_path, f"{out_dir}/chk/parquet", availableNow=True
    )
    q2 = (
        mood.writeStream.foreachBatch(
            document_sink(
                jsonl_writer_factory(docs_path),
                commit_log_dir=f"{out_dir}/chk/docs_commits",
            )
        )
        .option("checkpointLocation", f"{out_dir}/chk/docs")
        .trigger(availableNow=True)
        .start()
    )
    for q in (q1, q2):
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"streaming query {q.name or q.id} exceeded {timeout_sec}s"
            )

    n_parquet = spark.read.parquet(parquet_path).count()
    return {
        "n_mood_rows": n_parquet,
        "parquet_path": parquet_path,
        "docs_path": docs_path,
    }
