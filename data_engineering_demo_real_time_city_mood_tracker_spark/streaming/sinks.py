"""Streaming sinks.

``document_sink`` is the reference's foreachBatch→Mongo pattern
(jobs/spark_mood_tracker.py:115-126) with the client injected, so it
is testable without a Mongo server and swappable for any document
store. The real-Mongo factory is import-gated.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def document_sink(
    insert_many: Callable[[list[dict]], None],
    drop_nulls: bool = True,
):
    """Build a foreachBatch function that converts each micro-batch to
    dict records and hands them to ``insert_many``.

    NOTE the scale posture: the reference funnels every batch through
    ``toPandas`` on the driver. That is kept ONLY for the document-
    store sink (which is inherently driver-ish without a connector);
    analytic outputs should use parquet_sink below instead.
    """

    def write_batch(df: DataFrame, batch_id: int) -> None:
        batch = df.na.drop() if drop_nulls else df
        records = [row.asDict() for row in batch.collect()]
        if records:
            insert_many(records)

    return write_batch


def mongo_insert_many(
    uri: str = "mongodb://mongo:27017/",
    database: str = "city_mood",
    collection: str = "mood_events",
) -> Callable[[list[dict]], None]:
    """Mongo-backed insert_many (gated: pymongo not in this container)."""
    try:
        from pymongo import MongoClient
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("pymongo not available in this environment") from exc

    def insert(records: list[dict]) -> None:
        client = MongoClient(uri)
        try:
            client[database][collection].insert_many(records)
        finally:
            client.close()

    return insert


def start_parquet_sink(df: DataFrame, path: str, checkpoint: str, **trigger):
    """Distributed file sink — the scale path for analytic outputs."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(**trigger)
        .start()
    )
