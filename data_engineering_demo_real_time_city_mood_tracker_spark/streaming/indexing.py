"""Streaming maintenance of the persistent inverted index
(operators/retrieval.py): a document stream becomes searchable one
micro-batch segment at a time.

Replay safety needs NO commit log here, unlike the document sink: a
segment's name derives from the batch id, both index writes use
dynamic partition overwrite, and the segment's stats sidecar lands last as
its commit record — so a replayed batch rewrites exactly its own
segment in place, probes never see a torn segment, and duplicated
postings are structurally impossible. This is the same
idempotent-by-layout posture as the per-crawl append path, driven by
Structured Streaming's batch ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def text_index_ingest_stream(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    index_path: str,
    checkpoint: str,
    n_buckets: int = 64,
    **trigger,
):
    """Ingest a document stream into the persistent inverted index:
    each micro-batch appends as its own segment (``seg=batch-<id>``).
    Docs are queryable (query_text_index) as soon as their segment's
    stats sidecar lands; corpus stats (df / N / avgdl) stay exact because
    segments are mergeable partials. Returns the StreamingQuery."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators import retrieval

    def ingest(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        retrieval.append_text_index(
            batch,
            text_col,
            id_col,
            index_path,
            segment=f"batch-{batch_id}",
            n_buckets=n_buckets,
        )

    writer = stream_df.writeStream.foreachBatch(ingest).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
