"""Streaming trending top-k: the live "what's hot right now" table —
per-window counts ranked to the top-k keys, continuously replacing an
output table a dashboard reads.

Reference behavior generalized: the reference's consumers stream
per-minute aggregates to Mongo for exactly this kind of display
(jobs/spark_mood_tracker.py foreachBatch); this operator adds the
rank-and-replace step as a reusable piece.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trending_topk_stream(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    out_path: str,
    checkpoint: str,
    window: str = "5 minutes",
    k: int = 3,
    **trigger,
):
    """Rank the top-``k`` keys per event-time window and atomically
    replace the output parquet each micro-batch.

    Complete output mode: the windowed count state is the full
    scoreboard, so each batch's foreachBatch sees every window and the
    rank is globally correct (ties broken by key — deterministic).
    State is O(windows × keys) — right for the dashboard-horizon
    cardinalities this serves; for unbounded key spaces switch the agg
    to the count-min-sketch build (operators/sketches.py) and rank its
    estimates instead. Returns the StreamingQuery."""
    counts = stream_df.groupBy(
        F.window(F.col(ts_col), window).alias("win"), F.col(key_col).alias("key")
    ).agg(F.count(F.lit(1)).alias("n"))

    def rank_and_replace(batch: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy("win").orderBy(F.col("n").desc(), F.col("key"))
        (
            batch.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(
                F.col("win.start").alias("window_start"),
                "key",
                "n",
                F.col("rnk").cast("long").alias("rnk"),
            )
            .write.mode("overwrite")
            .parquet(out_path)
        )

    writer = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(rank_and_replace)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
