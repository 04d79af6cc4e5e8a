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
    """Rank the top-``k`` keys per event-time window and replace the
    output parquet each micro-batch via a STAGED SWAP (write to a tmp
    dir, two renames — same discipline as sources/maintenance.py's
    compaction): a plain ``mode("overwrite")`` is delete-then-write,
    so a dashboard polling between the delete and the new commit would
    read a missing or partial table every batch; the swap shrinks that
    window to two directory renames. (On an object store, flip a
    manifest/catalog pointer instead — renames aren't atomic there.)

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
        import os
        import shutil

        w = Window.partitionBy("win").orderBy(F.col("n").desc(), F.col("key"))
        tmp = f"{out_path}__trend_tmp"
        old = f"{out_path}__trend_old"
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
            .parquet(tmp)
        )
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(out_path):
            os.rename(out_path, old)
        os.rename(tmp, out_path)
        shutil.rmtree(old, ignore_errors=True)

    writer = (
        counts.writeStream.outputMode("complete")
        .foreachBatch(rank_and_replace)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
