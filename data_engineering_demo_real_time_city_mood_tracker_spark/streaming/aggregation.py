"""Streaming materialized-aggregate maintenance: the live twin of
``plans/pipelines.py:merge_agg_partials`` — each micro-batch collapses
to per-key mergeable partials and merges into a standing base table,
so the aggregate stays fresh without a stateful streaming agg holding
every key in executor memory forever. The state IS the base table:
unbounded key cardinality costs parquet, not state store.

Exactness discipline: sums are carried as DECIMAL columns end-to-end
(decimal + decimal is exact and associative), so after any number of
micro-batch merges the base is bitwise-equal to a from-scratch batch
aggregation over the same rows — averages derive from the moments at
read time. Replay safety: merging a batch twice would double-count, so
each committed batch id leaves a marker in a commit log (same contract
as sinks.document_sink); a checkpoint-replayed batch is skipped.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_agg_stream(
    stream_df: DataFrame,
    keys: list[str],
    value_col: str,
    base_path: str,
    checkpoint: str,
    commit_log_dir: str,
    count_col: str = "n",
    sum_col: str = "value_sum",
    scale: int = 6,
    **trigger,
):
    """Maintain a per-``keys`` (count, exact-decimal sum) base table
    under ``base_path`` from a document/event stream.

    Per micro-batch: one delta agg (∝ batch size), one merge re-agg
    (∝ touched keys + base keys — never raw history), one staged-swap
    write (readers always see a complete base). Returns the
    StreamingQuery."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.plans.pipelines import merge_agg_partials

    os.makedirs(commit_log_dir, exist_ok=True)

    def step(batch: DataFrame, batch_id: int) -> None:
        import shutil

        marker = os.path.join(commit_log_dir, f"batch-{batch_id}.committed")
        if os.path.exists(marker) or batch.isEmpty():
            return
        spark = batch.sparkSession
        delta = batch.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias(count_col),
            F.sum(F.col(value_col).cast(f"decimal(18,{scale})")).alias(sum_col),
        )
        if os.path.exists(base_path):
            base = spark.read.parquet(base_path)
            merged = merge_agg_partials(
                base, delta, keys, count_col=count_col, sum_cols=(sum_col,)
            )
        else:
            merged = delta
        tmp = f"{base_path}__agg_tmp"
        old = f"{base_path}__agg_old"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(base_path):
            os.rename(base_path, old)
        os.rename(tmp, base_path)
        shutil.rmtree(old, ignore_errors=True)
        open(marker, "w").close()

    writer = stream_df.writeStream.foreachBatch(step).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
