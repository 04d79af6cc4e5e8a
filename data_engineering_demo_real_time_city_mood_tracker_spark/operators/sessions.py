"""Gap-based sessionization — the classic event-stream operator the
reference's minute buckets approximate (ref spark_mood_tracker.py
groups fixed minutes; sessions generalize to activity-gap windows).

Single shuffle on the user key; two window passes over the same sorted
partition (lag → flag, running sum → session id) that Spark executes in
one physical sort. State per key is O(1) — scales to any number of
events per user. The streaming twin (applyInPandasWithState) lives in
streaming/stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    gap_sec: int = 1800,
) -> DataFrame:
    """Assign a per-user session id: a new session starts when the gap
    to the previous event exceeds ``gap_sec``. Deterministic ordering:
    (ts, id)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    prev_ts = F.lag(F.col(ts_col)).over(w)
    is_new = (
        prev_ts.isNull()
        | ((F.col(ts_col).cast("double") - prev_ts.cast("double")) > gap_sec)
    ).cast("long")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(is_new).over(run))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    gap_sec: int = 1800,
) -> DataFrame:
    """(user, session_id) → start/end/n_events/duration_sec."""
    s = sessionize(df, user_col, ts_col, id_col, gap_sec)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col(ts_col).cast("double")) - F.min(F.col(ts_col).cast("double"))).alias(
            "duration_sec"
        ),
    )
