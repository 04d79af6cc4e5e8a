"""Streaming anomaly alerts against a learned seasonal profile — the
live twin of the batch ``seasonal_baseline`` query: the profile
(bounded: |keys| × 24 rows) is learned offline, broadcast into the
stream, and every event is scored map-only as it arrives. No state, no
watermark needed — the enrichment is stateless, so append mode emits
each alert exactly once per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def seasonal_alert_stream(
    stream_df: DataFrame,
    profile_df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    threshold: float,
) -> DataFrame:
    """Events deviating more than ``threshold`` from their (key,
    hour-of-day) expected value — OR arriving for a (key, hour) slot
    the profile has never seen, which is itself the strongest anomaly
    signal (a brand-new event type must alert, not vanish). The
    ``reason`` column says which ('deviation' / 'no_profile');
    ``deviation``/``expected`` are null on the no-profile path.

    ``profile_df`` must carry (key_col, hod, expected) — build it with
    the seasonal_baseline aggregation over history. Returns a
    streaming frame ready for any append-mode sink; map-only per
    micro-batch (broadcast hash LEFT join — an inner join here would
    structurally hide unseen keys — no shuffle, no state)."""
    return (
        stream_df.withColumn("hod", F.hour(F.col(ts_col)))
        .join(F.broadcast(profile_df), [key_col, "hod"], "left")
        .withColumn("deviation", F.col(value_col) - F.col("expected"))
        .filter(
            F.col("expected").isNull()
            | (F.abs(F.col("deviation")) > threshold)
        )
        .withColumn(
            "reason",
            F.when(F.col("expected").isNull(), "no_profile").otherwise(
                "deviation"
            ),
        )
    )
