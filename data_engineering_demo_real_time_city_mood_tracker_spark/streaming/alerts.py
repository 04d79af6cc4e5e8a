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


def cusum_alert_stream(
    counts: DataFrame,
    key_col: str,
    ts_col: str,
    x_col: str,
    target: int,
    k: int,
    h: int,
    key_type: str = "string",
) -> DataFrame:
    """Per-key streaming CUSUM drift monitor — the live twin of the
    batch ``cusum_alerts`` query: arriving per-interval counts update
    the classic Page recursion s = max(0, s + x - target - k) and emit
    each interval's statistic with an ``is_alert`` flag at threshold
    ``h``. ``target``/``k``/``h`` are integers learned offline from
    history (the batch-trained -> stream-serve pattern the scoring
    streams use).

    State is ONE BIGINT per key forever (the open CUSUM value) — a
    genuine state machine, so this rides
    ``applyInPandasWithState``; inside a micro-batch the recursion is
    vectorized with the exact prefix identity s_i = P_i - min_{j<=i}
    P_j over P = [0, s0, s0 + cumsum(w)] (the same identity the batch
    query uses in SQL windows), all int64 numpy — the streamed
    statistic is BITWISE the batch one on ordered replays (parity
    test-asserted across micro-batch splits).

    Ordering caveat: CUSUM is sequential, so rows must arrive per-key
    time-ordered ACROSS micro-batches (in-batch disorder is sorted
    away). Feed it from a watermarked upstream minute aggregation or
    an ordered replay; unordered raw events need the batch query."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{key_col} {key_type}, {ts_col} timestamp, "
        f"{x_col} long, cusum long, is_alert boolean"
    )

    def step(key, pdf_iter, state: GroupState):
        pdf = pd.concat(list(pdf_iter)).sort_values(ts_col)
        if not len(pdf):
            return
        w = pdf[x_col].to_numpy(dtype="int64") - target - k
        s0 = state.get[0] if state.exists else 0
        p = np.concatenate((np.array([0, s0], dtype="int64"), s0 + np.cumsum(w)))
        s = (p - np.minimum.accumulate(p))[2:]
        state.update((int(s[-1]),))
        yield pd.DataFrame(
            {
                key_col: np.full(len(s), key[0]),
                ts_col: pdf[ts_col].to_numpy(),
                x_col: pdf[x_col].to_numpy(dtype="int64"),
                "cusum": s,
                "is_alert": s >= h,
            }
        )

    return counts.groupBy(key_col).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType="s long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
