"""Temporal / window operators: sliding windows, per-key top-k,
as-of join.

The as-of join is the Spark-lacks-it operator implemented as a
composition of built-ins: union both sides, single window pass with
``last(..., ignoreNulls=True)`` carry-forward — one shuffle on the key,
no range-explode, state bounded per key. (DuckDB expresses the same
thing natively as ASOF JOIN, which is the oracle.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    window_dur: str = "5 minutes",
    slide: str = "1 minute",
) -> DataFrame:
    """Built-in F.window sliding aggregation (count + exact-decimal avg)."""
    return (
        df.groupBy(F.window(F.col(ts_col), window_dur, slide).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
                / F.count(value_col)
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "avg_value",
        )
    )


def topk_per_key(
    df: DataFrame, key_col: str, order_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """row_number top-k per key, deterministic tie-break on id."""
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).desc(), F.col(id_col).asc())
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(key_col, id_col, order_col, "rnk")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    lookback_sec: int,
    right_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Range join: each left row matched to right rows on the same key
    with right.ts ∈ (left.ts - lookback, left.ts].

    Spark has no native range join; the naive theta-join degenerates to
    per-key nested loops over unbounded row spans. Here both sides are
    banded into lookback-wide time buckets; the right side replicates
    into its bucket and the next (a bounded 2× fan-out), so the join is
    a pure equi-join on (key, bucket) with a residual range filter —
    shuffle volume stays linear in input size.
    """
    bucket = lambda c: F.floor(c.cast("double") / lookback_sec)  # noqa: E731
    l = left.withColumn("_b", bucket(F.col(ts_col)))
    r = right.select(
        F.col(key_col).alias("_rkey"),
        F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    ).withColumn("_b", F.explode(F.array(bucket(F.col("_rts")), bucket(F.col("_rts")) + 1)))
    cond = (
        (F.col(key_col) == F.col("_rkey"))
        & (l["_b"] == r["_b"])
        & (F.col("_rts") > F.col(ts_col) - F.expr(f"INTERVAL {lookback_sec} SECOND"))
        & (F.col("_rts") <= F.col(ts_col))
    )
    out = l.join(r, cond, how)
    return out.drop("_b", "_rkey").withColumnsRenamed(
        {f"_r_{c}": f"right_{c}" for c in right_cols}
    ).withColumnRenamed("_rts", "right_ts")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    right_ts_alias: str = "right_ts",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.ts <= left.ts on the same key (as-of backward join).

    Implementation: tag + union both sides, one window sorted by
    (ts, side) per key with last(ignoreNulls) carry-forward, then keep
    left rows. Exactly one shuffle on key_col; no per-row range scan.
    Right rows sort before left rows at equal ts so ties are inclusive
    (matches ASOF JOIN ... ON left.ts >= right.ts).
    """
    lcols = [c for c in left.columns]
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast("timestamp").alias(right_ts_alias),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key_col, ts_col)],
        F.lit(0).alias("_side"),
        F.col(ts_col).alias(right_ts_alias),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).select(*l_tag.columns)
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        F.col("_side"),
        F.last(right_ts_alias, ignorenulls=True).over(w).alias(right_ts_alias),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def ts_pattern_topk(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    key_col: str,
    id_col: str,
    pattern: list[float],
    k: int = 10,
) -> DataFrame:
    """Time-series pattern search: the k subsequences (per-key sliding
    windows of len(pattern) points) closest to a z-normalized query
    pattern — the distributed core of matrix-profile / motif search
    (cf. "Time Series Similarity Search for Streaming Data in
    Distributed Systems", EDBT'19).

    Shape: ONE window shuffle on the series key builds every
    subsequence (collect_list over a rows-frame — state is w points per
    row, not the series); z-normalization and the distance fold are
    array expressions in whole-stage codegen; the global top-k is a
    TakeOrderedAndProject, never a full sort. Distances fold
    left-to-right with a 0.0 seed, so the DuckDB oracle (list_reduce)
    reproduces them bitwise.
    """
    w = len(pattern)
    mu = sum(pattern) / w
    sd = (sum((x - mu) ** 2 for x in pattern) / w) ** 0.5
    zp = [(x - mu) / sd for x in pattern]

    win = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.currentRow, w - 1)
    )
    sub = df.select(
        F.col(key_col).alias("series_key"),
        F.col(ts_col).alias("start_ts"),
        F.col(id_col).alias("start_id"),
        F.collect_list(F.col(value_col).cast("double")).over(win).alias("win"),
    ).filter(F.size("win") == w)

    total = F.aggregate("win", F.lit(0.0), lambda a, x: a + x)
    sub = sub.withColumn("mu", total / w)
    var = F.aggregate(
        "win", F.lit(0.0), lambda a, x: a + (x - F.col("mu")) * (x - F.col("mu"))
    ) / w
    sub = sub.withColumn("sd", F.sqrt(var)).filter(F.col("sd") > 1e-12)
    zpat = F.array(*[F.lit(float(v)) for v in zp])
    znorm = F.transform("win", lambda x: (x - F.col("mu")) / F.col("sd"))
    dist = F.aggregate(
        F.zip_with(znorm, zpat, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        sub.select("series_key", "start_ts", "start_id", dist.alias("zdist"))
        .orderBy(F.col("zdist").asc(), F.col("series_key"), F.col("start_id"))
        .limit(k)
    )


def ewma_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-(key, day) exponentially-weighted moving average over the
    day's per-minute means, alpha = 1/2 — the smoothing step behind
    anomaly baselines (seasonal_baseline's reactive companion).

    Built to be BITWISE-portable despite being a sequential recurrence:
    s_t = (x_t + s_{t-1}) / 2 — dividing an IEEE double by 2 is EXACT
    (exponent decrement, no rounding), so each step costs exactly one
    deterministic rounding (the add), and the fold runs in minute
    order over a bounded per-(key, day) array (≤ 1440 elements — this
    is why the grain is daily: an unbounded per-key collect would not
    scale). Minute means use the exact-decimal-sum discipline, so the
    whole chain hash-matches a SQL oracle. Seed = the day's first
    minute mean, matching DuckDB list_reduce's first-element seed.

    Output: (key, day, n_minutes, ewma) — one row per key-day, the
    smoothed end-of-day level."""
    minutes = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.to_date(ts_col).alias("day"),
            F.date_trunc("minute", F.col(ts_col)).alias("minute"),
        )
        .agg(
            (
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
                / F.count(value_col)
            ).alias("m")
        )
    )
    arr = (
        minutes.groupBy("key", "day")
        .agg(
            F.array_sort(F.collect_list(F.struct("minute", "m"))).alias("s"),
        )
        .select(
            "key",
            "day",
            F.size("s").cast("long").alias("n_minutes"),
            F.transform("s", lambda x: x["m"]).alias("vals"),
        )
    )
    ewma = F.aggregate(
        F.slice(F.col("vals"), 2, 100000),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: (acc + x) / F.lit(2.0),
    )
    return arr.select("key", "day", "n_minutes", ewma.alias("ewma"))


def ts_analog_topk(series: DataFrame, key_col: str, ts_col: str,
                   val_col: str, m: int = 8, k: int = 3) -> DataFrame:
    """(key, start_minute, dist_fp) — for every key's time series, the
    k historical length-``m`` subsequences most similar to its LATEST
    length-``m`` window ("what did the current pattern lead to last
    time") — the streaming-analytics subsequence-similarity-search
    shape (EDBT 2019's streaming ts-similarity problem, batch twin).

    Distance is MEAN-CENTERED squared L2 on integer-quantized values,
    scaled by m to stay in exact integers: d(W, Q) = sum_j (m*w_j -
    S_W - (m*q_j - S_Q))^2 — shift-invariant (level changes don't
    hide shape matches) with zero rounding anywhere, so candidate
    ranking is tie-stable and engine-portable. Candidates end before
    an m-wide exclusion zone ahead of the query window — adjacent
    windows are near-copies of the query (the matrix-profile
    "trivial match" problem) and would crowd out real analogs.

    Shape: one groupBy(key) collects each series into a sorted array
    row (per-minute grain keeps series bounded — a year is ~526k
    values, ~4 MB; regularize gaps first with gap_fill_minutes if the
    grid matters); window sums precompute as one O(n*m) pass of
    integer folds; the per-key top-k window reuses the groupBy
    partitioning, so the whole operator is one shuffle. Keys with
    fewer than 2m+1 points have no non-overlapping candidate and are
    absent. Integer headroom: m * max|quantized value| must stay
    under ~3e9/sqrt(m) (quantize coarser for wilder series).
    """
    agg = (
        series.groupBy(key_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("t"), F.col(val_col).alias("v"))
                )
            ).alias("s")
        )
        .select(
            F.col(key_col).alias("key"),
            F.expr("transform(s, x -> x.t)").alias("ts"),
            F.expr("transform(s, x -> x.v)").alias("vs"),
        )
        .filter(F.size("vs") >= 2 * m + 1)
        .withColumn("qv", F.expr(f"slice(vs, size(vs) - {m} + 1, {m})"))
        .withColumn(
            "sq", F.expr("aggregate(qv, cast(0 as bigint), (acc, x) -> acc + x)")
        )
        .withColumn(
            "sws",
            F.expr(
                f"transform(sequence(1, size(vs) - 2 * {m}), i -> "
                f"aggregate(slice(vs, i, {m}), cast(0 as bigint), "
                "(acc, x) -> acc + x))"
            ),
        )
    )
    diff = (
        f"({m} * element_at(vs, i + j - 1) - element_at(sws, i)"
        f" - {m} * element_at(qv, j) + sq)"
    )
    cand = F.expr(
        f"transform(sequence(1, size(vs) - 2 * {m}), i -> struct("
        f"aggregate(sequence(1, {m}), cast(0 as bigint), (acc, j) -> "
        f"acc + {diff} * {diff}) as d, "
        "element_at(ts, i) as t))"
    )
    out = (
        agg.select("key", F.explode(cand).alias("c"))
        .select(
            "key",
            F.col("c.t").alias("start_minute"),
            F.col("c.d").alias("dist_fp"),
        )
    )
    w = Window.partitionBy("key").orderBy("dist_fp", "start_minute")
    return out.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    ).drop("rn")
