"""Exact distributed quantiles by two-phase selection — no global
sort, no sketch error.

`percentile_approx` (GK sketch) trades error for mergeability, and a
window `percent_rank` needs every group's rows through ONE sorted
partition — the classic single-reducer bottleneck when groups are few
and rows are billions. Two-phase selection (the iterative-narrowing
idea behind Munro & Paterson 1980's multi-pass selection, done in one
histogram pass + one targeted pass) gets the EXACT order statistic
with scale-proof pieces instead:

- phase 1 histograms values into ``n_buckets`` fixed ranges per group:
  a map-side-combining groupBy whose reduce side is ≤ groups ×
  n_buckets rows at ANY corpus size, then a cumulative count over that
  tiny frame locates the bucket containing each target rank.
- phase 2 re-scans ONLY the target buckets (expected n/n_buckets of
  the data per percentile) and row_numbers within them — the sort
  Spark pays is over the thin slice, never the corpus.

Both phases are one scan each; nothing about the plan changes at
100×. Ties are harmless: equal values share a bucket, and whichever
row row_number picks at the target offset carries the same value.
The rank convention is ``floor(p * (n-1))`` 0-indexed — the "lower"
discrete quantile, mirrored literally in the SQL oracle (same IEEE
double multiply + floor, so the hashed output is bitwise portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pcts: list[float],
    n_buckets: int | None = None,
    target_bucket_rows: int = 2_000_000,
) -> DataFrame:
    """(group, pct, q_value): the exact pct-quantile of ``value_col``
    per group, rank = floor(pct * (n-1)) into the ascending order.

    ``n_buckets`` defaults to ADAPTIVE — ceil(total_rows /
    target_bucket_rows), floored at 1024: with a fixed width, phase
    2's per-(group, pct) window sees ~n/n_buckets rows through ONE
    sorted partition, which quietly regrows the single-reducer
    bottleneck the operator exists to avoid (at 10¹¹ rows, fixed 1024
    buckets → 10⁸-row windows). Sizing buckets off a cheap driver-side
    count pins the phase-2 window near ``target_bucket_rows``
    regardless of corpus size — the same fixed-parameter-is-a-latent-
    quadratic rule as adaptive_nbits. Bucketing is internal: the
    result (and the SQL oracle) is bucket-count-independent."""
    if n_buckets is None:
        n_buckets = max(1024, -(-df.count() // target_bucket_rows))
    v = F.col(value_col)
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )
    targets = (
        stats.select(
            group_col,
            "n",
            F.explode(F.array(*[F.lit(float(p)) for p in pcts])).alias("pct"),
        )
        .withColumn("rk", F.floor(F.col("pct") * (F.col("n") - 1)).cast("long"))
    )

    width = (F.col("mx") - F.col("mn")) / F.lit(n_buckets)
    bucket = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((v - F.col("mn")) / width), F.lit(n_buckets - 1)
        )
    ).cast("long")

    # phase 1: per-(group, bucket) counts — map-side combine bounds the
    # shuffle at groups × n_buckets rows regardless of corpus size;
    # the cumulative window runs over that bounded frame only.
    # no forced broadcast on stats/tb: both are one-row-per-(group[,pct])
    # frames — tiny for dashboard-style groupings but O(groups) by
    # construction, so a forced broadcast becomes a driver OOM at
    # high-cardinality group_col (ADVICE r3). AQE broadcasts them
    # whenever they fit the threshold and shuffles otherwise.
    binned = df.join(stats, group_col).withColumn("_b", bucket)
    hist = binned.groupBy(group_col, "_b").agg(F.count(F.lit(1)).alias("cnt"))
    cw = (
        Window.partitionBy(group_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(cw)).withColumn(
        "cum_prev", F.col("cum") - F.col("cnt")
    )

    # locate each target rank's bucket + how many values precede it
    tb = (
        targets.join(cum, group_col)
        .filter((F.col("cum_prev") <= F.col("rk")) & (F.col("rk") < F.col("cum")))
        .select(group_col, "pct", "rk", "_b", "cum_prev")
    )

    # phase 2: only rows in target buckets pay the sort
    w = Window.partitionBy(group_col, "pct").orderBy(value_col)
    return (
        binned.join(tb, [group_col, "_b"])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == F.col("rk") - F.col("cum_prev") + 1)
        .select(group_col, "pct", v.alias("q_value"))
    )
