"""Mergeable sketch operators built as pure DataFrame compositions.

Count-min sketch: d independent hash rows × w buckets, bucket id =
first hex chars of a salted md5 (deterministic, reproducible in the
DuckDB oracle with zero hex→int conversion). Cells are additive, so
the same build works batch (one groupBy) and streaming (update-mode
windowless agg: Spark's state IS the sketch, micro-batches merge in).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2 hex chars → w = 256 buckets; e/256 ≈ 1% of N expected overestimate
CMS_DEPTH = 4
CMS_HEX_CHARS = 2


def cms_buckets(key: Column, depth: int = CMS_DEPTH, hex_chars: int = CMS_HEX_CHARS) -> Column:
    """array<struct<i,b>> of the key's (hash-row, bucket) cells."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}:"), key)), 1, hex_chars
                ).alias("b"),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key: Column,
    depth: int = CMS_DEPTH,
    hex_chars: int = CMS_HEX_CHARS,
) -> DataFrame:
    """(i, b, n) sketch cells. One shuffle of depth×N exploded rows
    that map-side-combines to ≤ depth×16^hex_chars cells per partition
    — O(d×w) memory for any N. On a STREAMING frame the identical
    expression is an update-mode aggregation: per-trigger state is the
    sketch and micro-batches merge additively (cells are mergeable)."""
    return (
        df.select(F.explode(cms_buckets(key, depth, hex_chars)).alias("c"))
        .select("c.i", "c.b")
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    keys: DataFrame,
    cells: DataFrame,
    key: Column,
    depth: int = CMS_DEPTH,
    hex_chars: int = CMS_HEX_CHARS,
) -> DataFrame:
    """point estimates (min over hash rows) for each row of ``keys``.
    The finished sketch is tiny (d×w rows) → broadcast join."""
    out_cols = keys.columns
    return (
        keys.select(*out_cols, F.explode(cms_buckets(key, depth, hex_chars)).alias("c"))
        .select(*out_cols, "c.i", "c.b")
        .join(F.broadcast(cells), ["i", "b"])
        .groupBy(*out_cols)
        .agg(F.min("n").alias("est_n"))
    )
