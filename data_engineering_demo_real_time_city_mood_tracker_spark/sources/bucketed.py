"""Bucketed tables: pre-shuffled on-disk layout for shuffle-free joins
and aggregations.

At 100 TB the dominant cost of fact-fact joins (orders ⋈ lineitem,
events ⋈ events) is the shuffle of both sides. Bucketing pays that
shuffle ONCE at write time: each side is hash-partitioned into the
same number of buckets on the join key and sorted within buckets, so
every future join/groupBy on that key runs as a zero-exchange
sort-merge over co-located buckets. This is the batch analog of the
reference's "keep collections keyed by intersection" Mongo layout
(reference mongo_to_storage.py), done Spark-native.

Bucket count guidance: total_size / bucket_count ≈ 128-512 MB per
bucket per partition; too few buckets caps join parallelism, too many
makes small files. Bucketed scans also skip the exchange for
groupBy(bucket_key) aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table registered in
    the session catalog (bucket metadata lives in the catalog, so
    reads must go through ``spark.table``, not ``spark.read.parquet``).
    """
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_equi_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With
    bucketing aligned, the physical plan contains no Exchange on
    either side (verified in tests/test_plans.py).

    The merge hint pins the sort-merge strategy: bucketed layouts
    exist for fact-fact joins where neither side fits a broadcast, and
    letting the optimizer broadcast a small test table would silently
    skip the co-located path this function promises."""
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), key
    )
