"""Similarity search over embedding columns.

Two paths:
- brute-force top-k: exact, one shuffle (broadcast the query set,
  per-partition cosine, window top-k). The baseline.
- sign-LSH ANN: bucket join first (queries only probe their own
  bucket), then in-bucket top-k — the 100 TB path: candidate set per
  query shrinks by ~2^nbits, shuffle keyed on bucket.

Cosine math is ``zip_with``/``aggregate`` in double — JVM codegen, and
bit-for-bit reproducible by the DuckDB oracle via list_reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_demo_real_time_city_mood_tracker_spark.functions import vectors


def _as_double(vec):
    return F.transform(vec, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    The query side is broadcast (it is small by construction); ranking
    uses a window partitioned by query id — deterministic tie-break on
    corpus id.
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            vectors.cosine(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cos_sim", "rnk")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 5,
    nbits: int = 4,
) -> DataFrame:
    """Approximate top-k: probe only the query's sign-LSH bucket.

    Same output shape as brute_force_topk; recall < 1 by design (the
    scale path — candidates per query drop ~2^nbits-fold).
    """
    c = (
        corpus.select(
            F.col(id_col).alias("corpus_id"), _as_double(F.col(vec_col)).alias("cvec")
        )
        .withColumn("bucket", vectors.sign_bucket(F.col("cvec"), nbits))
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
        )
        .withColumn("bucket", vectors.sign_bucket(F.col("qvec"), nbits))
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            vectors.cosine(F.col("qvec"), F.col("cvec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "corpus_id", "cos_sim", "rnk")
    )
