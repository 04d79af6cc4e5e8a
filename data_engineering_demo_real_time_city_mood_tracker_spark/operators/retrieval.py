"""Lexical retrieval: the shared BM25-lite scorer and a persistent,
lake-native inverted index (Lucene-segment-shaped, parquet-backed).

Scoring is the repo's BM25-lite (k1=1.2, b=0.75, log-free monotone
idf — see plans/queries.py BM25 block for why the log is dropped:
ln() differs by ulps across libms, the rational idf keeps every
arithmetic step bitwise oracle-portable). The index makes the
build-once / append-per-crawl / query-many lifecycle real:

    index/
      postings/seg=<name>/bucket=<0..n-1>/  (token, doc_id, tf, dl)
      stats/seg=<name>/                     (n_docs, total_dl)

- ``bucket = crc32(token) % n_buckets`` — a probe reads ONLY its query
  terms' buckets (PartitionFilters directory pruning) and pushes the
  token equality into the parquet scan; at 100 TB the probe I/O is the
  query-term postings, not the corpus.
- segments are MERGEABLE partials: df(token) is the posting-row count
  for that token across segments, N = Σ n_docs, avgdl = Σ total_dl /
  Σ n_docs — appending a crawl never re-tokenizes the standing corpus
  (same posture as ``merge_agg_partials`` / the dedup index).
- crash-replay safe: a segment's ``stats`` row is written LAST and is
  the commit record — probes only read segments whose stats exist, and
  both writes use dynamic partition overwrite so re-running a failed
  append repairs the segment in place instead of duplicating postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def bm25_rank(
    tf: DataFrame,
    query_pairs: list[tuple[int, str]],
    n_docs: int,
    avgdl: float,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` docs per query over a (doc_id, tok, tf, dl) postings
    frame already restricted to query terms.

    df derives from ``tf`` (one row per (doc, tok) ⇒ per-token row
    count == document frequency) — never a second corpus pass; both
    df and the query table broadcast. Per-(query, doc) term scores
    fold in sorted term order so the double sum is partition-order
    independent and bitwise equal to the DuckDB oracle's
    ``list_reduce(list(s ORDER BY term))``.
    """
    spark = tf.sparkSession
    tf = tf.persist()
    dfr = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    # dedupe (query, term): a repeated term in a tokenized query string
    # would otherwise multiply its postings rows through the join,
    # double-counting the term's score and inflating n_terms
    qdf = spark.createDataFrame(
        sorted(set(query_pairs)), "query_id int, term string"
    )
    idf = ((F.lit(n_docs) - F.col("df")).cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    num = F.col("tf").cast("double") * F.lit(K1 + 1.0)
    den = F.col("tf").cast("double") + F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * (F.col("dl").cast("double") / F.lit(avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfr), "tok")
        .join(F.broadcast(qdf), F.col("tok") == F.col("term"))
        .select("query_id", "doc_id", "term", (idf * num / den).alias("s"))
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sort_array(
            F.collect_list(F.struct(F.col("term").alias("t"), F.col("s").alias("s")))
        ).alias("_ts"),
    )
    agg = agg.withColumn(
        "score",
        F.aggregate(F.col("_ts"), F.lit(0.0), lambda acc, x: acc + x["s"]),
    ).drop("_ts")
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "doc_id",
            "n_terms",
            "score",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def _postings(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, tok, tf, dl) term-frequency postings — ONE tokenize
    pass, one (doc, token)-keyed shuffle."""
    from data_engineering_demo_real_time_city_mood_tracker_spark.functions.text import tokens
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.dedup import _spread

    base = _spread(docs).select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    return (
        base.select(
            "doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"), F.min("dl").alias("dl"))
    )


def _bucket(tok_col, n_buckets: int):
    return (F.crc32(F.encode(tok_col, "utf-8")) % n_buckets).cast("int")


def _dyn_overwrite(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """dynamic partition overwrite: only the partitions present in
    ``df`` (this segment) are replaced — idempotent per-segment
    replay, other segments untouched."""
    (
        df.write.option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .mode("overwrite")
        .parquet(path)
    )


def _fs_delete(spark: SparkSession, path: str) -> None:
    """Recursively delete ``path`` through the Hadoop FS API (works on
    any supported filesystem, no-op if absent)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)


def _read_meta_buckets(spark: SparkSession, path: str) -> int | None:
    from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import read_json_meta

    meta = read_json_meta(spark, f"{path}/meta.json")
    return int(meta["n_buckets"]) if meta else None


def build_text_index(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    n_buckets: int = 64,
    segment: str = "base",
) -> None:
    """Build (or rebuild) the index's ``segment`` from ``docs``.

    ``n_buckets`` is pinned in ``path/meta`` on first build — appends
    and probes read it from there, so an index can never be probed
    with a different bucket modulus than it was built with (a silent
    wrong-bucket prune). Rebuilding a segment DELETES it first (stats
    — the commit record — before postings), so a changed corpus can
    never leave stale bucket partitions behind; postings then land,
    and the fresh stats row lands LAST, recommitting the segment. A
    crash at any point leaves the segment invisible to probes and a
    re-run repairs it in place.
    """
    spark = docs.sparkSession
    pinned = _read_meta_buckets(spark, path)
    if pinned is not None and pinned != n_buckets:
        raise ValueError(
            f"index at {path} was built with n_buckets={pinned}; "
            f"got {n_buckets}"
        )
    if pinned is None:
        from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import write_json_meta

        write_json_meta(spark, f"{path}/meta.json", {"n_buckets": int(n_buckets)})
    # decommit, then clear: stats first so a crash mid-delete still
    # leaves the segment invisible rather than half-stale
    _fs_delete(spark, f"{path}/stats/seg={segment}")
    _fs_delete(spark, f"{path}/postings/seg={segment}")
    post = _postings(docs, text_col, id_col).withColumn(
        "bucket", _bucket(F.col("tok"), n_buckets)
    )
    # repartition on the partition keys before the partitioned write:
    # otherwise every one of the P input tasks fans out a file into
    # every bucket directory (P×n_buckets small files per segment —
    # measured 2048 at test SF). After the repartition each bucket is
    # written by exactly one task → n_buckets files. At real corpus
    # scale raise the partition count (repartition(N, cols)) so file
    # size, not file count, is what's bounded.
    _dyn_overwrite(
        post.withColumn("seg", F.lit(segment)).repartition("seg", "bucket"),
        f"{path}/postings",
        ["seg", "bucket"],
    )
    # stats counts EVERY input doc (dl = token count, 0 included): a doc
    # that tokenizes to nothing has no postings rows, so deriving n_docs
    # /total_dl from written postings would drop it and skew idf/avgdl
    # away from the from-scratch definition (_BM25_ORACLE counts all
    # docs). Commit ordering is unchanged — this agg only runs after the
    # postings write action succeeded, so stats still lands last.
    from data_engineering_demo_real_time_city_mood_tracker_spark.functions.text import tokens

    stats = (
        docs.select(F.size(tokens(F.col(text_col))).alias("dl"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("dl").cast("decimal(18,0)")).cast("long").alias("total_dl"),
        )
        .withColumn("seg", F.lit(segment))
    )
    _dyn_overwrite(stats, f"{path}/stats", ["seg"])


def append_text_index(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    path: str,
    segment: str,
    n_buckets: int | None = None,
) -> None:
    """Add a crawl increment as a new segment — the standing corpus is
    never re-read or re-tokenized. Same commit ordering as build; the
    bucket modulus comes from the index's own meta (passing one that
    disagrees is an error, not a silent wrong-bucket write). On a
    fresh path the first append bootstraps the index and pins the
    modulus (streaming ingestion starts from nothing)."""
    pinned = _read_meta_buckets(docs.sparkSession, path)
    if pinned is not None and n_buckets is not None and n_buckets != pinned:
        raise ValueError(
            f"index at {path} was built with n_buckets={pinned}; got {n_buckets}"
        )
    build_text_index(
        docs,
        text_col,
        id_col,
        path,
        n_buckets=pinned if pinned is not None else (n_buckets or 64),
        segment=segment,
    )


def query_text_index(
    spark: SparkSession,
    path: str,
    query_pairs: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """BM25 top-``k`` per query against the persistent index.

    Reads ONLY committed segments (stats is the commit record), ONLY
    the query terms' hash buckets (PartitionFilters directory pruning,
    modulus from the index's own meta — never a caller guess), with
    the token equality pushed into the parquet scan — probe I/O is
    independent of corpus size. Corpus stats merge from the
    per-segment partials (exact integer arithmetic ⇒ bitwise equal to
    a from-scratch computation)."""
    import zlib

    n_buckets = _read_meta_buckets(spark, path)
    if n_buckets is None:
        raise ValueError(f"no index meta at {path} — build_text_index first")
    stats = spark.read.parquet(f"{path}/stats")
    segs = [r.seg for r in stats.select("seg").distinct().collect()]
    tot = (
        stats.filter(F.col("seg").isin(segs))
        .agg(F.sum("n_docs").alias("n"), F.sum("total_dl").alias("dl"))
        .first()
    )
    if tot["n"] is None or int(tot["n"]) == 0:
        raise ValueError(
            f"no committed segments at {path} — every append crashed "
            "before its stats row landed (or the corpus was empty); "
            "re-run build/append_text_index to repair"
        )
    n_docs, avgdl = int(tot["n"]), float(tot["dl"]) / int(tot["n"])
    terms = sorted({t for _, t in query_pairs})
    buckets = sorted({zlib.crc32(t.encode("utf-8")) % n_buckets for t in terms})
    tf = (
        spark.read.parquet(f"{path}/postings")
        .filter(
            F.col("seg").isin(segs)
            & F.col("bucket").isin(buckets)
            & F.col("tok").isin(terms)
        )
        .select("doc_id", "tok", "tf", "dl")
    )
    return bm25_rank(tf, query_pairs, n_docs, avgdl, k=k)
