"""Product quantization (PQ) for vector search at corpus scale
(Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011): split each vector into ``m`` subspaces, k-means
each subspace into ``ksub`` centroids, and store every vector as ``m``
small codes — a 64-dim float vector (256 B) compresses to 4 bytes at
m=4/ksub=16. Search uses asymmetric distance computation (ADC): the
QUERY stays exact, per-subspace distances to all centroids are
precomputed into a lookup table, and a corpus vector's approximate
distance is just ``m`` table lookups + adds.

Spark shape:
- training reuses :mod:`clustering`'s k-means per subspace — the same
  map-only assignment / (cluster,pos)-keyed update discipline, m small
  runs whose shuffle volume is ksub × dsub per task regardless of
  corpus size.
- encoding is MAP-ONLY: codebooks ride the plan as literals (m × ksub
  × dsub doubles — a few KB), argmin per subspace in codegen.
- the ADC scan is map-only over the CODES table (the corpus vectors
  are never read at query time — that is the point: the scan I/O is
  the 4-byte codes, not the 256-byte vectors); per-query LUTs are
  driver-computed (m × ksub flops) and ride as one literal.
- at 100 TB, compose with IVF: partition the codes table by coarse
  cell (build_ivf_index) so ADC scans only the probed cells. This
  module keeps the flat scan as the verifiable baseline.

Determinism: subspace k-means inherits clustering.py's md5-seeded
init + exact-decimal updates; assignment ties break to the lowest
code. Training is iterative ⇒ the registered query is rows-only, with
recall-vs-exact and determinism asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_demo_real_time_city_mood_tracker_spark.operators.clustering import _centroid_array, kmeans


def train_pq(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 4,
    ksub: int = 16,
    max_iter: int = 3,
) -> list[list[list[float]]]:
    """codebooks[m][ksub][dsub]: k-means per subspace slice, with all
    ``m`` subspaces trained in the SAME jobs.

    Running :func:`clustering.kmeans` per subspace would cost m ×
    (init + iterations) separate Spark jobs over the same corpus; the
    subspace problems are independent, so this fuses them — ONE
    md5-ordered init collect seeds every subspace (identical seeds to
    the sequential form: the smallest-hash ids' slices), and each
    Lloyd round is ONE pass computing every subspace's assignment
    map-only and aggregating all means keyed on (subspace, cluster,
    pos). Same exact-decimal update discipline ⇒ byte-identical
    codebooks to m independent kmeans() runs (test-asserted), at
    1/m-th the job count; the per-round shuffle payload is m × ksub ×
    dsub partials per task — corpus-size-independent.
    """
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.dedup import _spread

    dim = len(df.select(vec_col).first()[0])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    dsub = dim // m
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    seeds = (
        base.select(F.md5(F.col("id").cast("string")).alias("h"), "_v")
        .orderBy("h")
        .limit(ksub)
        .collect()
    )
    books = [
        [list(r["_v"])[j * dsub : (j + 1) * dsub] for r in seeds] for j in range(m)
    ]
    for _ in range(max_iter):
        per_sub = []
        for j, book in enumerate(books):
            sub = F.slice(F.col("_v"), j * dsub + 1, dsub)
            cents = _centroid_array(book)
            # NB: single-arg lambda (F.transform would pass an index
            # as a second param); `sub` capture is safe — transform
            # builds the expression eagerly within this iteration
            dists = F.transform(
                cents,
                lambda c: F.aggregate(
                    F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
            )
            cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
            per_sub.append(
                F.struct(
                    F.lit(j).alias("j"), cluster.alias("cluster"), sub.alias("sub")
                )
            )
        new_rows = (
            base.select(F.explode(F.array(*per_sub)).alias("s"))
            .select("s.j", "s.cluster", F.posexplode("s.sub").alias("pos", "x"))
            .groupBy("j", "cluster", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(28,10)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("c")
            )
            .collect()
        )
        new_books = [[list(c) for c in book] for book in books]
        for r in new_rows:
            new_books[r.j][r.cluster][r.pos] = r.c
        if new_books == books:
            break
        books = new_books
    return books


def encode_pq(
    df: DataFrame, vec_col: str, id_col: str, codebooks: list[list[list[float]]]
) -> DataFrame:
    """(id, code: array<int>) — map-only nearest-centroid code per
    subspace, codebooks as plan literals, ties → lowest code."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    out = df.select(F.col(id_col).alias("id"), vec.alias("_v"))
    codes = []
    for j, book in enumerate(codebooks):
        sub = F.slice(F.col("_v"), j * dsub + 1, dsub)
        cents = _centroid_array(book)
        dists = F.transform(
            cents,
            lambda c: F.aggregate(
                F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
        )
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return out.select("id", F.array(*codes).alias("code"))


def pq_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query_rows: list[tuple[int, list[float]]],
    k: int = 5,
) -> DataFrame:
    """ADC top-``k`` per query over the codes table.

    Per-query lookup tables (lut[q][j][c] = ||query_j − codebook
    [j][c]||²) are computed driver-side (nq × m × ksub tiny flops) and
    embedded as ONE literal; the scan explodes each code row over the
    query list and sums m table lookups — map-only until the final
    per-query top-k. Emits (query_id, corpus_id, approx_dist, rnk)."""
    from pyspark.sql import Window

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    luts = []
    qids = []
    for qid, qvec in query_rows:
        qv = [float(x) for x in qvec]
        lut = []
        for j, book in enumerate(codebooks):
            sub = qv[j * dsub : (j + 1) * dsub]
            lut.append(
                [
                    sum((a - b) * (a - b) for a, b in zip(sub, cent))
                    for cent in book
                ]
            )
        luts.append(lut)
        qids.append(int(qid))
    # nq × m × ksub literal: one expr tree, same rationale as
    # clustering._centroid_array
    lut3 = F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array("
                + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in row)
                + ")"
                for row in lut
            )
            + ")"
            for lut in luts
        )
        + ")"
    )
    qid_lit = F.array(*[F.lit(q) for q in qids])
    nq = len(qids)
    scan = codes_df.select(
        F.col("id").alias("corpus_id"),
        "code",
        F.explode(F.sequence(F.lit(1), F.lit(nq))).alias("qi"),
    )
    per_q_lut = F.element_at(lut3, F.col("qi"))  # m × ksub for this query
    dist = F.aggregate(
        F.zip_with(
            F.col("code"),
            per_q_lut,
            lambda c, row: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist"), F.col("corpus_id")
    )
    return (
        scan.select(
            F.element_at(qid_lit, F.col("qi")).alias("query_id"),
            "corpus_id",
            dist.alias("approx_dist"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
