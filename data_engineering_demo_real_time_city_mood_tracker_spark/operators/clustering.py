"""Distributed k-means (Lloyd's) over an embedding column — the
training step behind IVF ANN indexes and corpus clustering.

Execution shape per iteration:
- assignment is a MAP-ONLY pass: the k×dim centroid matrix is tiny
  (k=64, dim=1024 → 512 KB), so it is embedded in the plan as
  literals — the Spark equivalent of a broadcast variable, with zero
  shuffle and full codegen on the distance math.
- the centroid update is ONE groupBy(cluster) shuffle whose payload is
  dim partial-sum columns — map-side partial aggregation reduces each
  executor's contribution to k rows before the exchange, so the
  shuffle volume is k × dim × executors, independent of corpus size.
- the new centroids (k rows) are collected to the driver; O(k×dim)
  bytes, never the data.

Determinism: init picks the k vectors with the smallest md5(id) —
reproducible across runs/partitionings; ties in assignment break to
the lowest centroid index (array_position finds the first minimum).
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@contextmanager
def _no_aqe(spark):
    """Scope trainer-friendly shuffle settings around an iterative
    trainer's tiny fixed-shape aggs.

    - AQE off: AQE re-plans after every shuffle by splitting the query
      into sub-jobs — pure scheduling overhead when the reduce side is
      a known k×dim rows (measured: train_pq 3 rounds 4.1 s → 2.9 s at
      bench SF).
    - 8 reduce partitions: the trainer's reduce side is ≤ k×dim rows
      AT ANY CORPUS SCALE (map-side partial agg collapses each task to
      k rows first), so the session's corpus-sized shuffle.partitions
      buys nothing but task-scheduling latency here.

    Both saved/restored so the session's settings — which ARE right
    for the corpus-sized queries — are untouched."""
    keys = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {}
    for key, val in keys.items():
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, val)
    try:
        yield
    finally:
        for key, val in old.items():
            if val is not None:
                spark.conf.set(key, val)
            else:
                spark.conf.unset(key)


def _portable_mean(x):
    """Partition-order-independent AND engine-portable centroid mean:
    floor-quantize each element to an exact integer at scale 1e10,
    sum as BIGINT (exact), then two IEEE double divisions.

    Why not CAST(x AS DECIMAL(28,10)): the double→decimal cast has a
    rounding TIE when the element's 11th decimal digit is exactly 5 —
    Spark rounds the shortest-repr string HALF_UP while DuckDB rounds
    the 1e10-scaled double, and the two disagree on such ties
    (observed: one dim of one centroid off by 1e-10 at sf0.01, which
    broke the hash of any query exposing centroid arithmetic).
    FLOOR of an IEEE double is bit-deterministic — no rounding rule
    to disagree on — so the quantized sums match bitwise on any
    engine."""
    return (
        F.sum(F.floor(x * F.lit(1e10))).cast("double")
        / F.count(F.lit(1))
        / F.lit(1e10)
    )


def _sq_dist(vec, centroid_lit):
    d = F.zip_with(vec, centroid_lit, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def _cents_sql(centroids: list[list[float]]) -> str:
    """k×dim literal matrix as SQL text (see _centroid_array for why
    one parsed string beats k·dim py4j Column calls)."""
    return (
        "array("
        + ",".join(
            "array(" + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in c) + ")"
            for c in centroids
        )
        + ")"
    )


def _dists_sql(vec_sql: str, centroids: list[list[float]]) -> str:
    """per-centroid squared-distance array as ONE SQL string — the
    same zip_with/aggregate fold as :func:`_sq_dist` (0.0-seeded,
    index order, one IEEE add per dim), but parsed JVM-side in one
    call. Measured per trainer round at bench SF vs the py4j-lambda
    tree: plan build 0.22 → 0.12 s AND exec 0.6 → 0.3 s (the parsed
    lambda produces a leaner expression tree); assignments verified
    identical, and every oracle row downstream guards the arithmetic
    bitwise."""
    return (
        f"transform({_cents_sql(centroids)}, c -> "
        f"aggregate(zip_with({vec_sql}, c, (x, y) -> (x - y) * (x - y)), "
        f"0.0D, (acc, x) -> acc + x))"
    )


def _centroid_array(centroids: list[list[float]]):
    """k×dim literal matrix as ONE parsed SQL expression. Building it
    from nested F.lit/F.array would cost k·dim py4j round-trips per
    plan (~1 s at k=8, dim=64, per iteration); a single F.expr hands
    the whole tree to the JVM parser in one call. CAST('repr' AS
    DOUBLE) round-trips every float bit-exactly (repr is shortest
    round-trip form)."""
    inner = ",".join(
        "array(" + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in c) + ")"
        for c in centroids
    )
    return F.expr(f"array({inner})")


_LITERAL_K_MAX = 32


def assign_clusters(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    use_blas: bool | None = None,
) -> DataFrame:
    """(id, cluster, vec): nearest-centroid assignment, map-only.

    Small k rides the plan as literals (full codegen on the distance
    math). Past ``_LITERAL_K_MAX`` the k×dim literal tree blows the
    codegen budget and Spark silently falls back to interpreted
    evaluation (measured: k=156 k-means 30.7 s vs 4 s at sf1) — so
    large k ships the matrix as ONE broadcast row instead: identical
    arithmetic on the same doubles (createDataFrame round-trips float
    bits exactly), plan size O(1) in k.

    ``use_blas`` makes the path choice explicit (ADVICE r3): the BLAS
    path computes ||c||² − 2v·c, which can argmin differently from
    the per-dimension fold on near-tie distances. Default ``None``
    keeps the size-based switch; pass ``False`` to force fold-exact
    semantics at any k (paying interpreted eval past the codegen
    budget), ``True`` to force the matmul path at small k."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(F.col(id_col).alias("id"), vec.alias("vec"))
    if use_blas is None:
        use_blas = len(centroids) > _LITERAL_K_MAX
    if use_blas:
        return _assign_clusters_np(base, centroids)
    dists = F.expr(_dists_sql("vec", centroids))
    return (
        base.withColumn("_d", dists)
        .select(
            "id",
            "vec",
            (F.array_position(F.col("_d"), F.array_min(F.col("_d"))) - 1)
            .cast("int")
            .alias("cluster"),
        )
    )


def _assign_clusters_np(base: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Large-k assignment as an Arrow-batched BLAS matmul.

    The JVM path evaluates k zip_with/aggregate lambdas per row —
    interpreted per-element, so cost is k×dim×n lambda dispatches
    (measured: k=156 over 20k vectors = 30 s/round at sf1, identical
    for literal and broadcast centroid shipping — the lambda eval IS
    the cost). ||v−c||² = ||v||² − 2v·C + ||c||² turns the whole batch
    into one n×dim @ dim×k matmul (~ms). Ties break to the lowest
    index (np.argmin) exactly like array_position(array_min). Used
    only above _LITERAL_K_MAX, where no oracle-backed caller lives —
    the k≤32 hash-gated paths keep the fold-order-exact JVM
    arithmetic."""
    import numpy as np
    import pandas as pd

    cmat = np.asarray(centroids, dtype=np.float64)
    cnorm = (cmat * cmat).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.asarray(list(pdf["vec"]), dtype=np.float64)
            d = cnorm - 2.0 * (v @ cmat.T)  # ||v||² constant per row
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "vec": pdf["vec"],
                    "cluster": np.argmin(d, axis=1).astype(np.int32),
                }
            )

    id_type = base.schema["id"].dataType.simpleString()
    return base.mapInPandas(
        assign, schema=f"id {id_type}, vec array<double>, cluster int"
    )


def within_cluster_cosine_pairs(assigned: DataFrame) -> DataFrame:
    """(id_a, id_b, cos_sim) for every within-cluster pair with
    id_a < id_b — the SemDeDup pairwise-scoring stage, computed as a
    grouped fold-exact numpy pass instead of a cluster-keyed self-join
    scored by interpreted zip_with/aggregate lambdas.

    Input: (id, vec array<double>, cluster) — assign_clusters output.

    Why this shape: the self-join shuffles the dim-wide double vectors
    on BOTH join sides and then pays ~pairs × dim interpreted lambda
    dispatches for the cosine folds (HOF expressions never enter
    codegen). Here ONE exchange moves each vector once (grouped by
    cluster) and the pair scoring runs vectorized per group; output is
    3 narrow columns.

    Why bitwise: norms accumulate x*x per-dim SEQUENTIALLY and dots
    x*y likewise — ``acc = acc + a*b`` per dim is the same two
    correctly-rounded IEEE ops in the same order as the 0.0-seeded
    zip_with/aggregate fold (numpy elementwise ufuncs never fuse into
    FMA); np.sqrt is correctly rounded like java.lang.Math.sqrt; and
    cos = dot / (na * nb) multiplies before dividing exactly like the
    Column expression. Parity is test-asserted against the JVM
    expression on the real embeddings and the semantic_dedup oracle
    hash re-checks every value downstream. Rows within a group are
    sorted by id, so pair (i < j) positions ARE id_a < id_b.

    Memory on skewed clusters: pair indices are generated per
    ANCHOR-ROW BLOCK (never one O(m²) ``triu_indices``
    materialization) and every block is yielded as its own frame
    through the iterator grouped-map form, so per-task peak memory is
    the group's vectors plus ONE ~4M-pair block — a giant cluster
    costs wall time (pair count is the algorithm's output size), not
    tens of GB of simultaneous pair temporaries."""
    import numpy as np

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(batches), ignore_index=True)
        m = len(pdf)
        if m < 2:
            return
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy()
        v = np.asarray(list(pdf["vec"]), dtype=np.float64)
        dim = v.shape[1]
        nacc = np.zeros(m, dtype=np.float64)
        for t in range(dim):
            x = v[:, t]
            nacc = nacc + x * x
        norms = np.sqrt(nacc)
        chunk = 4_000_000
        s = 0
        while s < m - 1:
            # grow the anchor block until it holds ~chunk pairs (an
            # anchor i owns the m-1-i pairs (i, j>i)); a single anchor
            # over budget is taken whole — its pair count is < m
            e, pairs = s, 0
            while e < m - 1 and pairs + (m - 1 - e) <= chunk:
                pairs += m - 1 - e
                e += 1
            if e == s:
                e = s + 1
            anchors = np.arange(s, e)
            cnts = m - 1 - anchors
            ca = np.repeat(anchors, cnts)
            first = np.repeat(anchors + 1, cnts)
            off = np.repeat(np.cumsum(cnts) - cnts, cnts)
            cb = first + (np.arange(cnts.sum()) - off)
            acc = np.zeros(ca.shape[0], dtype=np.float64)
            for t in range(dim):
                x = v[:, t]
                acc = acc + x[ca] * x[cb]
            yield pd.DataFrame(
                {
                    "id_a": ids[ca],
                    "id_b": ids[cb],
                    "cos_sim": acc / (norms[ca] * norms[cb]),
                }
            )
            s = e

    return assigned.groupBy("cluster").applyInPandas(
        score, schema="id_a long, id_b long, cos_sim double"
    )


def assign_top_cells(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    n_probe: int,
) -> DataFrame:
    """(id, vec, cluster) exploded over each vector's ``n_probe``
    nearest centroids (squared-L2, ties to the lower index) — the
    multi-probe side of an IVF index. Map-only, like assign_clusters:
    centroids ride the plan as literals."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cents = _centroid_array(centroids)
    # (dist, cid) structs sorted by field order → distance, then index
    scored = F.transform(
        cents,
        lambda c, i: F.struct(
            _sq_dist(F.col("vec"), c).alias("d"), i.cast("int").alias("cid")
        ),
    )
    probes = F.slice(F.array_sort(scored), 1, n_probe)
    return (
        df.select(F.col(id_col).alias("id"), vec.alias("vec"))
        .select("id", "vec", F.explode(probes).alias("p"))
        .select("id", "vec", F.col("p.cid").alias("cluster"))
    )


def init_centroids(
    df: DataFrame, vec_col: str, id_col: str, k: int
) -> list[list[float]]:
    """k seed vectors with the smallest md5(id) — a deterministic
    uniform sample (hash order is independent of storage order)."""
    rows = (
        df.select(
            F.md5(F.col(id_col).cast("string")).alias("h"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        )
        .orderBy("h")
        .limit(k)
        .collect()
    )
    return [list(r.vec) for r in rows]


def py_sq_dist(vec: list[float], cent: list[float]) -> float:
    """driver-side replica of :func:`_sq_dist`'s JVM fold — 0.0-seeded
    left-to-right sum of (x−y)², one IEEE double add per dimension in
    the same order, so it is bitwise equal to the Column expression on
    the same doubles. Exists so tiny bounded frames (seed vectors) can
    be assigned on the driver without a Spark job while keeping every
    downstream hash-gated value identical."""
    acc = 0.0
    for x, y in zip(vec, cent):
        d = x - y
        acc += d * d
    return acc


def py_assign(vec: list[float], centroids: list[list[float]]) -> int:
    """driver-side replica of :func:`assign_clusters`'s argmin —
    ``array_position(dists, array_min(dists)) - 1`` picks the FIRST
    index achieving the minimum, mirrored here with a strict ``<``
    scan."""
    best, best_d = 0, py_sq_dist(vec, centroids[0])
    for i in range(1, len(centroids)):
        d = py_sq_dist(vec, centroids[i])
        if d < best_d:
            best, best_d = i, d
    return best


def _round_partials_np(base: DataFrame, centroids: list[list[float]]):
    """One Lloyd round's (cluster, pos) → (quantized sum, count)
    partials via a FOLD-EXACT numpy pass — bitwise-identical to the
    assignment fold + posexplode + _portable_mean aggregation it
    replaces, at a fraction of the cost (no interpreted HOF lambdas,
    no dim-wide explode shuffle: the shuffle moves ≤ tasks × k × dim
    partial rows instead of corpus_rows × dim exploded rows).

    Why bitwise: distances accumulate SEQUENTIALLY over dimensions —
    ``acc = acc + diff*diff`` per dim is the same two correctly-rounded
    IEEE ops in the same order as the zip_with/aggregate fold (numpy
    elementwise ufuncs never fuse into FMA), unlike the BLAS
    ``||v||²−2vc+||c||²`` expansion in _assign_clusters_np which can
    argmin differently on near-ties. np.argmin takes the FIRST minimum
    == array_position(array_min). The mean partials floor-quantize at
    1e10 exactly like _portable_mean (multiply then floor, both
    correctly rounded) and sum as exact int64; the caller finishes
    with the same double divisions. Parity is test-asserted on the
    real embeddings and every downstream oracle hash re-checks it."""
    import numpy as np
    import pandas as pd

    cmat = [list(map(float, c)) for c in centroids]
    k = len(cmat)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.asarray(list(pdf["vec"]), dtype=np.float64)
            n, dim = v.shape
            d = np.empty((n, k), dtype=np.float64)
            for ci in range(k):
                c = cmat[ci]
                acc = np.zeros(n, dtype=np.float64)
                for t in range(dim):
                    diff = v[:, t] - c[t]
                    acc = acc + diff * diff
                d[:, ci] = acc
            cl = np.argmin(d, axis=1)
            q = np.floor(v * 1e10).astype(np.int64)
            out = {"cluster": [], "pos": [], "s": [], "n": []}
            for ci in np.unique(cl):
                sel = q[cl == ci]
                sums = sel.sum(axis=0)
                out["cluster"].extend([int(ci)] * dim)
                out["pos"].extend(range(dim))
                out["s"].extend(int(x) for x in sums)
                out["n"].extend([int(sel.shape[0])] * dim)
            yield pd.DataFrame(out)

    return (
        base.select("vec")
        .mapInPandas(gen, schema="cluster int, pos int, s long, n long")
        .groupBy("cluster", "pos")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        .collect()
    )


def lloyd_np(vecs: list[list[float]], seeds: list[list[float]],
             max_iter: int) -> list[list[float]]:
    """DRIVER-side Lloyd iterations over an in-memory vector list —
    bitwise-identical to :func:`kmeans`'s rounds on the same vectors
    (same sequential-dim distance accumulation, first-min argmin, and
    floor-quantized exact-integer means as _round_partials_np; the
    final double divisions are the same IEEE ops _portable_mean
    performs). Exists for SAMPLE-trained index builds: training on a
    bounded md5-ordered sample is the FAISS-standard shape at scale,
    and whenever the sample covers the whole corpus (the correctness
    gate SFs) the result is byte-identical to the distributed
    trainer, so the oracles don't change."""
    import numpy as np

    v = np.asarray([list(map(float, x)) for x in vecs], dtype=np.float64)
    n, dim = v.shape
    cents = [list(map(float, c)) for c in seeds]
    q = np.floor(v * 1e10).astype(np.int64)
    for _ in range(max_iter):
        k = len(cents)
        d = np.empty((n, k), dtype=np.float64)
        for ci in range(k):
            c = cents[ci]
            acc = np.zeros(n, dtype=np.float64)
            for t in range(dim):
                diff = v[:, t] - c[t]
                acc = acc + diff * diff
            d[:, ci] = acc
        cl = np.argmin(d, axis=1)
        new = [list(c) for c in cents]
        for ci in np.unique(cl):
            sel = q[cl == ci]
            cnt = sel.shape[0]
            sums = sel.sum(axis=0)
            new[int(ci)] = [float(int(s)) / cnt / 1e10 for s in sums]
        if new == cents:
            break
        cents = new
    return cents


def assign_np(vecs, centroids: list[list[float]]):
    """driver-side batch argmin over an in-memory list — the numpy
    twin of py_assign (sequential-dim accumulation, first-min), for
    sample-sized frames where a Python loop would be the bottleneck."""
    import numpy as np

    v = np.asarray([list(map(float, x)) for x in vecs], dtype=np.float64)
    n, dim = v.shape
    k = len(centroids)
    d = np.empty((n, k), dtype=np.float64)
    for ci in range(k):
        c = list(map(float, centroids[ci]))
        acc = np.zeros(n, dtype=np.float64)
        for t in range(dim):
            diff = v[:, t] - c[t]
            acc = acc + diff * diff
        d[:, ci] = acc
    return np.argmin(d, axis=1)


def kmeans(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    max_iter: int = 5,
    dim: int | None = None,
    initial_centroids: list[list[float]] | None = None,
    np_rounds: bool | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's iterations; returns (assignments df, final centroids).

    The returned frame is (id, cluster) — re-derivable from the
    centroids with one map-only pass, so nothing is persisted between
    iterations and there is no lineage blow-up (each iteration's plan
    depends only on literal centroids, not the previous plan).
    ``dim`` is accepted for API stability but no longer needed — the
    (cluster, pos)-keyed update infers it from the data.
    ``initial_centroids`` skips the init job when the caller already
    holds the k smallest-md5(id) seed vectors (build_ivfpq_index
    collects coarse + PQ seeds in ONE TakeOrdered job); passing
    anything else changes the result, so callers must preserve the
    md5-order contract. ``np_rounds`` switches each Lloyd round to the
    fold-exact numpy partials pass (_round_partials_np —
    bitwise-identical centroids, test-asserted). Default ``None``
    applies the measured crossover: numpy above _LITERAL_K_MAX (where
    the interpreted fold is catastrophic — 30 s/round at k=156, and
    numpy already wins 16-19% at k=32/sf1), Column rounds at small k
    (the per-round mapInPandas overhead regressed the k=8 bench
    trainers 1.2-1.9× at sf0.1 when numpy was unconditional — caught
    and reverted in r5).
    """
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.dedup import _spread

    # single-file corpora would otherwise run every iteration's
    # distance math on one core; a no-op at real scale (scan splits >
    # cores already). The shared (id, double-vec) projection is NOT
    # persisted: measured at sf0.1 the cache materialization costs
    # more than the per-round re-scan it saves (1.5 s → 2.3 s), and at
    # real scale the training input is a bounded sample, not 100 TB.
    base = _spread(df).select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )
    if np_rounds is None:
        np_rounds = k > _LITERAL_K_MAX
    with _no_aqe(df.sparkSession):
        if initial_centroids is not None:
            centroids = [list(c) for c in initial_centroids]
        else:
            centroids = init_centroids(base, "vec", "id", k)
        for _ in range(max_iter):
            new_centroids = [list(c) for c in centroids]
            if np_rounds:
                # fold-exact numpy partials; the final mean is the same
                # double(sum)/count/1e10 _portable_mean computes (Python
                # float division IS IEEE double division)
                for r in _round_partials_np(base, centroids):
                    new_centroids[r.cluster][r.pos] = float(r.s) / r.n / 1e10
            else:
                assigned = assign_clusters(base, "vec", "id", centroids)
                # per-dimension exact quantized-integer sums →
                # partition-order-independent, engine-portable means (see
                # _portable_mean). The update is keyed on (cluster, pos) —
                # a narrow 3-column agg instead of a dim-wide one, so
                # codegen stays in one small method and the shuffle payload
                # is still k × dim partials per map task.
                new_rows = (
                    assigned.select(
                        "cluster", F.posexplode("vec").alias("pos", "x")
                    )
                    .groupBy("cluster", "pos")
                    .agg(_portable_mean(F.col("x")).alias("c"))
                    .collect()
                )
                for r in new_rows:
                    new_centroids[r.cluster][r.pos] = r.c
            if new_centroids == centroids:
                break
            centroids = new_centroids
    return (
        assign_clusters(df, vec_col, id_col, centroids).select("id", "cluster"),
        centroids,
    )


# --------------------------------------------------------------------------
# greedy k-center coreset selection (farthest-point traversal) — the
# diversity-based data-selection primitive: pick k points maximizing
# pairwise spread, assign every point to its nearest pick. The greedy
# traversal is the classical 2-approximation to the k-center objective
# (Gonzalez 1985); data-curation pipelines use it to draw a coverage
# sample ("coreset") of an embedding corpus before expensive stages.

# Coordinate quantization scale. FLOOR(x * 1e6) is bit-deterministic
# on any engine (no rounding rule, see _portable_mean), and all
# distances thereafter are EXACT integer sums, so the argmax/argmin
# choices — the part ties would corrupt — are engine-portable.
# BIGINT bound: dim * (2 * scale * max|x|)^2 < 2^63 requires
# max|x| <= sqrt(2^63 / dim) / (2 * scale) — at dim 64, scale 1e6
# that is ~1.9e2, NOT 1.5e3 (r4 ADVICE fixed the arithmetic here);
# unit-norm-ish embeddings (max|x| <= 1) still sit ~2 orders inside.
# Past the bound the integer distance wraps SILENTLY (the numpy int64
# matmul in _kc_counts_np too), so kcenter_select checks the actual
# max quantized coordinate and fails loudly instead of corrupting
# picks — see the guard right after the seed collect.
KC_SCALE = 10**6


def _kc_qvec(vec_col):
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(KC_SCALE))).cast("long"),
    )


def _kc_cents_sql(cents: list[list[int]]) -> str:
    """k x dim literal matrix of quantized centers as one parsed SQL
    expression (the _centroid_array trick, integer flavor)."""
    inner = ",".join(
        "array(" + ",".join(f"{int(x)}L" for x in c) + ")" for c in cents
    )
    return f"array({inner})"


def _kc_mindist_sql(cents: list[list[int]]) -> str:
    """min over chosen centers of the exact integer squared L2
    distance — integer adds commute, so fold order is irrelevant and
    the value matches any engine's sum over the same terms."""
    return (
        f"array_min(transform({_kc_cents_sql(cents)}, c -> "
        "aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y)), "
        "cast(0 as bigint), (acc, x) -> acc + x)))"
    )


def _kc_dist_to_sql(cent: list[int]) -> str:
    """exact integer squared L2 to ONE quantized center literal."""
    arr = "array(" + ",".join(f"{int(x)}L" for x in cent) + ")"
    return (
        f"aggregate(zip_with(q, {arr}, (x, y) -> (x - y) * (x - y)), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )


def _kc_counts_np(base: DataFrame, cents: list[list[int]]) -> DataFrame:
    """(sel_rank, n) cell sizes via an exact int64 BLAS argmin — the
    large-k assignment path. Unlike the float BLAS path in
    _assign_clusters_np, the expansion ||v||² − 2v·c + ||c||² is
    BITWISE-equal to the per-dimension fold here: every operand is an
    int64 and integer arithmetic has no rounding, so the two paths
    cannot argmin differently (asserted by the path-parity test).
    np.argmin's first-minimum == the earlier pick, matching the
    (dist, rank) struct ordering."""
    import numpy as np
    import pandas as pd

    cmat = np.asarray(cents, dtype=np.int64)
    cnorm = (cmat * cmat).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.asarray(list(pdf["q"]), dtype=np.int64)
            d = cnorm - 2 * (v @ cmat.T)  # ||v||² constant per row
            yield pd.DataFrame({"sel_rank": np.argmin(d, axis=1) + 1})

    return (
        base.mapInPandas(assign, schema="sel_rank long")
        .groupBy("sel_rank")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def kcenter_select(df: DataFrame, vec_col: str, id_col: str, k: int = 8,
                   incremental: bool | None = None):
    """(sel_rank, vec_id, dist_fp, n_assigned) — the k greedy k-center
    picks in selection order with the coverage radius at selection
    time (dist_fp = the point's min squared distance to the previously
    chosen centers, quantized at KC_SCALE; the seed's is 0) and the
    size of each pick's final nearest-center cell (ties to the earlier
    pick).

    Execution shape: the seed is the minimum-id point; each of the
    k - 1 rounds is ONE map-only scan feeding a TakeOrdered argmax —
    per-partition top-1 heaps, no global sort — collecting exactly one
    row; nothing data-sized ever reaches the driver. Two bitwise-
    identical round strategies (``incremental=None`` switches on
    k > _LITERAL_K_MAX, the codegen-budget threshold):

    - small k RECOMPUTES min-dist from the literal center matrix each
      round — zero shuffle, zero state, O(n·k²/2) total distance
      folds (cheapest below the crossover; the registry default);
    - large k MAINTAINS the running min-dist with one LEAST per round
      over a localCheckpointed frame (the pagerank round pattern) —
      O(n·k) total, and the per-round plan stays one small expression
      instead of a k-wide literal tree that would fall out of codegen
      (the _LITERAL_K_MAX lesson). Assignment above the same
      threshold rides an exact int64 BLAS argmin (see _kc_counts_np —
      integer arithmetic makes the matmul expansion bitwise-equal,
      unlike the float case).
    """
    import math

    from pyspark.sql import Observation

    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("id"), _kc_qvec(vec_col).alias("q")
    ).persist()
    if incremental is None:
        incremental = k > _LITERAL_K_MAX
    # Overflow guard (r4 ADVICE): rides the seed's TakeOrdered job as an
    # Observation (every row passes the metrics node before the local
    # top-1, and MAX is retry/speculation-safe, unlike counts), so it
    # costs no extra scan. Past the bound the BIGINT fold AND the numpy
    # int64 matmul wrap silently — fail loudly instead.
    obs = Observation()
    seed_rows = (
        base.observe(
            obs,
            F.max(
                F.expr("array_max(transform(q, x -> abs(x)))")
            ).alias("qmax"),
        )
        .orderBy("id")
        .limit(1)
        .collect()
    )
    seed = seed_rows[0]
    dim = len(seed.q)
    qmax = int(obs.get["qmax"] or 0)
    qbound = math.isqrt((2**63 - 1) // max(dim, 1)) // 2
    if qmax > qbound:
        # Loud-failure path must not leak the persisted frame in the
        # CacheManager (r5 ADVICE).
        base.unpersist()
        raise ValueError(
            f"kcenter_select: max |quantized coordinate| {qmax} exceeds the "
            f"BIGINT-safe bound {qbound} at dim {dim} (KC_SCALE={KC_SCALE}); "
            "integer distances would wrap silently — rescale the input or "
            "lower KC_SCALE"
        )
    # (rank, id, dist-at-selection, quantized vector)
    chosen = [(1, seed.id, 0, list(seed.q))]
    dframe = None
    if incremental:
        dframe = base.select(
            "id", "q", F.expr(_kc_dist_to_sql(chosen[0][3])).alias("d")
        ).localCheckpoint()
    for r in range(2, k + 1):
        if incremental:
            probe = dframe
        else:
            probe = base.select(
                "id", "q",
                F.expr(_kc_mindist_sql([c[3] for c in chosen])).alias("d"),
            )
        far = probe.orderBy(F.desc("d"), F.asc("id")).limit(1).collect()
        if not far or far[0].d == 0:
            # max min-distance 0 = every point coincides with a chosen
            # center: the corpus has < k distinct points and further
            # picks would be duplicates. Greedy radii are
            # non-increasing, so stopping at the first zero equals the
            # oracle's dist_fp > 0 filter over the unrolled rounds.
            break
        row = far[0]
        chosen.append((r, row.id, row.d, list(row.q)))
        if incremental and r < k:
            dframe = dframe.select(
                "id", "q",
                F.least(
                    F.col("d"), F.expr(_kc_dist_to_sql(list(row.q)))
                ).alias("d"),
            ).localCheckpoint()
    cents = [c[3] for c in chosen]
    if len(cents) > _LITERAL_K_MAX:
        counts = _kc_counts_np(base, cents)
    else:
        # nearest chosen center per point, ties to the earlier pick —
        # (dist, rank) structs compare field-by-field, so array_min IS
        # the lexicographic argmin.
        asg = (
            "array_min(transform("
            + _kc_cents_sql(cents)
            + ", (c, i) -> struct("
            "aggregate(zip_with(q, c, (x, y) -> (x - y) * (x - y)), "
            "cast(0 as bigint), (acc, x) -> acc + x) as d, "
            "i + 1 as r)))"
        )
        counts = (
            base.select(F.expr(f"({asg}).r").cast("long").alias("sel_rank"))
            .groupBy("sel_rank")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    meta = spark.createDataFrame(
        [(int(r), int(i), int(d)) for r, i, d, _ in chosen],
        "sel_rank long, vec_id long, dist_fp long",
    )
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.dedup import release_after

    out = (
        meta.join(counts, "sel_rank", "left")
        .select(
            "sel_rank", "vec_id", "dist_fp",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_assigned"),
        )
        .orderBy("sel_rank")
    )
    # k rows: checkpoint eagerly and release the quantized-vector cache
    # (CacheManager holds persisted frames until explicit unpersist)
    return release_after(out, base)


def _kc_dot_to_sql(vec: list[int]) -> str:
    """exact integer dot product of ``q`` with ONE quantized literal."""
    arr = "array(" + ",".join(f"{int(x)}L" for x in vec) + ")"
    return (
        f"aggregate(zip_with(q, {arr}, (x, y) -> x * y), "
        "cast(0 as bigint), (acc, x) -> acc + x)"
    )


def mmr_select(df: DataFrame, vec_col: str, id_col: str, k: int = 8):
    """(sel_rank, vec_id, rel_fp, mmr_fp) — Maximal Marginal Relevance
    selection (Carbonell & Goldstein 1998) with λ = 1/2: the k greedy
    picks that balance relevance to a query vector against redundancy
    with what is already selected — the diversity-aware reranking step
    of retrieval/RAG pipelines (kcenter_select is its pure-diversity,
    no-query sibling).

    The query is the minimum-id vector (collected once, excluded from
    candidates). Scores stay EXACT BIGINT end-to-end: coordinates
    FLOOR-quantize at KC_SCALE, relevance is the integer dot product
    with the query, and with λ = 1/2 the argmax of
    λ·rel − (1−λ)·max_sim is the argmax of ``rel − max_sim`` — no
    float ever enters, so every tie (the classic MMR instability)
    breaks deterministically by (score desc, id asc) in any engine.
    Pick 1 is pure relevance (max over an empty selected set
    contributes nothing): its mmr_fp equals rel_fp.

    Execution shape mirrors kcenter_select's small-k variant: each
    round is ONE map-only scan over the persisted quantized frame with
    the chosen vectors as plan literals (k ≤ _LITERAL_K_MAX keeps the
    expression inside the codegen budget) feeding a TakeOrdered top-1;
    already-picked ids are excluded with a literal isin, exactly k
    driver rows ever materialize, and the k-row result releases the
    cache via release_after. Overflow guard rides the first job's
    Observation: |rel − max_sim| ≤ 2·qmax²·dim must fit in int64.
    """
    import math

    from pyspark.sql import Observation

    if k > _LITERAL_K_MAX:
        # Loud failure, not silent degradation (r6 ADVICE): past the
        # codegen budget the per-round greatest() over k literal dot
        # folds grows O(k*dim) and falls out of whole-stage codegen.
        # The scale path is kcenter_select's incremental running-max
        # strategy; nothing oracle-backed needs k > _LITERAL_K_MAX.
        raise ValueError(
            f"mmr_select: k={k} exceeds _LITERAL_K_MAX="
            f"{_LITERAL_K_MAX}; the literal score tree would leave the "
            "codegen budget — use kcenter_select's incremental "
            "running-max-sim strategy for large k"
        )
    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("id"), _kc_qvec(vec_col).alias("q")
    ).persist()
    obs = Observation()
    qrows = (
        base.observe(
            obs,
            F.max(F.expr("array_max(transform(q, x -> abs(x)))")).alias("qmax"),
        )
        .orderBy("id")
        .limit(1)
        .collect()
    )
    if not qrows:
        base.unpersist()
        return spark.createDataFrame(
            [], "sel_rank long, vec_id long, rel_fp long, mmr_fp long"
        )
    qrow = qrows[0]
    qv, qid, dim = list(qrow.q), qrow.id, len(qrow.q)
    qmax = int(obs.get["qmax"] or 0)
    qbound = math.isqrt((2**63 - 1) // max(2 * dim, 1))
    if qmax > qbound:
        base.unpersist()  # loud-failure path must not leak (r5 ADVICE)
        raise ValueError(
            f"mmr_select: max |quantized coordinate| {qmax} exceeds the "
            f"BIGINT-safe bound {qbound} at dim {dim} (KC_SCALE={KC_SCALE}); "
            "integer scores would wrap silently — rescale the input"
        )
    rel = F.expr(_kc_dot_to_sql(qv))
    chosen: list[tuple[int, int, int, int]] = []  # (rank, id, rel, score)
    picked_vecs: list[list[int]] = []
    for r in range(1, k + 1):
        cand = base.filter(F.col("id") != qid)
        if chosen:
            cand = cand.filter(
                ~F.col("id").isin([c[1] for c in chosen])
            )
            max_sim = F.greatest(
                *[F.expr(_kc_dot_to_sql(v)) for v in picked_vecs]
            ) if len(picked_vecs) > 1 else F.expr(_kc_dot_to_sql(picked_vecs[0]))
            score = (rel - max_sim).alias("score")
        else:
            score = rel.alias("score")
        top = (
            cand.select("id", "q", rel.alias("rel"), score)
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        chosen.append((r, row.id, int(row.rel), int(row.score)))
        picked_vecs.append(list(row.q))
    out = spark.createDataFrame(
        [(r, i, rl, sc) for r, i, rl, sc in chosen],
        "sel_rank long, vec_id long, rel_fp long, mmr_fp long",
    ).orderBy("sel_rank")
    from data_engineering_demo_real_time_city_mood_tracker_spark.operators.dedup import release_after

    return release_after(out, base)
