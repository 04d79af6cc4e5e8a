"""Iterative graph operator: connected components via min-label
propagation — the clustering step of near-duplicate deduplication
(pairs → dup groups).

This is the one genuinely iterative algorithm in the engine: a driver
loop over DataFrame ops (the GraphX/Pregel pattern), with
``localCheckpoint`` truncating lineage each round so plans don't grow
exponentially. Converges in O(graph diameter) rounds; dup clusters are
shallow (diameter ≤ a few), so 5-10 rounds in practice. Each round is
one shuffle join + one aggregation, all keyed on vertex id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster) for every vertex appearing in ``edges``; cluster =
    min vertex id of the component (deterministic canonical label)."""
    jsc = edges.sparkSession.sparkContext._jsc
    pre_ids = set(jsc.getPersistentRDDs().keys())
    und = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    und = und.union(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    # seed label(v) = min(v, neighbors(v)) in ONE aggregation — this IS
    # the first propagation round, fused with vertex extraction (saves
    # a full join round; near-dup pair graphs are clique-heavy, so the
    # loop below usually just confirms the fixed point once).
    labels = (
        und.select(F.col("dst").alias("id"), F.least("src", "dst").alias("label"))
        .groupBy("id")
        .agg(F.min("label").alias("label"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        prop = (
            und.join(labels, und.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        # carry a per-row improvement flag so convergence detection is a
        # scan of the checkpointed frame — no extra join/shuffle job.
        new_labels = (
            labels.join(prop, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
                (F.col("nlabel") < F.col("label")).alias("improved"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("improved").limit(1).count()
        labels = new_labels.select("id", "label")
        if changed == 0:
            break
    # the result depends only on the final checkpoint; drop the
    # superseded per-iteration blocks (they bypass the SQL cache
    # manager and would otherwise linger in the block manager).
    live = jsc.getPersistentRDDs()
    new_ids = sorted(set(live.keys()) - pre_ids)
    for rid in new_ids[:-1]:
        if rid in live:
            live[rid].unpersist()
    return labels.select("id", F.col("label").alias("cluster"))
