"""Stress: dedup_embedding's adaptive LSH bit width at 10× corpus —
the r2 verdict item 2 "done" measurement.

Fixed nbits=8 keeps ≤256 buckets forever, so in-bucket candidate
pairs grow O(n²/256); adaptive_nbits pins expected occupancy near 64,
so candidates grow ~linearly (n·occupancy/2). This measures BOTH the
candidate-pair volume (contention-immune) and the operator wall at
sf0.1 (n=2k) vs 10× (n=20k, the generated sf1 embeddings), for
adaptive vs fixed-8. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_demo_real_time_city_mood_tracker_spark.functions import vectors
from data_engineering_demo_real_time_city_mood_tracker_spark.operators import dedup
from data_engineering_demo_real_time_city_mood_tracker_spark.session import get_spark


def _candidates(df, nbits: int) -> int:
    v = df.select(
        F.col("vec_id").alias("id"),
        vectors.sign_bucket(
            F.transform(F.col("embedding"), lambda x: x.cast("double")), nbits
        ).alias("bucket"),
    )
    a, b = v.alias("a"), v.alias("b")
    return a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    ).count()


def main() -> None:
    spark = get_spark("stress_dedup_embedding")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for label, path in (
        ("sf0.1", "/root/testdata/sf0.1"),
        ("x10", os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.scratch/sf1")),
    ):
        emb = spark.read.parquet(f"{path}/embeddings.parquet")
        n = emb.count()
        nbits = dedup.adaptive_nbits(n)
        t = time.time()
        n_pairs = (
            dedup.embedding_near_dup_pairs(emb, "embedding", "vec_id", threshold=0.35)
            .count()
        )
        wall = round(time.time() - t, 2)
        out[label] = {
            "n": n,
            "nbits_adaptive": nbits,
            "candidates_adaptive": _candidates(emb, nbits),
            "candidates_fixed8": _candidates(emb, 8),
            "qualifying_pairs": n_pairs,
            "wall_sec": wall,
        }
    a, b = out["sf0.1"], out["x10"]
    out["candidate_growth_adaptive"] = round(
        b["candidates_adaptive"] / max(1, a["candidates_adaptive"]), 1
    )
    out["candidate_growth_fixed8"] = round(
        b["candidates_fixed8"] / max(1, a["candidates_fixed8"]), 1
    )
    out["wall_growth"] = round(b["wall_sec"] / max(0.01, a["wall_sec"]), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
