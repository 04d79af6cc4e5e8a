"""Per-query profiler: for each named registry query report

- construct_sec: Python-side DataFrame build time (includes any bounded
  literal-building collect jobs the operator runs);
- exec_sec: the noop-sink materialization (bench.py's timed action);
- n_jobs / n_stages / n_tasks: Spark jobs run by the query end-to-end
  (construction + execution), via per-query job groups;
- plan file: .explain("formatted") written to --plans-dir if given.

Usage:
    python tools/profile_query.py [--plans-dir DIR] [--suffix SUF] q1 q2 ...
env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_demo_real_time_city_mood_tracker_spark.session import get_spark  # noqa: E402
from data_engineering_demo_real_time_city_mood_tracker_spark.plans.queries import QUERIES  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    from data_engineering_demo_real_time_city_mood_tracker_spark.sources.batch import load_table

    for t in ("events", "documents", "embeddings", "lineitem", "orders", "customer"):
        load_table(spark, sf_dir, t).count()
    QUERIES["pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    out = {}
    for name in args.names:
        group = f"prof_{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        sc.setJobGroup(None, None)

        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numCompletedTasks

        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)

        out[name] = {
            "construct_sec": round(t1 - t0, 3),
            "exec_sec": round(t2 - t1, 3),
            "n_jobs": len(job_ids),
            "n_stages": n_stages,
            "n_tasks": n_tasks,
        }
        spark.catalog.clearCache()
        for rdd in list(sc._jsc.getPersistentRDDs().values()):
            rdd.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
