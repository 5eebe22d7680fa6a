"""Per-query profile of the bench headline set (guide §1: measure first).

For each headline query, reports with the bench's own methodology
(warm session, fn() + .count()):

    - t_build: wall of fn(spark, sf_dir) — eager work (iterative
      algorithms localCheckpoint inside the call; .collect() of query
      vocabularies) happens here;
    - t_count: wall of the .count() action (the bench's timed action);
    - jobs/stages/tasks: scheduler work per query, via a fresh job group.

Usage: python3 tools/profile_bench.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = args[1:] or BENCH_QUERIES

    from graflo_spark.catalog import ALL_QUERIES as QUERIES
    from graflo_spark.session import get_spark

    spark = get_spark("graflo-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm like bench.py
    warm = "/root/testdata/sf0.001"
    for name in only:
        try:
            QUERIES[name](spark, warm).count()
        except Exception:
            pass
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    print(f"{'query':35s} {'build':>7s} {'count':>7s} {'total':>7s} "
          f"{'jobs':>5s} {'stages':>6s} {'tasks':>6s}")
    for rep in range(2):
        for name in only:
            fn = QUERIES[name]
            group = f"prof-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            jobs = tracker.getJobIdsForGroup(group)
            stages = 0
            tasks = 0
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        stages += 1
                        tasks += si.numTasks
            print(f"{name:35s} {t1 - t0:7.3f} {t2 - t1:7.3f} "
                  f"{t2 - t0:7.3f} {len(jobs):5d} {stages:6d} {tasks:6d}",
                  flush=True)
        print("---")


if __name__ == "__main__":
    main()
