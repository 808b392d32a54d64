"""Deterministic job/stage/task counts for a query (round-11
optimization evidence): wall-clock on this sandbox swings 2-3x with
invisible host-neighbor load, but the NUMBER of Spark jobs, stages and
tasks a query schedules is a property of the code — the honest
before/after metric for action-count optimizations (and per guide §2,
every job/stage removed is real scheduling + commit latency at any
scale).

Usage: python tools/job_count_r11.py <query> [query ...]

Runs each query once on a warm session inside a job group and prints
jobs/stages/tasks from the status tracker, plus wall seconds (noisy,
informational).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dbcut_spark.operators.pinning import release_pinned
    from dbcut_spark.queries import QUERIES
    from dbcut_spark.session import get_spark

    spark = get_spark("job-count-r11")
    sc = spark.sparkContext
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    tracker = sc.statusTracker()

    def sentinel() -> int:
        # job ids are monotonically increasing; bracketing the query
        # with sentinel jobs counts EVERY job in between — including
        # ones submitted from worker threads (job groups are
        # thread-local and would miss those)
        sc.setJobGroup("jc-sentinel", "sentinel")
        sc.parallelize([1], 1).count()
        sc.setJobGroup(None, None)
        return max(tracker.getJobIdsForGroup("jc-sentinel"))

    for name in names:
        lo = sentinel()
        t0 = time.perf_counter()
        n = QUERIES[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        hi = sentinel()
        job_ids = [j for j in range(lo + 1, hi)]
        stages = 0
        tasks = 0
        for j in job_ids:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    stages += 1
                    tasks += si.numTasks
        print(
            f"{name}: jobs={len(job_ids)} stages={stages} tasks={tasks} "
            f"rows={n} wall={wall:.2f}s"
        )
        release_pinned()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
