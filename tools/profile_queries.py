"""Per-query profiling harness (optimization rounds): for each named
registry query, run it through the noop sink N times in one warm session
and report min/median wall seconds plus the number of Spark JOBS the
query submits (sequential driver round-trips — each is scheduler latency
and, on a noisy host, an exposure window; at scale each is a barrier).

Usage: python tools/profile_queries.py [reps] [query ...]
With no query names, profiles every registry query.
Emits one JSON line per query and a final summary line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from explorer_spark.queries import QUERIES
    from explorer_spark.session import get_spark

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    out = {}
    for name in names:
        fn = QUERIES[name]
        walls = []
        jobs = stages = 0
        for rep in range(reps):
            j0 = len(tracker.getJobIdsForGroup(None) or ())
            sc.setJobGroup(name, name)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            ids = tracker.getJobIdsForGroup(name) or ()
            if rep == 0:
                jobs = len(ids)
                stages = sum(
                    len(tracker.getJobInfo(j).stageIds)
                    for j in ids
                    if tracker.getJobInfo(j)
                )
            sc.setJobGroup(None, None)
            df = None
        rec = {
            "min": round(min(walls), 3),
            "med": round(statistics.median(walls), 3),
            "jobs": jobs,
            "stages": stages,
        }
        out[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
    ranked = sorted(out.items(), key=lambda kv: -kv[1]["min"])
    print(
        json.dumps(
            {
                "summary": [
                    {"query": k, **v} for k, v in ranked[:40]
                ],
                "sf_dir": SF_DIR,
                "reps": reps,
            }
        )
    )


if __name__ == "__main__":
    main()
