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

    # reps INTERLEAVE round-robin across queries (the bench protocol):
    # host noise arrives in multi-second episodic windows, and
    # back-to-back reps all land inside one window — min-of-N then
    # measures the episode, not the engine.
    walls: dict[str, list] = {n: [] for n in names}
    meta: dict[str, tuple] = {}
    for rep in range(reps):
        for name in names:
            fn = QUERIES[name]
            sc.setJobGroup(name, name)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t0)
            if rep == 0:
                ids = tracker.getJobIdsForGroup(name) or ()
                stages = sum(
                    len(tracker.getJobInfo(j).stageIds)
                    for j in ids
                    if tracker.getJobInfo(j)
                )
                meta[name] = (len(ids), stages)
            sc.setJobGroup(None, None)
            df = None
    out = {}
    for name in names:
        rec = {
            "min": round(min(walls[name]), 3),
            "med": round(statistics.median(walls[name]), 3),
            "jobs": meta[name][0],
            "stages": meta[name][1],
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
