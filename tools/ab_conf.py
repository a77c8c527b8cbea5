"""Interleaved A/B of runtime-settable SQL confs over registry queries.

Usage: python tools/ab_conf.py REPS "k=v;k2=v2" query [query ...]

Variant A = session defaults, variant B = the given conf overrides.
Reps interleave A,B,A,B,... per query (bench protocol: episodic host
noise must not sit on one variant). Prints min/median per variant per
query plus the total. Conf keys must be runtime-settable (SQL confs).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from explorer_spark.queries import QUERIES
    from explorer_spark.session import get_spark

    reps = int(sys.argv[1])
    overrides = dict(kv.split("=", 1) for kv in sys.argv[2].split(";") if kv)
    names = sys.argv[3:]
    spark = get_spark()
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    baseline = {k: spark.conf.get(k, None) for k in overrides}

    def set_variant(b: bool):
        for k, v in overrides.items():
            if b:
                spark.conf.set(k, v)
            elif baseline[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, baseline[k])

    walls: dict[tuple, list] = {}
    for rep in range(reps):
        for name in names:
            for variant in ("A", "B"):
                set_variant(variant == "B")
                t0 = time.perf_counter()
                df = QUERIES[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                walls.setdefault((name, variant), []).append(time.perf_counter() - t0)
    set_variant(False)
    tot = {"A": 0.0, "B": 0.0}
    for name in names:
        row = {}
        for v in ("A", "B"):
            xs = walls[(name, v)]
            row[v] = (min(xs), statistics.median(xs))
            tot[v] += min(xs)
        print(
            f"{name:36s} A min {row['A'][0]:7.3f} med {row['A'][1]:7.3f} | "
            f"B min {row['B'][0]:7.3f} med {row['B'][1]:7.3f} | B/A {row['B'][0] / max(row['A'][0], 1e-9):5.2f}"
        )
    print(f"TOTAL(min) A {tot['A']:.3f}  B {tot['B']:.3f}  B/A {tot['B'] / max(tot['A'], 1e-9):.3f}")


if __name__ == "__main__":
    main()
