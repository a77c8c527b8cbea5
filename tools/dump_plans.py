"""Dump .explain('formatted') for named registry queries to files.

Usage: python tools/dump_plans.py <suffix> <query> [query ...]
Writes plans/r12/<query>_<suffix>.txt. The plan is captured WITHOUT
executing the query (initial AQE plan), so checkpoint nodes from prior
materializations cannot hide upstream structure (VERDICT r11 item 10).
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")


def main():
    from explorer_spark.queries import QUERIES
    from explorer_spark.session import get_spark

    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark()
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        plan = buf.getvalue()
        import re
        nx = len(re.findall(r"\bExchange\b", plan))
        print(f"{name}: {len(plan.splitlines())} lines, {nx} Exchange -> {path}")


if __name__ == "__main__":
    main()
