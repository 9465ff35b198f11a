#!/usr/bin/env python
"""Capture .explain('formatted') for every registered query to plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt where suffix comes from --suffix
(default: tag's trailing word 'before'/'after').
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUERIES = [
    "parse", "parse_pandas_udf", "route_errors", "route_tool_calls",
    "route_anomalies", "kept_rows", "dedup", "report_buckets",
    "top_issues", "summary",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("suffix", choices=["before", "after"])
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()

    from timberline_spark import queries as Q
    from timberline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("plan_capture", cores=cpus, shuffle_partitions=cpus)
    names = args.queries or BENCH_QUERIES
    os.makedirs(args.outdir, exist_ok=True)
    all_q = dict(Q.PIPELINE_QUERIES) | dict(Q.EXTRA_QUERIES)
    for name in names:
        df = all_q[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = f"{args.outdir}/{name}_{args.suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
