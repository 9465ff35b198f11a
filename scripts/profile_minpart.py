"""Measure the AQE 2-task funnel: coalescePartitions.minPartitionSize vs
per-query bench times at sf0.1 (round-5 bench-regression triage)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def force(df):
    cols = [
        F.to_json(F.col(f.name)) if f.dataType.typeName() == "map" else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols) % F.lit(1_000_000_007)).alias("c"),
    ).collect()[0]["n"]


def main():
    variant = sys.argv[1]  # "default" | "small"
    from timberline_spark import queries as Q
    from timberline_spark.session import get_spark

    extra = {}
    if variant == "small":
        extra["spark.sql.adaptive.coalescePartitions.minPartitionSize"] = "64k"
    spark = get_spark("profile_minpart", cores=32, shuffle_partitions=32,
                      extra_conf=extra)
    SF = "/root/testdata/sf0.1"
    names = ["parse", "route_errors", "kept_rows", "dedup", "report_buckets",
             "top_issues", "summary"]
    # warmup
    force(Q.PIPELINE_QUERIES["parse"](spark, SF).limit(1000))
    force(Q.PIPELINE_QUERIES["route_errors"](spark, SF).limit(1000))
    out = {}
    for name in names:
        best = None
        for _ in range(3):
            t0 = time.time()
            force(Q.PIPELINE_QUERIES[name](spark, SF))
            el = time.time() - t0
            best = el if best is None else min(best, el)
        out[name] = round(best, 3)
    print("RESULT", variant, out)
    spark.stop()


if __name__ == "__main__":
    main()
