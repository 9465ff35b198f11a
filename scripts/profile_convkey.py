"""Profile conv_key hash variants at sf0.1 (round-5 bench-regression triage).

Measures the marginal cost of the conv_key column on top of the parse chain:
  none     — parse chain, no conv_key
  hof      — current char_hash (sequence/transform/aggregate HOFs, full string)
  unrolled — bounded conv hash: first 8 + last 8 chars + length, flat
             codegen-able arithmetic (no arrays, no HOF lambdas)

Min-of-3 in a warm JVM, rebuilding the DataFrame each trial (Spark 4 reuses
materialized results for the SAME DataFrame object).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from timberline_spark.extras.xhash import CHAR_MULT, HASH_MOD, char_hash
from timberline_spark.parse import parse_turns
from timberline_spark.session import get_spark
from timberline_spark.transcripts import load_transcripts

SF = "/root/testdata/sf0.1"


def conv_key_unrolled(col):
    L = F.length(col)
    start2 = F.greatest(L - F.lit(7), F.lit(9))
    h = F.lit(0).cast("long")
    for i in range(1, 9):
        c = F.ascii(F.substring(col, i, 1)).cast("long")
        h = (h * CHAR_MULT + c) % HASH_MOD
    for i in range(8):
        c = F.ascii(col.substr(start2 + F.lit(i), F.lit(1))).cast("long")
        h = (h * CHAR_MULT + c) % HASH_MOD
    return (h * CHAR_MULT + L.cast("long")) % HASH_MOD


def force(df):
    cols = [
        F.to_json(F.col(f.name)) if f.dataType.typeName() == "map" else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols) % F.lit(1_000_000_007)).alias("c"),
    ).collect()[0]["n"]


def build(spark, variant):
    tr = load_transcripts(spark, SF)
    df = parse_turns(tr, impl="native")  # includes current HOF conv_key
    df = df.drop("conv_key")
    if variant == "hof":
        df = df.withColumn("conv_key", char_hash(F.col("conv_id")))
    elif variant == "unrolled":
        df = df.withColumn("conv_key", conv_key_unrolled(F.col("conv_id")))
    return df


def main():
    spark = get_spark("profile_convkey", cores=32, shuffle_partitions=32)
    # warmup: compile all three shapes
    for v in ("none", "hof", "unrolled"):
        force(build(spark, v).limit(1000))
    out = {}
    for v in ("none", "hof", "unrolled"):
        best = None
        for _ in range(3):
            t0 = time.time()
            force(build(spark, v))
            el = time.time() - t0
            best = el if best is None else min(best, el)
        out[v] = round(best, 3)
    print("RESULT", out)
    # sanity: distribution of hash100 buckets for the unrolled variant
    tr = load_transcripts(spark, SF)
    k = tr.select(conv_key_unrolled(F.col("conv_id")).alias("k"))
    n_distinct = k.distinct().count()
    n_conv = tr.select("conv_id").distinct().count()
    print("DISTINCT conv_key", n_distinct, "of", n_conv, "conv_ids")
    spark.stop()


if __name__ == "__main__":
    main()
