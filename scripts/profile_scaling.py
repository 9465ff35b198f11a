#!/usr/bin/env python
"""Phase-level scaling decomposition: where does 8 -> 32 cores stop helping?

Child mode runs one (cores, phase) cell in a fresh JVM and prints JSON.
Parent mode fans out cells and prints the table. Input table must be
pre-built (use bench._build_input or --build).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def _phase_times(cores: int, input_table: str, trials: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from timberline_spark import aggregate as agg
    from timberline_spark import route
    from timberline_spark.enrich import enrich_turns
    from timberline_spark.parse import parse_turns
    from timberline_spark.pipeline import run_pipeline
    from timberline_spark.session import get_spark

    spark = get_spark("profile", cores=cores, shuffle_partitions=64)
    tr = spark.read.parquet(input_table)
    out: dict[str, float] = {}

    def timed(name, fn):
        best = None
        for _ in range(trials):
            t0 = time.time()
            fn()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        out[name] = round(best, 2)

    def classified():
        return route.classify_turns(enrich_turns(spark, parse_turns(tr)))

    timed("scan_count", lambda: tr.count())
    timed("classify_checksum", lambda: classified().select(
        F.sum(F.xxhash64("conv_id", "turn_idx", "level", "message") % 1000003)
    ).collect())
    d = tempfile.mkdtemp(prefix=f"prof_flat_{cores}_")
    timed("classify_flat_write", lambda: classified().drop("labels").write.mode(
        "overwrite").parquet(f"{d}/flat"))
    timed("classify_part_write", lambda: classified().withColumn(
        "p_date", F.date_format(F.to_timestamp(F.col("effective_ts_ms") / 1000.0), "yyyy-MM-dd")
    ).repartition(F.col("p_date"), F.pmod(F.col("conv_key"), F.lit(4)))
     .write.mode("overwrite").partitionBy("p_date").parquet(f"{d}/part"))
    stage = spark.read.parquet(f"{d}/part")
    timed("dedup_buckets", lambda: agg.score_clusters(
        agg.report_buckets(agg.dedup_turns(route.kept_turns(stage)))).write.mode(
        "overwrite").parquet(f"{d}/buckets"))
    timed("full_pipeline", lambda: run_pipeline(
        spark, sf_dir="", out_dir=tempfile.mkdtemp(prefix=f"prof_pipe_{cores}_"),
        run_id=f"p{time.time()}", input_table=input_table))
    shutil.rmtree(d, ignore_errors=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--input-table", required=True)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--mem", default=None)
    args = ap.parse_args()

    if args.child:
        print(json.dumps(_phase_times(args.cores, args.input_table, args.trials)))
        return

    shm = "/dev/shm/tl_bench"
    os.makedirs(shm, exist_ok=True)
    results = {}
    for cores in (8, 32):
        env = dict(os.environ, TMPDIR=shm, SPARK_LOCAL_DIRS=f"{shm}/prof_{cores}")
        if args.mem:
            env["SPARK_DRIVER_MEM"] = args.mem
        r = subprocess.run(
            [sys.executable, __file__, "--child", "--cores", str(cores),
             "--input-table", args.input_table, "--trials", str(args.trials)],
            env=env, capture_output=True, text=True, check=True)
        shutil.rmtree(f"{shm}/prof_{cores}", ignore_errors=True)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    phases = list(results[8])
    print(f"{'phase':24} {'8c':>8} {'32c':>8} {'speedup':>8} {'eff':>6}")
    for p in phases:
        a, b = results[8][p], results[32][p]
        print(f"{p:24} {a:8.2f} {b:8.2f} {a / b:8.2f} {a / b / 4:6.2f}")


if __name__ == "__main__":
    main()
