#!/usr/bin/env python
"""Micro-probe: what limits parse-phase scaling? Child runs one config."""
import json
import os
import shutil
import subprocess
import sys
import time


def child(cores, mode, trials):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from timberline_spark import route
    from timberline_spark.enrich import enrich_turns
    from timberline_spark.parse import JSON_SCHEMA, parse_turns
    from timberline_spark.session import get_spark

    extra = {}
    if os.environ.get("PROBE_GC"):
        extra["spark.driver.extraJavaOptions"] = os.environ["PROBE_GC"]
    spark = get_spark("probe", cores=cores, shuffle_partitions=64, extra_conf=extra)
    tr = spark.read.parquet(os.environ["PROBE_INPUT"])

    if mode == "classify":
        df = route.classify_turns(enrich_turns(spark, parse_turns(tr)))
        q = df.select(F.sum(F.xxhash64("conv_id", "turn_idx", "level", "message") % 1000003))
    elif mode == "fromjson":
        q = tr.select(
            F.sum(F.xxhash64(F.from_json("text", JSON_SCHEMA)["message"]) % 1000003)
        )
    elif mode == "regex":
        q = tr.select(
            F.sum(F.xxhash64(F.regexp_extract("text", r"^([A-Z0-9-]+)", 1)) % 1000003)
        )
    elif mode == "scanhash":
        q = tr.select(F.sum(F.xxhash64("text") % 1000003))
    best = None
    for _ in range(trials):
        t0 = time.time()
        q.collect()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(json.dumps({"sec": round(best, 2)}))


def main():
    if sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
        return
    input_table = sys.argv[1]
    shm = "/dev/shm/tl_bench"
    configs = [
        ("scanhash", "8g", ""),
        ("regex", "8g", ""),
        ("fromjson", "8g", ""),
        ("classify", "8g", ""),
        ("classify", "14g", ""),
        ("classify", "8g", "-XX:+UseParallelGC"),
    ]
    print(f"{'mode':12} {'mem':>5} {'gc':>18} {'8c':>7} {'32c':>7} {'eff':>5}")
    for mode, mem, gc in configs:
        times = {}
        for cores in (8, 32):
            env = dict(os.environ, PROBE_INPUT=input_table, TMPDIR=shm,
                       SPARK_LOCAL_DIRS=f"{shm}/probe_{cores}",
                       SPARK_DRIVER_MEM=mem)
            if gc:
                env["PROBE_GC"] = gc
            r = subprocess.run(
                [sys.executable, __file__, "--child", str(cores), mode, "3"],
                env=env, capture_output=True, text=True, check=True)
            shutil.rmtree(f"{shm}/probe_{cores}", ignore_errors=True)
            line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
            times[cores] = json.loads(line)["sec"]
        eff = times[8] / times[32] / 4
        print(f"{mode:12} {mem:>5} {gc:>18} {times[8]:7.2f} {times[32]:7.2f} {eff:5.2f}")


if __name__ == "__main__":
    main()
