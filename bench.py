#!/usr/bin/env python
"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line::

    {"metric": "e2e_pipeline_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": "...",
     "throughput_turns_per_sec": T, ...}

Scaling mode (``--scaling``): run the same end-to-end job at two
parallelism levels (default 8 and 32 cores) in separate subprocesses (a JVM
can't change its master), print throughput at both plus scaling efficiency
``(T_4N / T_N) / (4N/N)``. This is the sandbox evidence for the two-cluster-
size criterion (no real cluster available here).

Each per-query timing forces full column materialization via a
xxhash64-checksum aggregate (a bare count() would let Catalyst prune the
parsed columns and skip the regex work).
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


def _force(df) -> int:
    """Materialize every column: sum a per-row hash; return row count."""
    from pyspark.sql import functions as F

    row = df.select(
        F.count(F.lit(1)).alias("n"),
        # modulo keeps the ANSI sum from overflowing long
        F.sum(F.xxhash64(*df.columns) % F.lit(1_000_000_007)).alias("checksum"),
    ).collect()[0]
    return row["n"]


def run_bench(sf_dir: str, cpus: int, replicate: int = 1) -> dict:
    from timberline_spark import queries as Q
    from timberline_spark.pipeline import run_pipeline
    from timberline_spark.session import get_spark
    from timberline_spark.transcripts import load_transcripts

    spark = get_spark("timberline_bench", cores=cpus, shuffle_partitions=cpus)
    n_turns = load_transcripts(spark, sf_dir, replicate=replicate).count()

    timings: dict[str, float] = {}
    bench_queries = [
        "parse",
        "parse_pandas_udf",
        "route_errors",
        "route_tool_calls",
        "route_anomalies",
        "kept_rows",
        "dedup",
        "report_buckets",
        "top_issues",
        "summary",
    ]
    if replicate == 1:  # per-query timings only in the default (driver) mode
        for name in bench_queries:
            t0 = time.time()
            _force(Q.PIPELINE_QUERIES[name](spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)

    out_dir = tempfile.mkdtemp(prefix="tl_bench_")
    try:
        t0 = time.time()
        run_pipeline(spark, sf_dir, out_dir, run_id="bench", replicate=replicate)
        e2e = time.time() - t0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    timings["e2e_pipeline"] = round(e2e, 3)

    return {
        "metric": "e2e_pipeline_sec",
        "value": round(e2e, 3),
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "n_turns": n_turns,
        "cpus": cpus,
        "replicate": replicate,
        "throughput_turns_per_sec": round(n_turns / e2e, 1),
    }


def _subprocess_bench(sf_dir: str, cpus: int, replicate: int) -> dict:
    """Run one bench in a fresh JVM/process; parse its JSON line."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, __file__, "--replicate", str(replicate), "--quiet-env"],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run_scaling(sf_dir: str, n_small: int, n_large: int, replicate: int) -> dict:
    small = _subprocess_bench(sf_dir, n_small, replicate)
    large = _subprocess_bench(sf_dir, n_large, replicate)
    t_s = small["throughput_turns_per_sec"]
    t_l = large["throughput_turns_per_sec"]
    eff = (t_l / t_s) / (n_large / n_small)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": small["sf"],
        "n_turns": small["n_turns"],
        "cores_small": n_small,
        "cores_large": n_large,
        "throughput_small": t_s,
        "throughput_large": t_l,
        "e2e_sec_small": small["value"],
        "e2e_sec_large": large["value"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cores-small", type=int, default=8)
    ap.add_argument("--cores-large", type=int, default=32)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--quiet-env", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if args.scaling:
        result = run_scaling(sf_dir, args.cores_small, args.cores_large, args.replicate)
    else:
        result = run_bench(sf_dir, cpus, replicate=args.replicate)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
