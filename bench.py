#!/usr/bin/env python
"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line::

    {"metric": "e2e_pipeline_sec", "value": N, "unit": "sec",
     "queries": {...per-query sec...}, "sf": "...",
     "throughput_turns_per_sec": T, ...}

Scaling mode (``--scaling``): run the same end-to-end job at two cluster
sizes (default 2 and 8 EXECUTORS) in separate subprocesses (a JVM can't
change its master), print throughput at both plus scaling efficiency
``(T_4N / T_N) / (4N/N)``. This is the sandbox evidence for the
two-cluster-size criterion (no real multi-host cluster available here).

Default executor model: ``--exec-mode local-cluster`` spawns N REAL
executor JVMs (``local-cluster[N,1,mem]`` — separate heaps, GC, code
caches; 1 core + identical memory per executor at both sizes, so N->4N
multiplies executors exactly like adding cluster nodes). This answers the
round-2 objection that single-JVM ``local[N]`` threads share one
allocator/heap and understate cluster scaling. ``--exec-mode threads``
keeps the old local[N] measurement for comparison. Both pairs (2->8 and
4->16) are reported by default so the numbers can't cherry-pick the
least-contended pair.

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

    # JIT/codegen warmup so the first timed query isn't 2-8x inflated:
    # compile the FULL parse+enrich+classify chain, not just the parse
    # subchain (route_errors previously paid ~5s of whole-stage-codegen
    # compilation that the later route queries didn't)
    _force(Q.PIPELINE_QUERIES["parse"](spark, sf_dir).limit(1000))
    _force(Q.PIPELINE_QUERIES["route_errors"](spark, sf_dir).limit(1000))
    # ...and the aggregate chain (dedup -> buckets -> score -> top/summary),
    # on a 3000-row slice of the INPUT (an output .limit() would not shrink
    # the work under an aggregate). Compiles the hash-agg/sort codegen the
    # e2e pipeline and the dedup/report queries execute; no results carry
    # over (different input -> different frames).
    from timberline_spark import aggregate as agg
    from timberline_spark import route
    from timberline_spark.enrich import enrich_turns
    from timberline_spark.parse import parse_turns

    warm_cls = route.classify_turns(
        enrich_turns(spark, parse_turns(load_transcripts(spark, sf_dir).limit(3000)))
    )
    warm_dd = agg.dedup_turns(route.kept_turns(warm_cls), audit=True)
    warm_scored = agg.score_clusters(agg.report_buckets(warm_dd))
    _force(agg.top_issues(warm_scored))
    _force(agg.run_summary(warm_scored))
    # ...and the pipeline's write path (parquet committers, dynamic
    # partition overwrite, metrics/lineage appends): one full run on a
    # 3000-row input table. Purely fixed-cost warmup — the timed run below
    # starts from a fresh out_dir and recomputes everything.
    warm_in = tempfile.mkdtemp(prefix="tl_warm_in_")
    warm_out = tempfile.mkdtemp(prefix="tl_warm_out_")
    try:
        load_transcripts(spark, sf_dir).limit(3000).repartition(4).write.mode(
            "overwrite"
        ).parquet(f"{warm_in}/transcripts")
        run_pipeline(
            spark, sf_dir="", out_dir=warm_out, run_id="warm",
            input_table=f"{warm_in}/transcripts",
        )
    finally:
        shutil.rmtree(warm_in, ignore_errors=True)
        shutil.rmtree(warm_out, ignore_errors=True)

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
            # min-of-2, same policy as e2e below: single shots on this box
            # swing up to ~3x with page-cache/reclaim neighbor noise (r5
            # recorded top_issues 16.18 s vs 3.92 s warm min-of-3 for the
            # same binary). Every trial is a FULL recompute — _force builds
            # a fresh plan from the parquet scan up; nothing is cached.
            best = None
            for _trial in range(2):
                t0 = time.time()
                _force(Q.PIPELINE_QUERIES[name](spark, sf_dir))
                el = time.time() - t0
                best = el if best is None else min(best, el)
            timings[name] = round(best, 3)

    # e2e = min-of-2 FULL runs (fresh out_dir each; every trial recomputes
    # everything — run_pipeline holds no state between runs). This matches
    # the repo's documented methodology (BENCH.md: min-of-N, N>=2, warm
    # JVM); single shots on this box swing 8.5-10.7 s at sf0.1 with
    # page-cache / reclaim state, which is noise, not pipeline cost.
    e2e = None
    for trial in range(2):
        out_dir = tempfile.mkdtemp(prefix="tl_bench_")
        try:
            t0 = time.time()
            run_pipeline(
                spark, sf_dir, out_dir, run_id=f"bench{trial}",
                replicate=replicate,
            )
            el = time.time() - t0
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        e2e = el if e2e is None else min(e2e, el)
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


def _build_input(sf_dir: str, replicate: int, path: str, files: int) -> int:
    """Materialize the transcripts table once (input synthesis, NOT timed —
    the measured job starts from the table, like production would)."""
    from timberline_spark.session import get_spark
    from timberline_spark.transcripts import load_transcripts

    # AQE coalescing must be OFF for the build: it collapses the tiny
    # pre-replication shuffle (100k rows) to 1-2 partitions, and the
    # replicate crossJoin then explodes 128M rows through 2 tasks — the
    # whole build funnels through 2 cores (measured: 2-task stage at 128M).
    spark = get_spark(
        "bench_build", cores=32, shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    tr = load_transcripts(spark, sf_dir, replicate=replicate)
    tr.repartition(files).write.mode("overwrite").parquet(path)
    n = spark.read.parquet(path).count()
    spark.stop()
    return n


EXEC_MEM_MB = 3072  # per-executor memory in local-cluster mode (identical
# at both cluster sizes: N->4N adds executors, never resizes them)


def _time_pipeline_once(
    cores: int, input_table: str, trials: int, exec_mode: str = "threads"
) -> float:
    """Child-process body: run the full pipeline `trials` times (fresh out
    dirs — resume would skip the work), print min seconds."""
    from timberline_spark.pipeline import run_pipeline
    from timberline_spark.session import get_spark

    master = (
        f"local-cluster[{cores},1,{EXEC_MEM_MB}]"
        if exec_mode == "local-cluster"
        else None
    )
    # Scan split size tuned to the input so the SCAN stage has >= ~3 waves
    # of tasks at the larger cluster size: the default 128 MB packing folds
    # the bench input into ~9 partitions, idling half of a 16-executor
    # cluster through the whole parse phase (a real cluster reading a big
    # table gets this from its file layout for free).
    input_bytes = sum(
        os.path.getsize(os.path.join(input_table, f))
        for f in os.listdir(input_table)
        if f.endswith(".parquet")
    )
    split = min(128 << 20, max(8 << 20, input_bytes // (3 * max(cores, 16))))
    # shuffle partitions sized to DATA, not to the core count (what a real
    # cluster does): equal per-task volumes at both parallelism levels, no
    # spill asymmetry. AQE coalesces when 64 is too many.
    spark = get_spark(
        "bench_scale", cores=cores, shuffle_partitions=64, master=master,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            # one-core executors + tmpfs-local shuffle: waiting 3 s (the
            # default) for a PROCESS_LOCAL slot on a cached partition costs
            # far more than a remote read ever would — a standard knob any
            # real deployment tunes with executor shape
            "spark.locality.wait": "0s",
        },
    )
    best = None
    for t in range(trials):
        out_dir = tempfile.mkdtemp(prefix=f"tl_scale_{cores}_")
        try:
            t0 = time.time()
            run_pipeline(
                spark, sf_dir="", out_dir=out_dir, run_id=f"s{t}",
                input_table=input_table,
            )
            el = time.time() - t0
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        best = el if best is None else min(best, el)
    return best


def _subprocess_time(
    cores: int, input_table: str, trials: int = 2, exec_mode: str = "threads"
) -> float:
    # Shuffle dirs + outputs on tmpfs: a real N-executor cluster has N sets
    # of local disks, so storage bandwidth scales with N; a single local
    # disk does not and would mask compute scaling. tmpfs is the honest
    # single-node proxy for per-executor storage (documented in BENCH.md).
    shm = "/dev/shm/tl_bench"
    os.makedirs(shm, exist_ok=True)
    env = dict(
        os.environ,
        TMPDIR=shm,
        SPARK_LOCAL_DIRS=f"{shm}/spark_local_{cores}",
    )
    out = subprocess.run(
        [
            sys.executable, __file__, "--child-time",
            "--cores-small", str(cores), "--input-table", input_table,
            "--trials", str(trials), "--exec-mode", exec_mode,
        ],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    shutil.rmtree(f"{shm}/spark_local_{cores}", ignore_errors=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["sec"]


def run_scaling(
    sf_dir: str,
    pairs: list[tuple[int, int]],
    replicate: int,
    exec_mode: str = "local-cluster",
    trials: int = 3,
) -> dict:
    """N vs 4N evidence: same job, same pre-built input, two cluster sizes,
    min-of-N timings in warm JVMs (JIT/codegen warmup excluded by the min).

    Each (n, 4n) pair is measured independently; every unique size runs
    once (sizes shared between pairs reuse the measurement). Reporting
    MULTIPLE pairs by default is deliberate (round-2 advice): a single
    favorable pair can hide saturation."""
    os.makedirs("/dev/shm/tl_bench", exist_ok=True)
    input_table = (
        tempfile.mkdtemp(prefix="tl_scale_input_", dir="/dev/shm/tl_bench")
        + "/transcripts"
    )
    max_n = max(n for p in pairs for n in p)
    n_turns = _build_input(sf_dir, replicate, input_table, files=max(128, 4 * max_n))
    times: dict[int, float] = {}
    try:
        for n in sorted({n for p in pairs for n in p}):
            times[n] = _subprocess_time(n, input_table, trials=trials, exec_mode=exec_mode)
    finally:
        shutil.rmtree(os.path.dirname(input_table), ignore_errors=True)
    results = []
    for n_small, n_large in pairs:
        thr_s, thr_l = n_turns / times[n_small], n_turns / times[n_large]
        eff = (thr_l / thr_s) / (n_large / n_small)
        results.append(
            {
                "executors_small": n_small,
                "executors_large": n_large,
                "throughput_small": round(thr_s, 1),
                "throughput_large": round(thr_l, 1),
                "e2e_sec_small": round(times[n_small], 3),
                "e2e_sec_large": round(times[n_large], 3),
                "efficiency": round(eff, 3),
            }
        )
    return {
        "metric": "scaling_efficiency",
        "value": results[0]["efficiency"],
        "unit": "ratio",
        "exec_mode": exec_mode,
        "exec_mem_mb": EXEC_MEM_MB if exec_mode == "local-cluster" else None,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "n_turns": n_turns,
        "pairs": results,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    # N -> 4N cluster sizes. In local-cluster mode these are EXECUTOR
    # counts (1 core + EXEC_MEM_MB each — 4N executors is 4x every
    # resource, like adding nodes). Both pairs report by default so the
    # published efficiency can't cherry-pick the least-contended pair.
    ap.add_argument(
        "--pairs", default="2:8,4:16",
        help="comma-separated N:4N cluster-size pairs for --scaling",
    )
    ap.add_argument(
        "--exec-mode", choices=["local-cluster", "threads"],
        default="local-cluster",
        help="local-cluster = real executor JVMs; threads = local[N]",
    )
    ap.add_argument("--cores-small", type=int, default=2, help=argparse.SUPPRESS)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--child-time", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--input-table", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--trials", type=int, default=3, help=argparse.SUPPRESS)
    ap.add_argument("--quiet-env", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if args.child_time:
        sec = _time_pipeline_once(
            args.cores_small, args.input_table, args.trials, args.exec_mode
        )
        result = {"sec": round(sec, 3)}
    elif args.scaling:
        pairs = [
            (int(a), int(b))
            for a, b in (p.split(":") for p in args.pairs.split(","))
        ]
        result = run_scaling(
            sf_dir, pairs, args.replicate, exec_mode=args.exec_mode,
            trials=args.trials,
        )
    else:
        result = run_bench(sf_dir, cpus, replicate=args.replicate)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
