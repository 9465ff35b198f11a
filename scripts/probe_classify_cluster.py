"""Compute-only scaling probe under REAL executor JVMs (local-cluster).

Times the classify stage (parse + enrich + validate + route, checksum
materialization, no writes) at two executor counts. Separates "does the
PLAN scale" from the e2e number, whose write/commit path shares one box's
memory bandwidth. Usage:

    python scripts/probe_classify_cluster.py 4 16 [replicate]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_classify(n_exec: int, input_table: str, trials: int = 3) -> float:
    import subprocess

    out = subprocess.run(
        [sys.executable, __file__, "--child", str(n_exec), input_table, str(trials)],
        capture_output=True,
        text=True,
        check=True,
        env=dict(os.environ, SPARK_LOCAL_DIRS=f"/dev/shm/tl_probe/local{n_exec}"),
    )
    return float([l for l in out.stdout.splitlines() if l.startswith("SEC ")][-1][4:])


def child(n_exec: int, input_table: str, trials: int) -> None:
    from pyspark.sql import functions as F

    from timberline_spark import route
    from timberline_spark.enrich import enrich_turns
    from timberline_spark.parse import parse_turns
    from timberline_spark.session import get_spark

    input_bytes = sum(
        os.path.getsize(os.path.join(input_table, f))
        for f in os.listdir(input_table)
        if f.endswith(".parquet")
    )
    split = min(128 << 20, max(8 << 20, input_bytes // (3 * max(n_exec, 16))))
    spark = get_spark(
        "probe_classify",
        cores=n_exec,
        shuffle_partitions=64,
        master=f"local-cluster[{n_exec},1,3072]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(split),
            "spark.locality.wait": "0s",
        },
    )
    best = None
    for _ in range(trials):
        t0 = time.time()
        df = route.classify_turns(
            enrich_turns(spark, parse_turns(spark.read.parquet(input_table)))
        )
        df.select(
            F.count(F.lit(1)),
            F.sum(F.xxhash64("message", "level", "effective_ts_ms") % F.lit(1_000_000_007)),
        ).collect()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    print(f"SEC {best:.3f}")
    spark.stop()


def main() -> None:
    if sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
        return
    n_small, n_large = int(sys.argv[1]), int(sys.argv[2])
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    os.makedirs("/dev/shm/tl_probe", exist_ok=True)
    input_table = "/dev/shm/tl_probe/transcripts"
    from timberline_spark.session import get_spark
    from timberline_spark.transcripts import load_transcripts

    # coalescing off: AQE otherwise collapses the tiny pre-replication
    # shuffle to 2 partitions and the crossJoin explodes through 2 tasks
    sp = get_spark(
        "probe_build", cores=32, shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    tr = load_transcripts(sp, "/root/testdata/sf0.1", replicate=replicate)
    tr.repartition(128).write.mode("overwrite").parquet(input_table)
    n = sp.read.parquet(input_table).count()
    sp.stop()
    t_s = time_classify(n_small, input_table)
    t_l = time_classify(n_large, input_table)
    eff = (n / t_l) / (n / t_s) / (n_large / n_small)
    print(
        {
            "metric": "classify_scaling_local_cluster",
            "n_turns": n,
            "exec_small": n_small,
            "exec_large": n_large,
            "sec_small": t_s,
            "sec_large": t_l,
            "efficiency": round(eff, 3),
        }
    )


if __name__ == "__main__":
    main()
