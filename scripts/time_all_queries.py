#!/usr/bin/env python
"""Time every registered query with the noop sink (guide §1.4), min-of-N.

Audit tool for the optimization round: surfaces outliers among the 50
registered queries. Not the driver bench (bench.py is frozen).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("TRIALS", "2"))
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None

    from timberline_spark import queries as Q
    from timberline_spark.session import get_spark

    spark = get_spark("time_all", cores=cpus, shuffle_partitions=cpus)
    all_q = dict(Q.PIPELINE_QUERIES) | dict(Q.EXTRA_QUERIES)
    out = {}
    for name, fn in all_q.items():
        if only and name not in only:
            continue
        best = None
        try:
            for _ in range(trials):
                spark.sparkContext.setJobDescription(f"audit:{name}")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            out[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERR {type(e).__name__}: {e}"[:120]
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
