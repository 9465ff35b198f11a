#!/usr/bin/env python
"""spark-submit entry point.

    spark-submit --py-files dist/timberline_spark.zip run_pipeline.py \
        --sf-dir /root/testdata/sf0.1 --out /tmp/tl_out --run-id r1

On a real cluster, drop the local session factory by passing
--cores 0 is not needed; the session builder only sets master when
running outside spark-submit (spark-submit's --master wins because
getOrCreate reuses the submitted context).
"""

from timberline_spark.pipeline import main

if __name__ == "__main__":
    main()
