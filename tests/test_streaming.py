"""Structured Streaming ingest analog: streaming result == batch result."""

from __future__ import annotations

import shutil
import tempfile

from timberline_spark.streaming import (
    batch_level_counts,
    run_available_now,
    run_dedup_examples_available_now,
)
from timberline_spark.transcripts import load_transcripts

from .conftest import SF_TINY, normalize


def test_streaming_equals_batch(spark):
    src = tempfile.mkdtemp(prefix="tl_stream_src_")
    ckpt = tempfile.mkdtemp(prefix="tl_stream_ckpt_")
    try:
        # stage the transcripts as multiple files (multiple micro-batches
        # via maxFilesPerTrigger)
        tr = load_transcripts(spark, SF_TINY)
        tr.repartition(16).write.mode("overwrite").parquet(src)

        stream_result = run_available_now(spark, src, ckpt, "stream_counts")
        batch_result = batch_level_counts(spark, src)

        s = normalize(stream_result.toPandas())
        b = normalize(batch_result.toPandas())
        assert len(s) > 0
        assert s.equals(b)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stateful_streaming_dedup_equals_batch(spark):
    """§2.9d: applyInPandasWithState first-3-examples dedup == the batch
    dedup_examples operator when arrival order equals the batch sort order
    (single micro-batch over a ts-sorted source)."""
    from timberline_spark import aggregate as agg
    from timberline_spark import route
    from timberline_spark.enrich import enrich_turns
    from timberline_spark.parse import parse_turns

    src = tempfile.mkdtemp(prefix="tl_sdedup_src_")
    ckpt = tempfile.mkdtemp(prefix="tl_sdedup_ckpt_")
    try:
        rows = []
        for i in range(30):
            # 5 distinct messages x 6 occurrences, strictly increasing ts
            msg = f"Connection refused to shard-{i % 5}"
            ts = f"2024-01-05 10:{i // 60:02d}:{i % 60:02d}"
            rows.append(
                (f"conv-{i % 3:09d}", i, "user",
                 f"{ts} ERROR [svc-1] {msg}", "bash")
            )
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, tool string"
        ).selectExpr("conv_id", "turn_idx", "role", "text", "tool",
                     "timestamp'2024-01-05 10:00:00' as ts")
        df.orderBy("text").coalesce(1).write.mode("overwrite").parquet(src)

        streamed = run_dedup_examples_available_now(
            spark, src, ckpt, "sdedup", max_files_per_trigger=100
        )
        kept = route.kept_turns(
            route.classify_turns(
                enrich_turns(spark, parse_turns(spark.read.parquet(src)))
            )
        )
        batch = agg.dedup_examples(kept).select(
            "dedup_key", "example_rank", "conv_id", "turn_idx", "level",
            "message", "ts_ms"
        )
        s = normalize(streamed.toPandas())
        b = normalize(batch.toPandas())
        assert len(s) == 15  # 5 keys x 3 examples
        assert s.equals(b)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
