"""Structured Streaming ingest analog: streaming result == batch result."""

from __future__ import annotations

import shutil
import tempfile

from timberline_spark.streaming import batch_level_counts, run_available_now
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
