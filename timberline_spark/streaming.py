"""Structured Streaming analog of the ingest path (SURVEY.md §2.9).

The reference is a continuous collector (5 s flush micro-batches,
``helm/timberline/templates/fluent-bit-configmap.yaml:12``; late/future data
rejection ``log-ingestor/internal/models/log.go:51-63``). The Spark
expression of the same semantics:

- ``readStream`` file source over the transcripts table directory
- the SAME parse/enrich/route functions as the batch path (one codebase,
  two execution modes)
- ``withWatermark("ts", ...)`` + tumbling ``window()`` aggregation for the
  per-window level counts
- exactly-once via checkpointing (vs the reference's drop-on-full channel
  and retry_limit 1 — documented upgrade, SURVEY.md §2.9)

The demo/test uses ``Trigger.AvailableNow`` so it is deterministic and
finite; on a cluster the same query runs with a processing-time trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .enrich import enrich_turns
from .parse import parse_turns
from .route import classify_turns

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string,"
    " ts timestamp"
)


def stream_level_counts(
    spark: SparkSession,
    src_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed level counts over a streaming transcripts source.

    Returns the streaming DataFrame (caller attaches the sink). Late data
    beyond the watermark is dropped — the streaming expression of the
    reference's validity-window rejection.
    """
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )
    classified = classify_turns(enrich_turns(spark, parse_turns(stream)))
    return (
        classified.filter(F.col("is_valid"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("level"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "level",
            "n",
        )
    )


def run_available_now(
    spark: SparkSession, src_dir: str, checkpoint_dir: str, query_name: str
) -> DataFrame:
    """Drain the source with AvailableNow into a memory sink; return result."""
    q = (
        stream_level_counts(spark, src_dir, checkpoint_dir)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def batch_level_counts(spark: SparkSession, src_dir: str, window: str = "1 hour") -> DataFrame:
    """The identical aggregation in batch mode (streaming/batch parity check)."""
    df = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(src_dir)
    classified = classify_turns(enrich_turns(spark, parse_turns(df)))
    return (
        classified.filter(F.col("is_valid"))
        .groupBy(F.window("ts", window).alias("w"), F.col("level"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "level",
            "n",
        )
    )
