"""Named pipeline queries: (spark, sf_dir) -> DataFrame.

Each function is the DataFrame-API implementation of one pipeline stage;
:mod:`timberline_spark.sqlgen` carries the matching oracle SQL. Column names
and types line up exactly (the driver's compare hashes values after sorting
columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import aggregate as agg
from . import route
from .enrich import enrich_turns
from .parse import parse_turns
from .transcripts import load_transcripts


def _classified(spark: SparkSession, sf_dir: str, impl: str = "native") -> DataFrame:
    tr = load_transcripts(spark, sf_dir)
    return route.classify_turns(enrich_turns(spark, parse_turns(tr, impl=impl)))


def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )


def q_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = parse_turns(load_transcripts(spark, sf_dir))
    return df.select(
        "conv_id", "turn_idx", "grammar", "level_raw", "service", "message", "text_ts_ms"
    )


def q_parse_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same parse, vectorized pandas-UDF grok path (must equal q_parse)."""
    df = parse_turns(load_transcripts(spark, sf_dir), impl="pandas")
    return df.select(
        "conv_id", "turn_idx", "grammar", "level_raw", "service", "message", "text_ts_ms"
    )


def q_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _classified(spark, sf_dir)
    return df.groupBy(
        F.coalesce(F.col("anomaly_reason"), F.lit("valid")).alias("reason")
    ).agg(F.count(F.lit(1)).alias("n"))


def q_enrich_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = enrich_turns(spark, parse_turns(load_transcripts(spark, sf_dir)))
    return (
        df.filter(F.col("level").isNotNull())
        .groupBy("level", "severity", "severity_score", "is_error", "is_warning")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_enrich_tool_role(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = enrich_turns(spark, parse_turns(load_transcripts(spark, sf_dir)))
    return df.groupBy("tool_category", "is_sensitive", "role_class").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_route_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return route.errors_sink(_classified(spark, sf_dir))


def q_route_tool_calls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return route.tool_calls_sink(_classified(spark, sf_dir))


def q_route_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return route.anomalies_sink(_classified(spark, sf_dir))


def q_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _classified(spark, sf_dir)
    return (
        df.filter(F.col("is_valid"))
        .groupBy("keep_level", "keep_sampled")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_kept_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return route.kept_turns(_classified(spark, sf_dir)).select(
        "conv_id",
        "turn_idx",
        "level",
        "service",
        "message",
        F.col("effective_ts_ms").alias("ts_ms"),
    )


def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = agg.dedup_turns(route.kept_turns(_classified(spark, sf_dir)))
    return d.select(
        "dedup_key", "conv_id", "turn_idx", "duplicate_count", "first_ts_ms", "last_ts_ms"
    )


def q_report_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = agg.dedup_turns(route.kept_turns(_classified(spark, sf_dir)))
    return agg.report_buckets(d)


def q_top_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = agg.dedup_turns(route.kept_turns(_classified(spark, sf_dir)))
    return agg.top_issues(agg.score_clusters(agg.report_buckets(d)))


def q_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = agg.dedup_turns(route.kept_turns(_classified(spark, sf_dir)))
    scored = agg.score_clusters(agg.report_buckets(d))
    return agg.run_summary(d, scored).select(
        "total_logs_processed",
        "error_count",
        "warning_count",
        "info_count",
        "error_rate",
        "warning_rate",
        "clusters_found",
        "actionable_count",
        "top_issues_count",
    )


def q_stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window level counts (batch expression of the streaming agg;
    the true readStream path is exercised in tests/test_streaming.py)."""
    from .route import classify_turns

    df = classify_turns(enrich_turns(spark, parse_turns(load_transcripts(spark, sf_dir))))
    return (
        df.filter(F.col("is_valid"))
        .groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour").alias("w"),
            F.col("level"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "level",
            "n",
        )
    )


PIPELINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "transcripts": q_transcripts,
    "parse": q_parse,
    "parse_pandas_udf": q_parse_pandas_udf,
    "validate": q_validate,
    "enrich_severity": q_enrich_severity,
    "enrich_tool_role": q_enrich_tool_role,
    "route_errors": q_route_errors,
    "route_tool_calls": q_route_tool_calls,
    "route_anomalies": q_route_anomalies,
    "sampling": q_sampling,
    "kept_rows": q_kept_rows,
    "dedup": q_dedup,
    "report_buckets": q_report_buckets,
    "top_issues": q_top_issues,
    "summary": q_summary,
    "stream_window_counts": q_stream_window_counts,
}


def _extra_registries():
    """Training-data operators: (queries, oracles). Oracles exist for the
    SQL-expressible ones; the rest get the driver's rows-only check and are
    verified against pure-Python oracles in tests/test_extras.py."""
    from .extras import dedup as dd
    from .extras import multimodal as mm
    from .extras import similarity as sim
    from .extras import textfns as tf

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "doc_token_counts": tf.doc_token_counts,
        "doc_quality": tf.doc_quality,
        "doc_lang_id": tf.doc_lang_id,
        "doc_fingerprint": tf.doc_fingerprint,
        "doc_exact_dedup": dd.doc_exact_dedup,
        "doc_jaccard_pairs": lambda s, d: dd.doc_jaccard_pairs(s, d, 0.2),
        "doc_minhash_lsh_pairs": lambda s, d: dd.doc_minhash_lsh_pairs(s, d, 0.2),
        "doc_simhash": dd.doc_simhash,
        "doc_cosine_neardup": lambda s, d: sim.doc_cosine_neardup(s, d, 0.99),
        "emb_knn_brute": sim.emb_knn_brute,
        "emb_knn_lsh": sim.emb_knn_lsh,
        "multimodal_features": lambda s, d: mm.decode_features(mm.attach_binary(s, d)),
    }
    oracles: dict[str, str] = {
        "doc_token_counts": tf.oracle_token_counts(),
        "doc_quality": tf.oracle_quality(),
        "doc_lang_id": tf.oracle_lang_id(),
        "doc_fingerprint": tf.oracle_fingerprint(),
        "doc_exact_dedup": dd.oracle_exact_dedup(),
        "doc_jaccard_pairs": dd.oracle_jaccard_pairs(0.2),
        "emb_knn_brute": sim.oracle_knn_brute(),
    }
    return queries, oracles


EXTRA_QUERIES, EXTRA_ORACLES = _extra_registries()
