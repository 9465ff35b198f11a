"""Dedup + report aggregation (the reference's analysis layer, batch-first).

Reference semantics re-expressed as single-shuffle Spark plans:

- Duplicate counting (``/root/reference/log-ingestor/internal/storage/
  milvus.go:273-328,354-409``): the reference counts near-duplicates online
  via ANN search; the batch equivalence (SURVEY.md J1/J2) is a groupBy on the
  normalized message key producing ``duplicate_count`` with the earliest
  occurrence as the kept example.
- Cluster grouping (``ai-analyzer/analyzer/storage/milvus_client.py:166-264``
  DBSCAN eps=0.2 min_samples=1): with min_samples=1 this is connected
  components of the similarity graph; the deterministic Spark equivalence is
  a groupBy on the message template fingerprint (digits collapsed).
- Per-cluster aggregates (``ai-analyzer/analyzer/models/log.py:143-155,
  201-204``): unique count, total_log_count (Σ duplicate_count),
  error_count, distinct sources, time range.
- Representative selection (``milvus_client.py:331-349``): most-recent
  ERROR/CRITICAL, else most-recent WARNING, else most-recent — with explicit
  (conv_id, turn_idx) tie-breaks (the reference relies on list order).
- Severity scoring (``ai-analyzer/analyzer/llm/client.py:186-278``): the
  reference asks an LLM; we apply the documented rubric deterministically —
  base score from the representative level, +1 when the cluster is frequent,
  clamped to 10; bucket mapping from ``models/log.py:16-58``; MEDIUM stays
  the unknown/failure default (``client.py:275-276``).
- Summary stats (``analysis/engine.py:108-129``, ``models/log.py:277-319``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dicts import LEVEL_META, SEVERITY_BUCKETS

FREQ_BONUS_THRESHOLD = 10  # clusters with >= 10 total occurrences score +1
TOP_ISSUES_N = 10  # models/log.py:296-299

# Default group-key mode for dedup_turns/dedup_rollup: True shuffles the
# 8-byte xxhash64 of the normalized message (roughly halves shuffle bytes
# on the heaviest stage); False shuffles the exact string key — the escape
# hatch for datasets where the ~n^2/2^65 64-bit collision odds (≈3% at 10^9
# DISTINCT messages) are unacceptable. Both paths produce identical output
# when no collision occurs (tests/test_pipeline.py pins this).
DEDUP_HASH_KEY = True


def _level_priority(col):
    expr = F.lit(0)
    for level, priority, _ in LEVEL_META:
        expr = F.when(col == level, priority).otherwise(expr)
    return expr


def dedup_turns(
    kept: DataFrame,
    extra_keys: tuple[str, ...] = (),
    hash_key: bool | None = None,
    audit: bool = False,
) -> DataFrame:
    """Exact-key dedup: one row per normalized message, with duplicate_count.

    Single shuffle on the group key; representative = earliest
    (effective_ts_ms, conv_id, turn_idx) — deterministic at any parallelism.
    extra_keys prepends grouping columns (e.g. ``("p_date",)`` for the
    per-analysis-date results the reference stores keyed by date,
    analysis_results_store.py:75-131); the global view is recoverable from
    the dated one via :func:`dedup_rollup` (min/sum are associative), so the
    pipeline never runs the wide dedup shuffle twice.

    hash_key (default: module constant DEDUP_HASH_KEY) picks the shuffle
    key: the 8-byte xxhash64 of the normalized message, or the exact string
    key. ``audit=True`` (hash mode only) appends a ``key_collision`` boolean
    per group: min/max of a SECOND independent 64-bit hash within the group
    (16 extra map-side-combined bytes per group, never the string) — any
    group whose members disagree under the second hash merged two distinct
    messages under the first. The pipeline surfaces the sum in _metrics.
    """
    if hash_key is None:
        hash_key = DEDUP_HASH_KEY
    exact = F.lower(F.col("message"))
    # Group on xxhash64(lower(message)), NOT the message itself: the wide
    # dedup shuffle otherwise carries the full message twice (as the group
    # key AND inside the rep struct). The 8-byte key roughly halves
    # shuffle bytes on the heaviest stage; dedup_key is re-derived from the
    # winning rep's message (identical for every group member). A 64-bit
    # collision would merge two unrelated messages into one count — odds
    # ~n^2/2^65 (≈3% at 10^9 DISTINCT messages); pass hash_key=False (or
    # set DEDUP_HASH_KEY = False) to shuffle exact keys instead, or
    # audit=True to keep the cheap key and count collisions.
    df = kept.withColumn("dedup_h", F.xxhash64(exact) if hash_key else exact)
    # min(struct(...)) hash-aggregate instead of a row_number window: gets
    # map-side partial aggregation and avoids the per-partition sort — the
    # difference between "works" and "works at 100 TB". The struct's leading
    # fields (effective_ts_ms, conv_id, turn_idx) are a unique total order,
    # so the winner is deterministic at any parallelism.
    rep = F.struct(
        F.col("effective_ts_ms"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("level"),
        F.col("severity"),
        F.col("severity_score"),
        F.col("is_error"),
        F.col("is_warning"),
        F.col("service"),
        F.col("message"),
        # maps aren't orderable inside min(struct); serialize and restore.
        # Never reached by the comparison: (ts, conv_id, turn_idx) is unique.
        F.to_json(F.col("labels")).alias("labels_json"),
    )
    aggs = [
        F.min(rep).alias("rep"),
        F.count(F.lit(1)).alias("duplicate_count"),
        F.min("effective_ts_ms").alias("first_ts_ms"),
        F.max("effective_ts_ms").alias("last_ts_ms"),
    ]
    extra_cols = []
    if audit and hash_key:
        # independent second hash over a DIFFERENT byte sequence. NOT
        # multi-arg xxhash64(exact, lit): Spark folds that as
        # XXH64("audit", seed=XXH64(exact)) — a chained hash where a
        # first-hash collision implies a second-hash collision, making the
        # sentinel structurally blind. Hashing concat(exact, salt) feeds
        # different bytes, so the two collision events are independent.
        h2 = F.xxhash64(F.concat(exact, F.lit("#audit")))
        aggs += [F.min(h2).alias("_h2min"), F.max(h2).alias("_h2max")]
        extra_cols = [(F.col("_h2min") != F.col("_h2max")).alias("key_collision")]
    elif audit:
        # exact string keys cannot collide; the column still exists so the
        # pipeline's collision metric works in BOTH key modes (the escape
        # hatch must not crash the run it exists to rescue)
        extra_cols = [F.lit(False).alias("key_collision")]
    g = df.groupBy(*extra_keys, "dedup_h").agg(*aggs)
    return g.select(*extra_keys, *_unpack_rep(), *extra_cols)


def _unpack_rep():
    return [
        F.lower(F.col("rep.message")).alias("dedup_key"),
        F.col("rep.conv_id").alias("conv_id"),
        F.col("rep.turn_idx").alias("turn_idx"),
        F.col("rep.level").alias("level"),
        F.col("rep.severity").alias("severity"),
        F.col("rep.severity_score").alias("severity_score"),
        F.col("rep.is_error").alias("is_error"),
        F.col("rep.is_warning").alias("is_warning"),
        F.col("rep.service").alias("service"),
        F.col("rep.message").alias("message"),
        F.from_json(F.col("rep.labels_json"), "map<string,string>").alias("labels"),
        F.col("duplicate_count"),
        F.col("first_ts_ms"),
        F.col("last_ts_ms"),
    ]


def dedup_rollup(
    dated: DataFrame, hash_key: bool | None = None, audit: bool = False
) -> DataFrame:
    """Global dedup derived from a per-date dedup frame WITHOUT re-shuffling
    the raw rows: min(rep)/sum(count)/min/max are associative, and a date
    group's rep carries first_ts_ms == its effective_ts_ms (the min-struct's
    leading field), so re-packing the struct reproduces the exact global
    representative. Input is one row per (date, message) — orders of
    magnitude smaller than the kept stream.

    ``audit=True`` mirrors the :func:`dedup_turns` collision sentinel at
    THIS stage's hashed groupBy (ADVICE round 4: a cross-date 64-bit
    collision introduced here was invisible to the per-date audit): the
    same independent second hash of the incoming ``dedup_key`` strings is
    min/max-aggregated per rollup group, and any per-date ``key_collision``
    verdict present on the input is OR-folded in, so the output column
    covers both hashed-group stages.
    """
    rep = F.struct(
        F.col("first_ts_ms").alias("effective_ts_ms"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("level"),
        F.col("severity"),
        F.col("severity_score"),
        F.col("is_error"),
        F.col("is_warning"),
        F.col("service"),
        F.col("message"),
        F.to_json(F.col("labels")).alias("labels_json"),
    )
    if hash_key is None:
        hash_key = DEDUP_HASH_KEY
    key = F.xxhash64(F.col("dedup_key")) if hash_key else F.col("dedup_key")
    aggs = [
        F.min(rep).alias("rep"),
        F.sum("duplicate_count").alias("duplicate_count"),
        F.min("first_ts_ms").alias("first_ts_ms"),
        F.max("last_ts_ms").alias("last_ts_ms"),
    ]
    extra_cols = []
    has_inherited = "key_collision" in dated.columns
    if audit:
        coll = None
        if hash_key:
            # same independent-byte-stream construction as dedup_turns
            # (concat, NOT multi-arg xxhash64 — that chains seeds)
            h2 = F.xxhash64(F.concat(F.col("dedup_key"), F.lit("#audit")))
            aggs += [F.min(h2).alias("_h2min"), F.max(h2).alias("_h2max")]
            coll = F.col("_h2min") != F.col("_h2max")
        if has_inherited:
            aggs.append(
                F.max(F.col("key_collision").cast("int")).alias("_inherited")
            )
            inherited = F.col("_inherited") == 1
            coll = inherited if coll is None else (coll | inherited)
        extra_cols = [
            (coll if coll is not None else F.lit(False)).alias("key_collision")
        ]
    g = dated.groupBy(key.alias("dedup_h")).agg(*aggs)
    return g.select(*_unpack_rep(), *extra_cols)


def dedup_examples(kept: DataFrame, n_examples: int = 3) -> DataFrame:
    """First-N-examples dedup retention (milvus.go:374-397 with
    MIN_EXAMPLES_BEFORE_EXCLUSION=3, config.go:46): the first 3 occurrences
    of each duplicate group stay stored as examples; later occurrences only
    count. The window partitions on the high-cardinality dedup_key (never a
    global sort), so it parallelizes at any scale."""
    df = kept.withColumn("dedup_key", F.lower(F.col("message")))
    order = [F.col("effective_ts_ms"), F.col("conv_id"), F.col("turn_idx")]
    w = Window.partitionBy("dedup_key").orderBy(*order)
    wc = Window.partitionBy("dedup_key")
    return (
        df.withColumn("example_rank", F.row_number().over(w))
        .withColumn("duplicate_count", F.count(F.lit(1)).over(wc))
        .filter(F.col("example_rank") <= n_examples)
        .select(
            "dedup_key",
            "example_rank",
            "conv_id",
            "turn_idx",
            "level",
            "service",
            "message",
            F.col("effective_ts_ms").alias("ts_ms"),
            "duplicate_count",
        )
    )


def dedup_examples_simhash(kept: DataFrame, n_examples: int = 3) -> DataFrame:
    """First-N-examples dedup keyed by the message's 32-bit SimHash instead
    of the exact normalized string: near-identical messages (differing in a
    few low-weight tokens whose votes don't flip any bit sign) share one
    group. Batch twin of the streaming simhash dedup
    (streaming.stream_dedup_examples key_mode='simhash'); the reference
    dedups at ingest against the growing corpus with cosine > 0.95
    (milvus.go:354-409, config.go:45) — SimHash buckets are the
    shuffle-keyable analog.

    Scale shape: the simhash is a pure per-row projection riding the scan;
    the window partitions on the high-cardinality 32-bit key (never a
    global sort). Hamming-radius > 0 matching needs banded multi-probe
    (see extras.dedup.doc_minhash_lsh_pairs for the banding pattern) — out
    of scope for the first-3-kept retention semantics here.
    """
    from .extras.dedup import with_simhash

    df = with_simhash(
        kept.select(
            "conv_id", "turn_idx", "level", "service", "message",
            "effective_ts_ms",
        ),
        "message",
        "simhash",
    )
    order = [F.col("effective_ts_ms"), F.col("conv_id"), F.col("turn_idx")]
    w = Window.partitionBy("simhash").orderBy(*order)
    wc = Window.partitionBy("simhash")
    return (
        df.withColumn("example_rank", F.row_number().over(w))
        .withColumn("duplicate_count", F.count(F.lit(1)).over(wc))
        .filter(F.col("example_rank") <= n_examples)
        .select(
            "simhash",
            "example_rank",
            "conv_id",
            "turn_idx",
            "level",
            "service",
            "message",
            F.col("effective_ts_ms").alias("ts_ms"),
            "duplicate_count",
        )
    )


def cluster_fingerprint(message_col, level_col):
    """Template fingerprint: level + message with digit runs collapsed."""
    return F.concat_ws(
        "|", level_col, F.regexp_replace(F.lower(message_col), "[0-9]+", "#")
    )


def _bucket_aggs() -> list:
    """The per-cluster aggregate list + min(struct) representative shared
    by the exact and fuzzy report paths — ONE definition so the two paths
    cannot drift. Representative order (milvus_client.py:331-349): priority
    desc, recency desc, then (conv_id, turn_idx) asc — encoded as a
    min(struct) by negating the numeric desc keys, so the whole bucket
    build is one hash aggregate (map-side combinable; no window sort).
    Requires a `level_priority` column on the input."""
    rep = F.struct(
        (-F.col("level_priority")).alias("neg_priority"),
        (-F.col("last_ts_ms")).alias("neg_last_ts"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("level"),
        F.col("message"),
    )
    return [
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("duplicate_count").alias("total_log_count"),
        F.sum(
            F.when(F.col("is_error"), F.col("duplicate_count")).otherwise(F.lit(0))
        ).alias("error_count"),
        F.sum(
            F.when(F.col("is_warning"), F.col("duplicate_count")).otherwise(F.lit(0))
        ).alias("warning_count"),
        # size(collect_set) == countDistinct (both ignore nulls) but stays a
        # SINGLE aggregation layer: countDistinct plans Spark's two-level
        # distinct rewrite — an extra Exchange + aggregate pass over the
        # deduped stream per bucket build (round 7; plan diff 2 Exchange ->
        # 1 for report_buckets). The set is bounded by the service domain.
        F.size(F.collect_set("service")).cast("long").alias("n_sources"),
        F.min("first_ts_ms").alias("first_ts_ms"),
        F.max("last_ts_ms").alias("last_ts_ms"),
        F.min(rep).alias("rep"),
    ]


_BUCKET_OUT = [
    "n_unique",
    "total_log_count",
    "error_count",
    "warning_count",
    "n_sources",
    "first_ts_ms",
    "last_ts_ms",
]


def report_buckets(deduped: DataFrame, extra_keys: tuple[str, ...] = ()) -> DataFrame:
    """Cluster-level aggregates + representative, one shuffle (hash-agg only).

    Like dedup_turns, the shuffle groups on xxhash64(fingerprint) — the
    fingerprint string (level + digit-collapsed message) is re-derived from
    the winning representative, which by construction yields the group's
    fingerprint for any member."""
    df = deduped.withColumn(
        "fp_h",
        F.xxhash64(cluster_fingerprint(F.col("message"), F.col("level"))),
    ).withColumn("level_priority", _level_priority(F.col("level")))
    g = df.groupBy(*extra_keys, "fp_h").agg(*_bucket_aggs())
    return g.select(
        *extra_keys,
        cluster_fingerprint(F.col("rep.message"), F.col("rep.level")).alias(
            "fingerprint"
        ),
        *_BUCKET_OUT,
        F.col("rep.level").alias("rep_level"),
        _truncate_message(F.col("rep.message")).alias("representative_message"),
    )


FUZZY_COSINE_THRESHOLD = 0.9  # template-similarity merge bar (DBSCAN eps analog)


def report_buckets_fuzzy(
    deduped: DataFrame,
    threshold: float = FUZZY_COSINE_THRESHOLD,
    max_iter: int = 20,
) -> DataFrame:
    """Near-miss cluster merging for the report path — the batch analog of
    the reference's DBSCAN eps=0.2 over message embeddings
    (ai-analyzer/analyzer/storage/milvus_client.py:166-264), which merges
    messages that are similar-but-not-identical. The exact path
    (:func:`report_buckets`) groups on the digit-collapsed fingerprint
    only; here, fingerprints whose TEMPLATE TEXT is token-cosine-similar
    (>= threshold) are merged via connected components, so two messages
    one word apart land in one cluster.

    Scale shape: the similarity graph is built over DISTINCT fingerprints
    (the cluster count, orders of magnitude below the row count), with the
    same df-capped candidate generation as doc_cosine_neardup — never
    all-pairs. The resulting (fingerprint -> component) map is tiny and
    broadcast back onto the deduped frame; the bucket aggregation is then
    ONE hash-agg shuffle keyed by component, same as the exact path.

    Output schema = report_buckets plus n_templates (how many exact
    templates merged into the cluster); fingerprint carries the component
    label (the lexicographically-min member fingerprint).
    """
    from .extras.similarity import reliable_checkpoint

    # the dedup frame feeds BOTH the template graph and the final
    # aggregation; persist it so the upstream parse+dedup chain runs once,
    # and checkpoint the (tiny) output so the cache can be dropped before
    # returning — the function leaks no storage
    deduped = deduped.persist()
    comp = fuzzy_component_map(deduped, threshold, max_iter)
    out = reliable_checkpoint(report_buckets_merged(deduped, comp))
    deduped.unpersist()
    return out


def fuzzy_component_map(
    deduped: DataFrame,
    threshold: float = FUZZY_COSINE_THRESHOLD,
    max_iter: int = 20,
) -> DataFrame:
    """(fingerprint, component) map merging token-cosine-similar templates
    via connected components — the reusable half of
    :func:`report_buckets_fuzzy`. Built over DISTINCT fingerprints only;
    the returned frame is component-labeled by the lexicographically-min
    member fingerprint and is tiny (cluster count, not row count). The
    pipeline computes it once and applies it to both the dated and the
    global bucket aggregations."""
    from .extras.similarity import connected_components, cosine_pairs

    fp = cluster_fingerprint(F.col("message"), F.col("level"))
    fps = deduped.select(fp.alias("doc_id")).distinct()
    pairs = cosine_pairs(
        fps.withColumn("text", F.col("doc_id")), threshold
    ).select("doc_a", "doc_b")
    return connected_components(fps, pairs, max_iter).select(
        F.col("doc_id").alias("fingerprint"), "component"
    )


def report_buckets_merged(
    deduped: DataFrame, comp: DataFrame, extra_keys: tuple[str, ...] = ()
) -> DataFrame:
    """Bucket aggregation grouped by fuzzy component instead of exact
    fingerprint: join the (tiny) component map onto the deduped frame, then
    ONE hash-agg shuffle keyed by (*extra_keys, component) — the same scale
    shape as :func:`report_buckets`. No explicit broadcast hint on the map
    join (ADVICE round 4): comp is expected tiny, but forcing broadcast on
    an unexpectedly large distinct-template population risks OOM — AQE
    converts the join to broadcast at runtime when the measured size
    allows, and degrades to shuffle when it doesn't."""
    df = deduped.withColumn(
        "fingerprint", cluster_fingerprint(F.col("message"), F.col("level"))
    ).withColumn("level_priority", _level_priority(F.col("level")))
    merged = df.join(comp, "fingerprint")
    g = merged.groupBy(*extra_keys, "component").agg(
        # single-layer distinct, same rationale as n_sources in _bucket_aggs
        F.size(F.collect_set("fingerprint")).cast("long").alias("n_templates"),
        *_bucket_aggs(),
    )
    return g.select(
        *extra_keys,
        F.col("component").alias("fingerprint"),
        "n_templates",
        *_BUCKET_OUT,
        F.col("rep.level").alias("rep_level"),
        _truncate_message(F.col("rep.message")).alias("representative_message"),
    )


def _truncate_message(c, limit: int = 200):
    """Message truncation for reports (generator.py:93-99)."""
    return F.when(
        F.length(c) > limit, F.concat(F.substring(c, 1, limit - 3), F.lit("..."))
    ).otherwise(c)


def score_clusters(buckets: DataFrame) -> DataFrame:
    """Rule-based severity rubric replacing the reference's LLM scorer."""
    base = F.lit(5)  # unknown level -> MEDIUM default (client.py:275-276)
    for level, _, score in LEVEL_META:
        base = F.when(F.col("rep_level") == level, score).otherwise(base)
    score = F.least(
        F.lit(10),
        base
        + F.when(F.col("total_log_count") >= FREQ_BONUS_THRESHOLD, 1).otherwise(0),
    )
    df = buckets.withColumn("cluster_score", score)
    bucket = F.lit("medium")
    numeric = F.lit(5)
    for lo, hi, name, num in SEVERITY_BUCKETS:
        cond = (F.col("cluster_score") >= lo) & (F.col("cluster_score") <= hi)
        bucket = F.when(cond, name).otherwise(bucket)
        numeric = F.when(cond, num).otherwise(numeric)
    return (
        df.withColumn("cluster_severity", bucket)
        .withColumn("severity_numeric", numeric)
        .withColumn(
            "actionable", F.col("cluster_severity").isin("medium", "high", "critical")
        )
    )


def top_issues(scored: DataFrame, n: int = TOP_ISSUES_N) -> DataFrame:
    """Top-N actionable clusters (W3) with deterministic tie-breaks.

    orderBy().limit(n) plans TakeOrderedAndProject — a parallel partial
    top-k per partition, merged on the driver — instead of a global
    no-partition window over the full cluster table (which would sort it in
    one task at 100x the cluster count; the source of the "No Partition
    Defined" warnings in round 1). Rank is then a row_number window over
    the <= n SURVIVORS only: one bounded single-partition sort of <= n
    rows, the same ROW_NUMBER definition the oracle uses. (Round 7: this
    replaces a broadcast count-of-strictly-smaller self-join + hash
    aggregate — equal output, since the sort keys are a strict total
    order, but three fewer plan stages and no broadcast build job.)
    """
    keys = [
        F.col("cluster_score").desc(),
        F.col("total_log_count").desc(),
        F.col("fingerprint"),
    ]
    top = scored.filter(F.col("actionable")).orderBy(*keys).limit(n)
    return top.select(
        F.row_number().over(Window.orderBy(*keys)).alias("rank"),
        "fingerprint",
        "cluster_severity",
        "cluster_score",
        "total_log_count",
        "error_count",
        "representative_message",
    )


def run_summary(scored: DataFrame, group_keys: tuple[str, ...] = ()) -> DataFrame:
    """One-row run summary (engine.py:108-129, models/log.py:277-319) —
    or one row per group_keys (e.g. per analysis date).

    Computed entirely from the (tiny) scored-buckets frame — the cluster
    sums already carry the dedup-weighted totals, so the expensive dedup
    shuffle runs exactly once per pipeline, not once per report table.
    coalesce(0): an empty window yields a zero-row report, not nulls
    (the reference returns an explicit empty result — engine.py:88-102).
    """
    totals = scored.groupBy(*group_keys).agg(
        F.coalesce(F.sum("total_log_count"), F.lit(0)).alias("total_logs_processed"),
        F.coalesce(F.sum("error_count"), F.lit(0)).alias("error_count"),
        F.coalesce(F.sum("warning_count"), F.lit(0)).alias("warning_count"),
        F.count(F.lit(1)).alias("clusters_found"),
        F.coalesce(
            F.sum(F.when(F.col("actionable"), 1).otherwise(0)), F.lit(0)
        ).alias("actionable_count"),
    )
    return (
        totals
        .withColumn(
            "info_count",
            F.col("total_logs_processed") - F.col("error_count") - F.col("warning_count"),
        )
        .withColumn(
            "error_rate",
            F.round(
                F.col("error_count") * 100.0
                / F.nullif(F.col("total_logs_processed"), F.lit(0)),
                4,
            ),
        )
        .withColumn(
            "warning_rate",
            F.round(
                F.col("warning_count") * 100.0
                / F.nullif(F.col("total_logs_processed"), F.lit(0)),
                4,
            ),
        )
        .withColumn(
            "top_issues_count",
            F.least(F.lit(TOP_ISSUES_N), F.col("actionable_count")).cast("long"),
        )
    )
