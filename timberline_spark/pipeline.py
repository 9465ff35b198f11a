"""End-to-end pipeline runner: scan -> parse -> enrich -> route -> sinks.

This is the spark-submit surface. It reproduces the reference's continuous
ingest+analysis flow (CLAUDE.md:27: logs -> parse -> store -> analyze ->
report) as a resumable batch DAG over date partitions:

- every stage output is a partitioned table (parquet here; the layout and
  MERGE-like idempotency map 1:1 onto Iceberg ``PARTITIONED BY (days(ts))``
  when the Iceberg runtime jar is on the classpath — see ``iceberg_ddl``);
- a ``_lineage`` table keyed by (run_id, stage, partition) records committed
  work so a rerun skips finished partitions (the reference's analysis_jobs
  status table, ``ai-analyzer/analyzer/db/models.py:21-40``, generalized to
  per-partition granularity);
- a ``_metrics`` table records rows_in/rows_out/invalid per stage per
  partition (the reference's Prometheus counters,
  ``log-ingestor/internal/handlers/stream.go:108-158``).

Dynamic partition overwrite makes every write idempotent: re-processing a
partition replaces it byte-identically (all transforms are deterministic),
so a crash between "write" and "lineage append" is safe.

Scale notes (the 100 TB story):

- The fan-out computes the classified frame once and writes it as a stage
  table; the four sinks then read that columnar checkpoint instead of
  re-parsing raw text four times.
- Sinks are partitioned by event date -> partition pruning for the daily
  analysis window (engine.py:84-86).
- Hot conversations skew the dedup/cluster groupBys; those group on
  message-derived keys (dedup_key / fingerprint), which are naturally
  high-cardinality, and AQE skew handling is enabled in session.py. The
  classified stage table is written with hash distribution on
  (conv_id, turn_idx) salted into ``spark.sql.shuffle.partitions`` files per
  date partition, so downstream scans parallelize regardless of conv skew.
"""

from __future__ import annotations

import argparse
import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import aggregate as agg
from . import route
from .enrich import enrich_turns
from .parse import parse_turns
from .transcripts import load_transcripts

STAGE_CLASSIFIED = "stage_classified"
SINKS = ("sink_errors", "sink_tool_calls", "sink_anomalies")
AGG_TABLES = ("report_buckets", "top_issues", "report_summary")

LINEAGE_SCHEMA = (
    "run_id string, stage string, partition string, rows bigint,"
    " committed_at double, status string"
)
METRICS_SCHEMA = (
    "run_id string, stage string, partition string, rows_in bigint,"
    " rows_out bigint, invalid bigint, elapsed_sec double"
)


@dataclass
class RunResult:
    run_id: str
    partitions_processed: list[str]
    partitions_skipped: list[str]
    counts: dict = field(default_factory=dict)
    elapsed_sec: float = 0.0


def _p_date(col):
    return F.date_format(F.to_timestamp(F.col(col) / 1000.0), "yyyy-MM-dd")


TARGET_ROWS_PER_FILE = 250_000  # ~60-120 MB of classified parquet per file
MIN_FILES_PER_DATE = 4
MAX_FILES_PER_DATE = 512


def files_for(n_rows: int, n_days: int, floor: int = MIN_FILES_PER_DATE) -> int:
    """Salted files per date partition, sized to the data: enough files
    that downstream scans of one date keep cluster-wide parallelism (a
    hardcoded 4 capped any date at 4 tasks — wrong at 320x the rows), with
    a floor so tiny runs still spread across executors and a cap so the
    file count cannot explode (dates x files). Terminal sink outputs pass
    floor=1: they feed external readers, not this pipeline's scans, so a
    small date needs no parallelism padding (round 7: the padding tripled
    the sinks' file count and dynamic-overwrite commit time at sf0.1)."""
    per_day = n_rows / max(1, n_days)
    return max(floor, min(MAX_FILES_PER_DATE, -(-int(per_day) // TARGET_ROWS_PER_FILE)))


def _derive_files_per_date(
    spark: SparkSession, sf_dir: str, input_table: str | None, replicate: int
) -> int:
    """Row count + date span for file sizing. Read from parquet FOOTERS on
    the driver (no Spark job — this is metadata a real deployment gets from
    Iceberg partition stats for free); falls back to a narrow ts-column
    aggregate if the footers lack ts statistics."""
    src = input_table or f"{sf_dir}/events.parquet"
    try:
        import os

        import pyarrow.parquet as pq

        if os.path.isfile(src):
            files = [src]
        else:  # walk recursively: Hive-partitioned (p_date=...) and nested
            # layouts must contribute their files, not silently yield [] and
            # under-parallelize via the MIN_FILES_PER_DATE fallback
            files = [
                os.path.join(root, f)
                for root, _dirs, names in os.walk(src)
                for f in names
                if f.endswith(".parquet")
            ]
        if not files:
            raise ValueError(f"no parquet files under {src}")
        n = 0
        lo = hi = None
        for path in files:
            md = pq.ParquetFile(path).metadata
            n += md.num_rows
            ts_idx = md.schema.names.index("ts")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ts_idx).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("no ts stats")
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        if n == 0 or lo is None:
            return MIN_FILES_PER_DATE
    except Exception:
        r = spark.read.parquet(src).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("lo"),
            F.max("ts").alias("hi"),
        ).collect()[0]
        n, lo, hi = r["n"], r["lo"], r["hi"]
        if n == 0 or lo is None:
            return MIN_FILES_PER_DATE
    n_days = (hi - lo).days + 1
    return files_for(n * (1 if input_table else max(1, replicate)), n_days)


def _read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    import os

    if not os.path.isdir(f"{out_dir}/_lineage"):
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    return spark.read.parquet(f"{out_dir}/_lineage")


_PA_TYPES = {"string": "string", "bigint": "int64", "double": "float64"}


def _append(spark: SparkSession, out_dir: str, table: str, rows, schema: str):
    """Append tiny bookkeeping rows as ONE driver-written parquet file.

    These are a handful of rows per run; a Spark job for each (the round-2
    coalesce(1) writes) costs a full schedule/commit round-trip on a real
    cluster — part of the measured ~20 s serial tail that caps N->4N
    scaling. pyarrow on the driver writes the same parquet with zero
    cluster involvement; Spark reads the directory identically."""
    if not rows:
        return
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    fields = []
    for part in schema.split(","):
        name, typ = part.strip().split()
        fields.append((name, getattr(pa, _PA_TYPES[typ])()))
    cols = list(zip(*rows))
    t = pa.table(
        {name: pa.array(list(col), type=typ) for (name, typ), col in zip(fields, cols)}
    )
    os.makedirs(f"{out_dir}/{table}", exist_ok=True)
    pq.write_table(t, f"{out_dir}/{table}/part-{uuid.uuid4().hex}.parquet")


def _write_small_table(out_dir: str, table: str, spark_schema, row_dicts):
    """Overwrite a tiny result table (<= tens of rows, already collected)
    with one driver-written parquet file — replaces a coalesce(1) Spark job
    (same serial-tail rationale as _append). Schema is translated from the
    Spark schema so an empty result still writes a typed, readable table.
    Types outside the primitive map (timestamp/array/decimal/...) fall back
    to pyarrow's type inference over the collected values instead of
    crashing the run on a KeyError."""
    import shutil as _sh
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    type_map = {
        "long": pa.int64(),
        "bigint": pa.int64(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
        "timestamp_ntz": pa.timestamp("us"),
        "binary": pa.binary(),
    }
    fields = [
        (f.name, type_map.get(f.dataType.simpleString()))
        for f in spark_schema.fields
    ]
    t = pa.table(
        {
            # type=None -> pyarrow infers from the values (complex Spark
            # types: arrays, maps, decimals); typed when the map covers it
            # so empty tables stay readable with the right schema
            name: pa.array([d[name] for d in row_dicts], type=typ)
            for name, typ in fields
        }
    )
    import os

    _sh.rmtree(f"{out_dir}/{table}", ignore_errors=True)
    os.makedirs(f"{out_dir}/{table}", exist_ok=True)
    pq.write_table(t, f"{out_dir}/{table}/part-{uuid.uuid4().hex}.parquet")


def _pin_run_config(out_dir: str, run_id: str, cfg: dict) -> None:
    """Refuse to resume a run under different semantics.

    Resume skips partitions already committed by this run_id, so flags
    that change WHAT gets written (input selection, redaction, fuzzy
    clustering) must match the original invocation — otherwise old and
    new partitions would silently disagree (e.g. half the sink rows
    redacted). The first invocation pins its config as a tiny driver-side
    JSON; any later invocation with the same (out_dir, run_id) must
    match or it fails loudly naming the drifted flags. parse_impl is
    deliberately NOT pinned: native and pandas parse are oracle-verified
    identical (tests/test_oracle_parity.py pandas-vs-native).
    """
    import os

    path = f"{out_dir}/_run_config/{run_id}.json"
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        drift = {k: (prev.get(k), v) for k, v in cfg.items() if prev.get(k) != v}
        if drift:
            raise ValueError(
                f"resume config mismatch for run_id={run_id!r}: "
                + ", ".join(
                    f"{k} was {a!r}, now {b!r}" for k, (a, b) in sorted(drift.items())
                )
                + " — rerun with the original flags or use a new run_id/out_dir"
            )
        return
    os.makedirs(f"{out_dir}/_run_config", exist_ok=True)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(cfg, f)
    os.replace(tmp, path)


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    run_id: str,
    parse_impl: str = "native",
    replicate: int = 1,
    max_partitions: int | None = None,
    input_table: str | None = None,
    webhook_url: str | None = None,
    webhook_spool: str | None = None,
    fuzzy_buckets: bool = False,
    redact: bool = False,
) -> RunResult:
    """Run (or resume) the full pipeline.

    Partition unit = event date. Partitions already committed for this
    run_id (per the _lineage table) are skipped — that is the
    resume-from-checkpoint behavior. max_partitions limits work per
    invocation (used by tests to simulate an interrupted run).

    fuzzy_buckets=True additionally merges near-miss clusters (the
    reference's DBSCAN analog, engine.py:104-106: clusters feed the report,
    not a side query): the fingerprint->component map is computed ONCE over
    distinct templates, ``analysis_results``/``analysis_summary`` group by
    merged component, the merged global table is written next to the exact
    one as ``report_buckets_fuzzy``, and top_issues + the report summary
    derive from the merged clustering.

    redact=True scrubs PII/identifier tokens (:mod:`timberline_spark.redact`)
    from the parsed ``message`` AND the ``labels`` map values BEFORE the
    stage checkpoint, so the free-text surfaces of every downstream table —
    the category sinks, report-bucket example messages, the report JSON
    document, the webhook payload — carry only scrubbed text. Scope note:
    structured key columns (``conv_id``, label KEYS, ``anomaly_reason``)
    are NOT rewritten — anomaly_reason is a closed enum and conv_id is the
    join/grouping identity (rewriting it would break dedup and resume);
    treat conv_id as pseudonymous and map it outside the pipeline if the
    hand-off requires it. This is the compliance gate for the reference's
    LLM hand-off (ai-analyzer llm_client.py embeds raw log text in
    prompts); cost is a per-row projection fused into the classify stage.
    """
    t0 = time.time()
    _pin_run_config(
        out_dir,
        run_id,
        {
            "sf_dir": sf_dir,
            "input_table": input_table,
            "replicate": replicate,
            "redact": bool(redact),
            "fuzzy_buckets": bool(fuzzy_buckets),
        },
    )
    # resume correctness depends on dynamic partition overwrite: with the
    # static default, re-writing one date partition would truncate the rest
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if input_table:
        tr = spark.read.parquet(input_table)
    else:
        tr = load_transcripts(spark, sf_dir, replicate=replicate)

    # ---- stage 1: classify (parse+enrich+validate+route flags), checkpoint
    # The checkpoint drops the raw text + parse intermediates: the stage
    # table is the PARSED representation (what every downstream consumer
    # needs), which roughly halves the parquet-encode and shuffle bytes.
    # The raw text stays addressable in the source table by (conv_id,
    # turn_idx).
    stage_cols = [
        "conv_id", "turn_idx", "role", "tool", "tool_category", "is_sensitive",
        "ts", "service", "message", "level", "severity", "severity_score",
        "is_error", "is_warning", "effective_ts_ms", "anomaly_reason",
        "is_valid", "keep_level", "keep_sampled", "kept", "conv_key", "labels",
    ]
    # run_id rides along in the stage table: a date partition belongs to the
    # run that last wrote it (dynamic overwrite keeps one writer per date),
    # which is what scopes stage 2+3 to THIS run's dates — another run's
    # dates stay in the shared tables but out of this run's aggregation.
    classified = route.classify_turns(
        enrich_turns(spark, parse_turns(tr, impl=parse_impl))
    ).select(*stage_cols)
    if redact:
        from .redact import redact_text

        classified = classified.withColumn(
            "message", redact_text(F.col("message"))
        ).withColumn(
            # label VALUES are open metadata (can embed identifiers on real
            # inputs); keys are schema-like and stay
            "labels",
            F.transform_values(F.col("labels"), lambda _k, v: redact_text(v)),
        )
    classified = classified.withColumn(
        "p_date", _p_date("effective_ts_ms")
    ).withColumn("run_id", F.lit(run_id))

    import os

    if os.path.isdir(f"{out_dir}/_lineage"):
        done = {
            r.partition
            for r in _read_lineage(spark, out_dir)
            .filter(
                (F.col("run_id") == run_id)
                & (F.col("stage") == STAGE_CLASSIFIED)
                & (F.col("status") == "committed")
            )
            .select("partition")
            .collect()
        }
    else:  # fresh out_dir: no Spark job needed to learn there's no lineage
        done: set[str] = set()
    # The todo list normally comes from the written table afterwards (no
    # extra pass over the raw input). Only max_partitions (test hook for
    # simulating interruption) needs the partition list up front.
    pre_todo = None
    if max_partitions is not None:
        all_parts = sorted(
            r.p_date for r in classified.select("p_date").distinct().collect()
        )
        pre_todo = [p for p in all_parts if p not in done][:max_partitions]

    metrics_rows = []
    t_stage = time.time()
    batch = classified
    if pre_todo is not None:
        batch = batch.filter(F.col("p_date").isin(pre_todo))
    elif done:
        batch = batch.filter(~F.col("p_date").isin(sorted(done)))
    # salted files per date partition: enough parallelism for downstream
    # scans even when one conversation dominates a date, sized to the input
    # (floor 4, cap 512) so the layout survives a 320x scale-up
    files_per_date = _derive_files_per_date(spark, sf_dir, input_table, replicate)
    wrote = pre_todo is None or bool(pre_todo)
    if wrote:
        (
            batch.repartition(
                F.col("p_date"), F.pmod(F.col("conv_key"), F.lit(files_per_date))
            )
            .write.mode("overwrite")
            .partitionBy("p_date")
            .parquet(f"{out_dir}/{STAGE_CLASSIFIED}")
        )
    # per-partition counts AND the per-sink totals from the written table in
    # ONE columnar pass (p_date, is_valid, level, tool only) — this replaces
    # what used to be two separate full scans (a per-date groupBy and a
    # global flag aggregate); the sink totals are summed client-side from
    # the per-date rows (dates are few)
    per_part_rows = (
        spark.read.parquet(f"{out_dir}/{STAGE_CLASSIFIED}")
        # this run's scope only: todo/counts must not absorb dates another
        # run_id owns (run_id is constant per file -> row-group pruning)
        .filter(F.col("run_id") == run_id)
        .select(
            F.col("p_date").cast("string").alias("p_date"),
            "is_valid",
            "level",
            "tool",
        )
        .groupBy("p_date")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.when(~F.col("is_valid"), 1).otherwise(0)), F.lit(0)
            ).alias("bad"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("is_valid")
                        & F.col("level").isin("ERROR", "CRITICAL"),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("n_err"),
            F.coalesce(
                F.sum(
                    F.when(F.col("is_valid") & (F.col("tool") != ""), 1).otherwise(0)
                ),
                F.lit(0),
            ).alias("n_tool"),
        )
        .collect()
    )
    flag_counts = {
        "sink_errors": sum(r.n_err for r in per_part_rows),
        "sink_tool_calls": sum(r.n_tool for r in per_part_rows),
        "sink_anomalies": sum(r.bad for r in per_part_rows),
    }
    per_part = {r.p_date: (r.n, r.bad) for r in per_part_rows if r.p_date not in done}
    todo = sorted(per_part) if pre_todo is None else pre_todo
    if todo:
        now = time.time()
        _append(
            spark,
            out_dir,
            "_lineage",
            [
                (run_id, STAGE_CLASSIFIED, p, int(per_part.get(p, (0, 0))[0]), now, "committed")
                for p in todo
            ],
            LINEAGE_SCHEMA,
        )
        metrics_rows += [
            (
                run_id,
                STAGE_CLASSIFIED,
                p,
                int(per_part.get(p, (0, 0))[0]),
                int(per_part.get(p, (0, 0))[0]),
                int(per_part.get(p, (0, 0))[1]),
                now - t_stage,
            )
            for p in todo
        ]

    # ---- stage 2+3: sink fan-out and report aggregation, CONCURRENT -------
    # The three sink writes and the dedup/buckets job are independent reads
    # of the same stage table; submitting them from driver threads (Spark's
    # scheduler is thread-safe; session.py enables FAIR mode) lets the small
    # sink jobs fill executor slots the wide dedup shuffle leaves idle —
    # the serial driver tail becomes one barrier instead of six queued jobs.
    from concurrent.futures import ThreadPoolExecutor

    stage_df = spark.read.parquet(f"{out_dir}/{STAGE_CLASSIFIED}").filter(
        F.col("run_id") == run_id
    ).drop("run_id")
    counts: dict[str, int] = {}
    sink_builders = {
        "sink_errors": route.errors_sink,
        "sink_tool_calls": route.tool_calls_sink,
        "sink_anomalies": route.anomalies_sink,
    }

    n_days = max(1, len(per_part_rows))

    def _write_sink(sink: str, builder) -> float:
        t_s = time.time()
        out = builder(stage_df).withColumn("run_id", F.lit(run_id)).withColumn(
            "p_date", _p_date("ts_ms")
        )
        # cluster by (date, hash-salt) before the partitioned write: without
        # it every scan task writes a sliver file into every date it touches
        # (tasks x dates files — measured 114-200 files per sf0.1 sink, 30
        # after; the dynamic-overwrite commit pays per file). Salt count
        # derives from the sink's actual row count (known from the stage-
        # table aggregate above), so file sizing tracks data volume at any
        # scale.
        files_sink = files_for(int(flag_counts[sink]), n_days, floor=1)
        out = out.repartition(
            F.col("p_date"),
            F.pmod(F.xxhash64(F.col("conv_id")), F.lit(files_sink)),
        )
        out.write.mode("overwrite").partitionBy("p_date").parquet(f"{out_dir}/{sink}")
        return time.time() - t_s

    def _write_buckets():
        # the wide dedup shuffle runs ONCE, keyed per analysis date; the
        # global view is an associative rollup of the (tiny) dated frame.
        # Scored buckets are persisted in memory while being written, and
        # top-issues + summary + the JSON report doc all derive from the
        # cached frames — no parquet read-backs, no extra .count() jobs.
        t_s = time.time()
        deduped_d = agg.dedup_turns(
            route.kept_turns(stage_df), extra_keys=("p_date",), audit=True
        ).persist()
        # materialize the ONE wide shuffle before fanning out (the three
        # result branches below then read the cached frame concurrently
        # instead of racing to populate it) AND count hash-key collision
        # groups in the same pass — the sentinel for the 64-bit dedup key
        # (see aggregate.DEDUP_HASH_KEY; nonzero lands in _metrics)
        n_collisions = deduped_d.filter(F.col("key_collision")).count()
        # S7 date-keyed upsert (analysis_results_store.py:75-131 keeps one
        # result row set per analysis_date): results partitioned by
        # analysis_date + dynamic partition overwrite = MERGE keyed by date.
        # A second run touches only the dates present in ITS input; other
        # runs' dates survive, and re-running a date is idempotent (all
        # transforms deterministic).
        # fuzzy mode: one component map over DISTINCT templates, applied
        # to the dated AND global aggregations (scale shape: the graph is
        # O(cluster count); each aggregation stays one hash-agg shuffle)
        comp = (
            agg.fuzzy_component_map(deduped_d.drop("key_collision"))
            if fuzzy_buckets
            else None
        )
        dated_buckets = (
            agg.report_buckets_merged(
                deduped_d.drop("key_collision"), comp, extra_keys=("p_date",)
            )
            if fuzzy_buckets
            else agg.report_buckets(deduped_d, extra_keys=("p_date",))
        )
        # persisted: BOTH dated writers (results + summary) read this frame;
        # uncached, each would re-run the dated bucket aggregation over the
        # cached dedup frame (measured: two identical agg jobs per run)
        scored_d = agg.score_clusters(dated_buckets).withColumnRenamed(
            "p_date", "analysis_date"
        ).persist()

        def _write_dated_results():
            # one task per date before the partitioned write (same sliver-
            # file rationale as _write_sink; measured 736 -> 30 files and
            # 1.98 s -> 0.46 s for this write at sf0.1). The cluster table
            # is orders of magnitude smaller than the row stream, so a
            # date's clusters always fit one write task comfortably.
            scored_d.repartition(F.col("analysis_date")).withColumn(
                "run_id", F.lit(run_id)
            ).write.mode("overwrite").partitionBy("analysis_date").parquet(
                f"{out_dir}/analysis_results"
            )

        def _write_dated_summary():
            agg.run_summary(
                scored_d, group_keys=("analysis_date",)
            ).withColumn("run_id", F.lit(run_id)).write.mode(
                "overwrite"
            ).partitionBy("analysis_date").parquet(f"{out_dir}/analysis_summary")

        with ThreadPoolExecutor(4) as dex:
            dated_futs = [
                dex.submit(_write_dated_results),
                dex.submit(_write_dated_summary),
            ]
            # the global chain proceeds concurrently on this thread (FAIR
            # scheduler interleaves the small jobs); inputs are the cached
            # dated frame, so nothing recomputes the wide shuffle. The
            # rollup re-hashes dedup_key, so it runs its OWN collision
            # audit (a cross-date collision here is invisible to the
            # per-date sentinel); the sentinel sum rides the scored-buckets
            # write via observe() — zero extra jobs, where it used to cost
            # a separate materialization of the whole rollup.
            from pyspark.sql import Observation

            rollup_obs = Observation("rollup_audit")
            deduped = agg.dedup_rollup(deduped_d, audit=True)
            deduped = deduped.observe(
                rollup_obs,
                F.coalesce(
                    F.sum(F.col("key_collision").cast("long")), F.lit(0)
                ).alias("n_collisions"),
            ).drop("key_collision")
            scored = agg.score_clusters(agg.report_buckets(deduped)).persist()
            # rebalance: AQE sizes the write partitions by advisory bytes
            # (guide §6) — one file for a small cluster table instead of one
            # sliver per aggregate task, ~64 MB files at scale
            scored.hint("rebalance").withColumn("run_id", F.lit(run_id)).write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/report_buckets")
            n_rollup_collisions = rollup_obs.get["n_collisions"]
            basis = scored
            if fuzzy_buckets:
                # merged global table written NEXT TO the exact one; the
                # report (top issues + summary) derives from the merged
                # clustering, like the reference's DBSCAN-fed report
                basis = agg.score_clusters(
                    agg.report_buckets_merged(deduped, comp)
                ).persist()
                basis.withColumn("run_id", F.lit(run_id)).write.mode(
                    "overwrite"
                ).parquet(f"{out_dir}/report_buckets_fuzzy")
            # both collects read the persisted tiny scored frame; overlap
            # them on the pool (two small jobs, each <= TOP_ISSUES_N rows /
            # 1 row by construction) instead of serializing two job
            # round-trips on this thread
            top = agg.top_issues(basis)
            summary_df = agg.run_summary(basis)
            top_fut = dex.submit(top.collect)
            summary_fut = dex.submit(summary_df.collect)
            top_rows = top_fut.result()
            summary_row = summary_fut.result()[0]
            # tiny tables from already-collected rows: driver-written, no job
            run_field = T.StructField("run_id", T.StringType())
            _write_small_table(
                out_dir,
                "top_issues",
                T.StructType(top.schema.fields + [run_field]),
                [{**r.asDict(), "run_id": run_id} for r in top_rows],
            )
            _write_small_table(
                out_dir,
                "report_summary",
                T.StructType(summary_df.schema.fields + [run_field]),
                [{**summary_row.asDict(), "run_id": run_id}],
            )
            for f in dated_futs:
                f.result()
        if fuzzy_buckets:
            basis.unpersist()
        scored.unpersist()
        scored_d.unpersist()
        deduped_d.unpersist()
        return (
            top_rows, summary_row, n_collisions, n_rollup_collisions,
            time.time() - t_s,
        )

    t_stage = time.time()
    with ThreadPoolExecutor(len(sink_builders) + 1) as ex:
        sink_futs = {s: ex.submit(_write_sink, s, b) for s, b in sink_builders.items()}
        buckets_fut = ex.submit(_write_buckets)
        for sink, fut in sink_futs.items():
            el = fut.result()
            n = int(flag_counts[sink])
            counts[sink] = n
            metrics_rows.append((run_id, sink, "*", None, n, None, el))
        top_rows, summary_row, n_collisions, n_rollup_collisions, _ = (
            buckets_fut.result()
        )
    counts["report_buckets"] = int(summary_row["clusters_found"])
    counts["top_issues"] = len(top_rows)
    counts["report_summary"] = 1
    metrics_rows.append(
        (run_id, "aggregate", "*", None, counts["report_buckets"], None, time.time() - t_stage)
    )
    # dedup hash-key collision sentinel: groups whose members disagree under
    # an independent second hash (expected 0; nonzero = rerun with
    # aggregate.DEDUP_HASH_KEY = False for exact string keys)
    metrics_rows.append(
        (run_id, "dedup_hash_collisions", "*", None, int(n_collisions), None, None)
    )
    # same sentinel for the rollup's OWN hashed groupBy (covers cross-date
    # collisions the per-date audit cannot see; includes inherited verdicts)
    metrics_rows.append(
        (
            run_id, "dedup_rollup_hash_collisions", "*", None,
            int(n_rollup_collisions), None, None,
        )
    )
    _append(spark, out_dir, "_metrics", metrics_rows, METRICS_SCHEMA)

    # S6 analog: single JSON report document (reporting/generator.py:101-131)
    # — the human-facing daily report; built from the already-collected rows.
    report_doc = {
        "run_id": run_id,
        "summary": summary_row.asDict(),
        "top_issues": [r.asDict() for r in sorted(top_rows, key=lambda r: r["rank"])],
    }
    with open(f"{out_dir}/daily_analysis_{run_id}.json", "w") as fh:
        json.dump(report_doc, fh, indent=2, default=str)

    # S8 webhook notification (generator.py:133-166): POST the summary
    # payload, spool on failure (at-least-once; no silent drop)
    if webhook_url or webhook_spool:
        from .webhook import post_report

        counts["webhook"] = post_report(
            report_doc, url=webhook_url, spool_dir=webhook_spool
        )

    return RunResult(
        run_id=run_id,
        partitions_processed=todo,
        partitions_skipped=sorted(done),
        counts=counts,
        elapsed_sec=time.time() - t0,
    )


def iceberg_ddl(table: str = "transcripts") -> str:
    """The Iceberg DDL this layout maps to on a real cluster (S5 analog —
    log-ingestor/internal/storage/milvus.go:100-179 collection bootstrap)."""
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ("
        " conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp)"
        " USING iceberg PARTITIONED BY (days(ts), bucket(64, conv_id))"
    )


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark-runtime jar is on the JVM classpath.
    This sandbox has no network and no vendored jar (pinned in BENCH.md),
    so here it returns False; on a real cluster with
    ``--packages org.apache.iceberg:iceberg-spark-runtime-...`` it gates
    :func:`bootstrap_iceberg`."""
    try:
        # resolve through the CONTEXT classloader, not Class.forName's
        # caller loader: jars added via --packages/--jars live in Spark's
        # MutableURLClassLoader, which only the context loader sees — the
        # caller-loader probe returns a false negative on exactly the
        # deployment this function is meant to enable
        (
            spark._jvm.java.lang.Thread.currentThread()
            .getContextClassLoader()
            .loadClass("org.apache.iceberg.spark.SparkCatalog")
        )
        return True
    except Exception:
        return False


def bootstrap_iceberg(
    spark: SparkSession, table: str = "local.db.transcripts"
) -> None:
    """EXECUTE the S5 store bootstrap against a configured Iceberg catalog:
    create the partitioned table if absent. Requires the runtime jar plus a
    catalog conf, e.g.::

        spark.sql.catalog.local = org.apache.iceberg.spark.SparkCatalog
        spark.sql.catalog.local.type = hadoop
        spark.sql.catalog.local.warehouse = <path>

    Raises RuntimeError with the pinned sandbox constraint when the jar is
    absent, so callers fail loud instead of silently skipping the store."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "iceberg-spark-runtime jar not on the classpath (this sandbox is "
            "offline and ships no Iceberg jar — see BENCH.md 'Iceberg "
            "constraint'); run with --packages org.apache.iceberg:"
            "iceberg-spark-runtime to enable the executed DDL path"
        )
    spark.sql(iceberg_ddl(table))


def main(argv=None):
    from .session import get_spark

    ap = argparse.ArgumentParser(description="timberline_spark pipeline runner")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--parse-impl", default="native", choices=["native", "pandas"])
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--max-partitions", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--input-table", default=None, help="pre-built transcripts parquet")
    ap.add_argument("--webhook-url", default=None, help="POST the report summary here")
    ap.add_argument(
        "--webhook-spool", default=None,
        help="spool dir for undeliverable webhook payloads",
    )
    ap.add_argument(
        "--fuzzy-buckets", action="store_true",
        help="merge near-miss clusters (DBSCAN analog) into"
        " analysis_results/top_issues/summary; writes report_buckets_fuzzy",
    )
    ap.add_argument(
        "--redact", action="store_true",
        help="scrub PII/identifier tokens from parsed messages and label"
        " values before the stage checkpoint (free-text surfaces of all"
        " sinks/reports are scrubbed; conv_id stays pseudonymous)",
    )
    ap.add_argument(
        "--iceberg-table", default=None,
        help="execute the S5 Iceberg DDL bootstrap for this catalog table"
        " before running (requires iceberg-spark-runtime on the classpath)",
    )
    args = ap.parse_args(argv)
    spark = get_spark("timberline_pipeline", cores=args.cores)
    if args.iceberg_table:
        bootstrap_iceberg(spark, args.iceberg_table)
    res = run_pipeline(
        spark,
        args.sf_dir,
        args.out,
        args.run_id,
        parse_impl=args.parse_impl,
        replicate=args.replicate,
        max_partitions=args.max_partitions,
        input_table=args.input_table,
        webhook_url=args.webhook_url,
        webhook_spool=args.webhook_spool,
        fuzzy_buckets=args.fuzzy_buckets,
        redact=args.redact,
    )
    print(
        json.dumps(
            {
                "run_id": res.run_id,
                "partitions_processed": res.partitions_processed,
                "partitions_skipped": res.partitions_skipped,
                "counts": res.counts,
                "elapsed_sec": round(res.elapsed_sec, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
