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
