"""Physical-plan guarantees — the properties that matter at 100 TB.

These tests read .explain() output so a future change can't silently turn a
broadcast join into a shuffle or block filter pushdown.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from timberline_spark import route
from timberline_spark.enrich import enrich_turns
from timberline_spark.parse import parse_turns
from timberline_spark.transcripts import load_transcripts

from .conftest import SF_TINY


def _plan(df, mode="formatted"):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def stage_table(spark):
    out = tempfile.mkdtemp(prefix="tl_plan_")
    df = route.classify_turns(
        enrich_turns(spark, parse_turns(load_transcripts(spark, SF_TINY)))
    )
    df.write.mode("overwrite").parquet(out)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_sink_filters_push_to_parquet_scan(spark, stage_table):
    stage = spark.read.parquet(stage_table)
    plan = _plan(route.errors_sink(stage))
    assert "PushedFilters" in plan
    assert "In(level, [CRITICAL,ERROR]" in plan
    # projection pruned: raw text is not in the sink, must not be read
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema
    # no shuffle anywhere in a sink projection+filter
    assert "Exchange" not in plan


def test_enrichment_joins_are_broadcast(spark):
    """The dynamic-dictionary path (impl='broadcast') must broadcast all
    three dict joins — never shuffle the fact side."""
    df = enrich_turns(
        spark, parse_turns(load_transcripts(spark, SF_TINY)), impl="broadcast"
    )
    plan = _plan(df, "simple")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_enrichment_default_is_join_free(spark):
    """The default literal-map enrichment is a pure projection: no joins,
    no exchanges of any kind — the dictionaries ride inside the row
    expression (optimization round 7; output equality vs the broadcast
    path is pinned in test_route.py)."""
    df = enrich_turns(spark, parse_turns(load_transcripts(spark, SF_TINY)))
    plan = _plan(df, "simple")
    assert "Join" not in plan
    assert "BroadcastExchange" not in plan


def test_dedup_aggregates_map_side(spark, stage_table):
    """dedup must be a partial+final aggregate (map-side combine shrinks the
    shuffle to one row per distinct message per task), never a Window (which
    would shuffle every row and sort whole partitions).

    Spark picks SortAggregate for min(struct) — fine: partial aggregation is
    what cuts shuffle volume; the within-partition sort is on the combined
    (deduped) rows."""
    from timberline_spark import aggregate as agg

    stage = spark.read.parquet(stage_table)
    plan = _plan(agg.dedup_turns(route.kept_turns(stage)), "simple")
    assert "partial_min" in plan  # map-side combine present
    assert "Window" not in plan


def test_parse_plan_has_single_from_json(spark):
    """The JSON parse must run ONCE per row: the parsed struct is a shared
    non-cheap alias (`_j`), which CollapseProject keeps un-inlined. Round 2
    shipped 25 JsonToStructs copies in this plan (one per extracted field) —
    a measured 2x parse-stage cost at sf0.1."""
    from timberline_spark import queries as Q

    # route_errors regression (round 4): InferFiltersFromConstraints turned
    # the enrichment join's level filter into an isnotnull(level_raw)
    # pre-join filter carrying 12 inlined from_json copies (measured 2.2x
    # query cost); the rule is excluded in session.py
    for name in ("parse", "kept_rows", "route_errors", "route_tool_calls"):
        df = Q.PIPELINE_QUERIES[name](spark, SF_TINY)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("from_json") == 1, (name, plan.count("from_json"))


def test_cosine_pairs_candidate_join_is_equi(spark):
    """The near-dup candidate generator must plan an EQUI join on the
    capped dim index — never a cartesian/nested-loop product (the
    quadratic-in-N shape the df cap exists to prevent)."""
    from timberline_spark.extras.similarity import cosine_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(cosine_pairs(docs, 0.9), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_classify_is_single_stage_no_shuffle(spark, stage_table):
    """parse+enrich+validate+route is map-only over the input scan: the
    whole per-row path is one stage (broadcasts aside)."""
    tr = spark.read.parquet(stage_table).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    df = route.classify_turns(enrich_turns(spark.sparkSession if hasattr(spark, "sparkSession") else spark, parse_turns(tr)))
    plan = _plan(df, "simple")
    # only broadcast exchanges, no shuffle exchange on the fact side
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "Broadcast" in line, line
