"""Dictionary enrichment (severity / tool / role).

Spark-first replacement for the reference's dictionary-shaped computations
(``/root/reference/ai-analyzer/analyzer/models/log.py:16-58`` severity
mapping, ``analysis/engine.py:110-111`` error/warning classes, plus the
target table's ``tool``/``role`` dimensions).

Two implementations with identical output (pinned by tests/test_route.py):

- ``impl="map"`` (default): the dictionaries are compile-time constants, so
  each enrichment is a literal ``map<key, struct<attrs>>`` lookup fused into
  the scan-side projection — zero joins, zero broadcast exchanges, zero
  driver->executor dictionary shipping, at any scale (optimization guide
  §3.1: the cheapest join strategy is not joining). ``try_element_at``
  returns NULL for unknown/null keys, exactly like the left joins it
  replaces.
- ``impl="broadcast"``: the original three explicit ``F.broadcast`` equi-
  joins — the shape a DYNAMIC dictionary table (one loaded from storage
  rather than compiled in) would use; kept as the reference implementation
  and exercised by the plan test.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dicts


def _fence(c: Column) -> Column:
    """Value-identity filter-pushdown fence.

    ``element_at(shuffle(array(c)), 1)`` always evaluates to ``c`` (a
    1-element shuffle is the identity), but ``shuffle`` is flagged
    non-deterministic, so PushDownPredicates will not rewrite filters
    through the projection that contains it.

    Why this matters: the broadcast joins this module's map path replaced
    were, incidentally, optimizer barriers. Without a barrier, a filter on
    any classify-derived flag (``kept``, ``is_valid``, ``level`` ...) is
    pushed below the enrich/parse projections with every referenced alias
    INLINED into the predicate — the whole from_json + regex parse tree
    duplicated several times over (measured: the kept-rows noop isolation
    went 1.15 s -> 28 s at sf0.1 when the fence was omitted). Nothing
    below this projection is filter-prunable anyway — every downstream
    predicate references text-derived columns, never raw input columns —
    so fencing costs no scan pruning at any scale; it only pins the
    single-evaluation plan shape (optimization guide §4.4 is the same
    maneuver for expensive UDFs).
    """
    return F.element_at(F.shuffle(F.array(c)), 1)


def _lit_map(pairs: list[tuple]) -> Column:
    """Literal map<string, struct> from (key, {field: value}) pairs."""
    args = []
    for key, fields in pairs:
        args.append(F.lit(key))
        args.append(
            F.struct(*[F.lit(v).alias(name) for name, v in fields.items()])
        )
    return F.create_map(*args)


def _severity_map() -> Column:
    return _lit_map(
        [
            (
                raw,
                {
                    "level": canon,
                    "severity": bucket,
                    "severity_score": score,
                    "is_error": is_err,
                    "is_warning": is_warn,
                },
            )
            for raw, canon, bucket, score, is_err, is_warn in dicts.severity_dict_rows()
        ]
    )


def _tool_map() -> Column:
    return _lit_map(
        [
            (tool, {"tool_category": cat, "is_sensitive": sens})
            for tool, cat, sens in dicts.TOOL_DICT
        ]
    )


def _role_map() -> Column:
    return _lit_map(
        [(role, {"role_class": cls}) for role, cls in dicts.ROLE_DICT]
    )


def enrich_turns(
    spark: SparkSession,
    df: DataFrame,
    unknown_level_to_info: bool = False,
    impl: str = "map",
) -> DataFrame:
    """Attach the three dictionaries onto a parsed transcripts frame.

    Adds: level (canonical; null when level_raw is unknown -> routed to
    anomalies downstream), severity, severity_score, is_error, is_warning,
    tool_category, is_sensitive, role_class.

    unknown_level_to_info=True switches to the REFERENCE semantics for P8
    (log.go:66-86 / milvus_client.py:131-134): a parsed-but-unknown level
    falls back to INFO with INFO's severity attributes instead of becoming
    an unknown_level anomaly. The default keeps the stricter divergence
    (documented in dicts.py) so per-sink counts surface bad levels.
    """
    if impl == "map":
        out = (
            df.select(
                "*",
                _fence(
                    F.try_element_at(_severity_map(), F.col("level_raw"))
                ).alias("_sev"),
                _fence(F.try_element_at(_tool_map(), F.col("tool"))).alias("_tool"),
                _fence(F.try_element_at(_role_map(), F.col("role"))).alias("_role"),
            )
            .withColumn("level", F.col("_sev.level"))
            .withColumn("severity", F.col("_sev.severity"))
            .withColumn("severity_score", F.col("_sev.severity_score"))
            .withColumn("is_error", F.col("_sev.is_error"))
            .withColumn("is_warning", F.col("_sev.is_warning"))
            .withColumn("tool_category", F.col("_tool.tool_category"))
            .withColumn("is_sensitive", F.col("_tool.is_sensitive"))
            .withColumn("role_class", F.col("_role.role_class"))
            .drop("_sev", "_tool", "_role")
        )
    elif impl == "broadcast":
        sev = dicts.severity_df(spark)
        tool = dicts.tool_df(spark).withColumnsRenamed({"tool": "tool_key"})
        role = dicts.role_df(spark).withColumnsRenamed({"role": "role_key"})
        out = (
            df.join(F.broadcast(sev), df["level_raw"] == sev["level_raw"], "left")
            .drop(sev["level_raw"])
            .join(F.broadcast(tool), df["tool"] == tool["tool_key"], "left")
            .drop("tool_key")
            .join(F.broadcast(role), df["role"] == role["role_key"], "left")
            .drop("role_key")
        )
    else:
        raise ValueError(f"unknown enrich impl: {impl!r}")
    if unknown_level_to_info:
        info = dicts.level_defaults("INFO")
        # snapshot the predicate BEFORE overwriting `level` — withColumn is
        # lazy, so a condition on F.col("level") would see the updated column.
        # Keyed on grammar, not level_raw: a parsed direct-JSON line with no
        # `level` key (grammar='json', level_raw null) also defaults to INFO
        # (log.go:66-86 GetLevel on a missing level).
        out = out.withColumn(
            "_unknown_level", F.col("grammar").isNotNull() & F.col("level").isNull()
        )
        for col, default in info.items():
            out = out.withColumn(
                col,
                F.when(F.col("_unknown_level"), F.lit(default)).otherwise(F.col(col)),
            )
        out = out.drop("_unknown_level")
    return out
