"""Broadcast-dictionary enrichment (severity / tool / role).

Spark-first replacement for the reference's dictionary-shaped computations
(``/root/reference/ai-analyzer/analyzer/models/log.py:16-58`` severity
mapping, ``analysis/engine.py:110-111`` error/warning classes, plus the
target table's ``tool``/``role`` dimensions). The dictionaries are tiny, so
all three joins are explicit ``F.broadcast`` equi-joins — no shuffle on the
fact side at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dicts


def enrich_turns(
    spark: SparkSession, df: DataFrame, unknown_level_to_info: bool = False
) -> DataFrame:
    """Left-join the three dictionaries onto a parsed transcripts frame.

    Adds: level (canonical; null when level_raw is unknown -> routed to
    anomalies downstream), severity, severity_score, is_error, is_warning,
    tool_category, is_sensitive, role_class.

    unknown_level_to_info=True switches to the REFERENCE semantics for P8
    (log.go:66-86 / milvus_client.py:131-134): a parsed-but-unknown level
    falls back to INFO with INFO's severity attributes instead of becoming
    an unknown_level anomaly. The default keeps the stricter divergence
    (documented in dicts.py) so per-sink counts surface bad levels.
    """
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
