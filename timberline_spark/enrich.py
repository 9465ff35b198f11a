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


def enrich_turns(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Left-join the three dictionaries onto a parsed transcripts frame.

    Adds: level (canonical; null when level_raw is unknown -> routed to
    anomalies downstream), severity, severity_score, is_error, is_warning,
    tool_category, is_sensitive, role_class.
    """
    sev = dicts.severity_df(spark)
    tool = dicts.tool_df(spark).withColumnsRenamed({"tool": "tool_key"})
    role = dicts.role_df(spark).withColumnsRenamed({"role": "role_key"})
    return (
        df.join(F.broadcast(sev), df["level_raw"] == sev["level_raw"], "left")
        .drop(sev["level_raw"])
        .join(F.broadcast(tool), df["tool"] == tool["tool_key"], "left")
        .drop("tool_key")
        .join(F.broadcast(role), df["role"] == role["role_key"], "left")
        .drop("role_key")
    )
