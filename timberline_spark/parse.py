"""Grok/regex parse stage: raw turn text -> structured fields.

Reimplements (Spark-first) the reference's parse surface:

- plain leveled / syslog-ish lines: fluent-bit named-group regex parsers
  (``/root/reference/fluent-bit-config/parsers.yaml:2-13``) and the plain
  application lines of the synthetic corpus
  (``tests/docker/log_generator.py:100-106``);
- structured JSON lines with level/service/message fields
  (``log_generator.py:118-271``; dual-format fallback parse in
  ``log-ingestor/internal/handlers/stream.go:226-244``);
- k8s klog lines with single-char levels
  (``log_generator.py:273-339``; CRI parser in
  ``helm/timberline/templates/fluent-bit-configmap.yaml:123-127``);
- flexible timestamp parsing with deterministic sentinel fallback
  (``stream.go:20-58`` — the reference falls back to now(); we fall back to
  the row's ``ts`` column so reruns are byte-identical).

Two implementations with identical output:

- ``impl="native"`` (default): ``F.regexp_extract`` chains — JVM-side,
  whole-stage-codegen, zero Python in the hot path. This is the 100 TB path.
- ``impl="pandas"``: one vectorized Arrow-batched pandas UDF applying the
  precompiled alternation and returning a struct — the "Lua scripting filter"
  extension point (``fluent-bit-configmap.yaml:59-62``) expressed the Spark
  way. Kept for parity testing and for grammars that outgrow regexp_extract.

Regex patterns use only constructs that Java regex and RE2 (DuckDB) parse
identically, so the DuckDB oracle can re-run the same patterns.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Grammar patterns (shared with the oracle SQL generator).
RE_PLAIN = (
    r"^([0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:[0-9]{2}) "
    r"([A-Z]+) \[([A-Za-z0-9-]+)] (.*)$"
)
RE_JSON_LEVEL = r'"level":"([A-Z]+)"'
RE_JSON_SERVICE = r'"service":"([A-Za-z0-9-]+)"'
RE_JSON_MESSAGE = r'"message":"([^"]*)"'
RE_KLOG = (
    r"^([IEWF])([0-9]{4}) ([0-9]{2}:[0-9]{2}:[0-9]{2})\.[0-9]{6} 1 "
    r"([A-Za-z0-9-]+)\.go:([0-9]+)] (.*)$"
)
RE_CONV_NUM = r"^conv-([0-9]+)$"

TS_FMT = "yyyy-MM-dd HH:mm:ss"

# Flexible-timestamp surface (stream.go:20-58 + log_generator.py:70-79):
# every format the reference accepts, tried in order. Fallback is NULL (the
# caller substitutes the row ts — a deterministic sentinel, NOT now()).
FLEX_TS_FORMATS = [
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss,SSS",  # python-logging comma-millis
    "MMM dd HH:mm:ss yyyy",  # syslog + explicit year
]

PARSED_FIELDS = ["grammar", "level_raw", "service", "message", "text_ts_ms"]


def flexible_ts_ms(c: Column) -> Column:
    """Epoch-millis from a string timestamp in any accepted format.

    Includes the seconds-vs-millis heuristic for pure numerics
    (stream.go:77-90: values < 1e12 are seconds). Unparseable -> NULL.
    """
    attempts = [F.try_to_timestamp(c, F.lit(f)) for f in FLEX_TS_FORMATS]
    from_str = F.unix_millis(F.coalesce(*attempts))
    num = F.when(c.rlike("^[0-9]+([.][0-9]+)?$"), c.cast("double"))
    from_num = F.when(
        num < 1e12, (num * 1000).cast("long")
    ).otherwise(num.cast("long"))
    return F.coalesce(from_str, from_num)


def _nullif_empty(c: Column) -> Column:
    return F.when(c == "", None).otherwise(c)


def parse_turns(df: DataFrame, impl: str = "native") -> DataFrame:
    """Add parsed columns to a transcripts DataFrame.

    Adds: grammar, level_raw, service, message, text_ts_ms (epoch millis
    parsed out of the text, null when the grammar carries no full date),
    conv_num (numeric conversation key used by the deterministic sampler).
    """
    if impl == "native":
        df = _parse_native(df)
    elif impl == "pandas":
        df = _parse_pandas(df)
    else:
        raise ValueError(f"unknown parse impl: {impl}")
    return df.withColumn(
        "conv_num", F.regexp_extract("conv_id", RE_CONV_NUM, 1).cast("long")
    )


def _parse_native(df: DataFrame) -> DataFrame:
    t = F.col("text")
    plain_lvl = _nullif_empty(F.regexp_extract(t, RE_PLAIN, 2))
    json_lvl = F.when(
        t.startswith("{"), _nullif_empty(F.regexp_extract(t, RE_JSON_LEVEL, 1))
    )
    klog_char = _nullif_empty(F.regexp_extract(t, RE_KLOG, 1))
    grammar = (
        F.when(plain_lvl.isNotNull(), "plain")
        .when(json_lvl.isNotNull(), "json")
        .when(klog_char.isNotNull(), "klog")
    )
    level_raw = F.coalesce(plain_lvl, json_lvl, klog_char)
    service = F.coalesce(
        _nullif_empty(F.regexp_extract(t, RE_PLAIN, 3)),
        F.when(t.startswith("{"), _nullif_empty(F.regexp_extract(t, RE_JSON_SERVICE, 1))),
        _nullif_empty(F.regexp_extract(t, RE_KLOG, 4)),
    )
    message = (
        F.when(plain_lvl.isNotNull(), F.regexp_extract(t, RE_PLAIN, 4))
        .when(json_lvl.isNotNull(), F.regexp_extract(t, RE_JSON_MESSAGE, 1))
        .when(klog_char.isNotNull(), F.regexp_extract(t, RE_KLOG, 6))
    )
    # Flexible timestamp (P5/P6 analog): only the plain grammar embeds a
    # full wall-clock date; try_to_timestamp -> null on failure (no error).
    text_ts = F.try_to_timestamp(
        _nullif_empty(F.regexp_extract(t, RE_PLAIN, 1)), F.lit(TS_FMT)
    )
    return (
        df.withColumn("grammar", grammar)
        .withColumn("level_raw", level_raw)
        .withColumn("service", service)
        .withColumn("message", message)
        .withColumn("text_ts_ms", F.unix_millis(text_ts))
    )


# ---------------------------------------------------------------------------
# pandas-UDF grok variant (Arrow-batched, no per-row Python at the API level)
# ---------------------------------------------------------------------------
_GROK_SCHEMA = T.StructType(
    [
        T.StructField("grammar", T.StringType()),
        T.StructField("level_raw", T.StringType()),
        T.StructField("service", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("text_ts_ms", T.LongType()),
    ]
)

_C_PLAIN = re.compile(RE_PLAIN)
_C_JSON_L = re.compile(RE_JSON_LEVEL)
_C_JSON_S = re.compile(RE_JSON_SERVICE)
_C_JSON_M = re.compile(RE_JSON_MESSAGE)
_C_KLOG = re.compile(RE_KLOG)


def _grok_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized grok over one Arrow batch using pandas .str.extract."""
    out = pd.DataFrame(index=texts.index)
    plain = texts.str.extract(_C_PLAIN)
    klog = texts.str.extract(_C_KLOG)
    is_json = texts.str.startswith("{", na=False)
    j_lvl = texts.where(is_json).str.extract(_C_JSON_L)[0]
    j_svc = texts.where(is_json).str.extract(_C_JSON_S)[0]
    j_msg = texts.where(is_json).str.extract(_C_JSON_M)[0]

    has_plain = plain[1].notna()
    has_json = j_lvl.notna() & ~has_plain
    has_klog = klog[0].notna() & ~has_plain & ~has_json

    out["grammar"] = pd.Series(pd.NA, index=texts.index, dtype="object")
    out.loc[has_plain, "grammar"] = "plain"
    out.loc[has_json, "grammar"] = "json"
    out.loc[has_klog, "grammar"] = "klog"

    out["level_raw"] = plain[1].where(has_plain, j_lvl.where(has_json, klog[0]))
    out["service"] = plain[2].where(has_plain, j_svc.where(has_json, klog[3]))
    out["message"] = plain[3].where(has_plain, j_msg.where(has_json, klog[5]))
    ts = pd.to_datetime(plain[0].where(has_plain), format="%Y-%m-%d %H:%M:%S", errors="coerce")
    ms = (ts - pd.Timestamp("1970-01-01")) / pd.Timedelta(milliseconds=1)
    out["text_ts_ms"] = ms.astype("Int64")
    return out


def _parse_pandas(df: DataFrame) -> DataFrame:
    grok = F.pandas_udf(_grok_batch, returnType=_GROK_SCHEMA)
    # materialize the struct once, then expand — avoids re-running the UDF
    # per extracted field
    df = df.withColumn("_grok", grok(F.col("text")))
    for f in PARSED_FIELDS:
        df = df.withColumn(f, F.col("_grok")[f])
    return df.drop("_grok")
