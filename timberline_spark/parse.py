"""Grok/JSON parse stage: raw turn text -> structured fields.

Reimplements (Spark-first) the reference's parse surface:

- plain leveled / syslog-ish lines: fluent-bit named-group regex parsers
  (``/root/reference/fluent-bit-config/parsers.yaml:2-13``) and the plain
  application lines of the synthetic corpus
  (``tests/docker/log_generator.py:100-106``);
- structured JSON lines parsed with REAL JSON parsing (``F.from_json``), not
  field regexes — any key order, escaped quotes, nested metadata, exactly
  like the reference's struct unmarshal
  (``log-ingestor/internal/handlers/stream.go:226-244``). Two accepted JSON
  shapes (dual-format fallback, stream.go:60-67): the direct LogEntry shape
  ``{level, service, message, labels|kubernetes_labels}`` and the Fluent Bit
  shape ``{date, log, source, kubernetes{labels}}`` whose float ``date``
  goes through the seconds-vs-millis heuristic (``stream.go:77-90``);
- open-schema metadata labels with the reference's 3-path fallback chain
  ``labels -> kubernetes_labels -> kubernetes.labels``
  (``ai-analyzer/analyzer/models/log.py:177-199``) -> a real
  ``map<string,string>`` column;
- k8s klog lines with single-char levels
  (``log_generator.py:273-339``; CRI parser in
  ``helm/timberline/templates/fluent-bit-configmap.yaml:123-127``);
- flexible timestamp parsing with deterministic sentinel fallback
  (``stream.go:20-58`` — the reference falls back to now(); we fall back to
  the row's ``ts`` column so reruns are byte-identical).

Two implementations with identical output:

- ``impl="native"`` (default): ``regexp_extract`` + ``from_json`` — JVM-side,
  whole-stage-codegen, zero Python in the hot path. This is the 100 TB path.
- ``impl="pandas"``: one vectorized Arrow-batched pandas UDF applying the
  precompiled regexes + ``json.loads`` and returning a struct — the "Lua
  scripting filter" extension point (``fluent-bit-configmap.yaml:59-62``)
  expressed the Spark way. Kept for parity testing and for grammars that
  outgrow the declarative path.

Regex patterns use only constructs Java regex and RE2 (DuckDB) parse
identically, so the DuckDB oracle re-runs the same patterns; the JSON path
is oracled with DuckDB's json_extract_string on the same JSONPaths.
"""

from __future__ import annotations

import json
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
RE_KLOG = (
    r"^([IEWF])([0-9]{4}) ([0-9]{2}:[0-9]{2}:[0-9]{2})\.[0-9]{6} 1 "
    r"([A-Za-z0-9-]+)\.go:([0-9]+)] (.*)$"
)
RE_FB_LOG = r"^([A-Z]+) (.*)$"  # level prefix inside the Fluent Bit log field
RE_CONV_NUM = r"^conv-([0-9]+)$"

TS_FMT = "yyyy-MM-dd HH:mm:ss"

# permissive schema for the dual-shape JSON ingest: the union of both
# accepted shapes; from_json leaves absent keys null (PERMISSIVE mode)
JSON_SCHEMA = (
    "level string, service string, message string,"
    " date double, log string, source string,"
    " labels map<string,string>, kubernetes_labels map<string,string>,"
    " kubernetes struct<labels:map<string,string>>"
)

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

PARSED_FIELDS = ["grammar", "level_raw", "service", "message", "text_ts_ms", "labels"]


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


def seconds_heuristic_ms(num: Column) -> Column:
    """P6: numeric timestamp < 1e12 is seconds -> millis (stream.go:77-90)."""
    return F.when(num < 1e12, (num * 1000).cast("long")).otherwise(
        num.cast("long")
    )


def _nullif_empty(c: Column) -> Column:
    return F.when(c == "", None).otherwise(c)


def parse_turns(df: DataFrame, impl: str = "native") -> DataFrame:
    """Add parsed columns to a transcripts DataFrame.

    Adds: grammar, level_raw, service, message, text_ts_ms (epoch millis
    parsed out of the text, null when the grammar carries no timestamp),
    labels (open map<string,string> metadata after the 3-path fallback),
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
    j = F.when(t.startswith("{"), F.from_json(t, JSON_SCHEMA))
    plain_lvl = _nullif_empty(F.regexp_extract(t, RE_PLAIN, 2))
    json_lvl = j["level"]
    fb_lvl = F.when(
        j["log"].isNotNull(), _nullif_empty(F.regexp_extract(j["log"], RE_FB_LOG, 1))
    )
    klog_char = _nullif_empty(F.regexp_extract(t, RE_KLOG, 1))
    grammar = (
        F.when(plain_lvl.isNotNull(), "plain")
        .when(json_lvl.isNotNull(), "json")
        .when(fb_lvl.isNotNull(), "fluentbit")
        .when(klog_char.isNotNull(), "klog")
    )
    level_raw = F.coalesce(plain_lvl, json_lvl, fb_lvl, klog_char)
    # direct shape carries `service`, Fluent Bit shape carries `source`
    service = F.coalesce(
        _nullif_empty(F.regexp_extract(t, RE_PLAIN, 3)),
        j["service"],
        j["source"],
        _nullif_empty(F.regexp_extract(t, RE_KLOG, 4)),
    )
    message = (
        F.when(plain_lvl.isNotNull(), F.regexp_extract(t, RE_PLAIN, 4))
        .when(json_lvl.isNotNull(), j["message"])
        .when(fb_lvl.isNotNull(), F.regexp_extract(j["log"], RE_FB_LOG, 2))
        .when(klog_char.isNotNull(), F.regexp_extract(t, RE_KLOG, 6))
    )
    # Flexible timestamp (P5/P6 analog): the plain grammar embeds a full
    # wall-clock date; the Fluent Bit shape a float epoch (seconds-vs-millis
    # heuristic). try_to_timestamp -> null on failure (no error).
    plain_ts = F.try_to_timestamp(
        _nullif_empty(F.regexp_extract(t, RE_PLAIN, 1)), F.lit(TS_FMT)
    )
    text_ts_ms = F.coalesce(
        F.unix_millis(plain_ts),
        F.when(fb_lvl.isNotNull(), seconds_heuristic_ms(j["date"])),
    )
    # P15 label fallback chain (models/log.py:177-199)
    labels = F.coalesce(
        j["labels"], j["kubernetes_labels"], j["kubernetes"]["labels"]
    )
    return (
        df.withColumn("grammar", grammar)
        .withColumn("level_raw", level_raw)
        .withColumn("service", service)
        .withColumn("message", message)
        .withColumn("text_ts_ms", text_ts_ms)
        .withColumn("labels", labels)
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
        T.StructField("labels", T.MapType(T.StringType(), T.StringType())),
    ]
)

_C_PLAIN = re.compile(RE_PLAIN)
_C_KLOG = re.compile(RE_KLOG)
_C_FB = re.compile(RE_FB_LOG, re.DOTALL)


def _grok_batch(texts: pd.Series) -> pd.DataFrame:
    """Vectorized grok over one Arrow batch: .str.extract + json.loads."""
    out = pd.DataFrame(index=texts.index)
    plain = texts.str.extract(_C_PLAIN)
    klog = texts.str.extract(_C_KLOG)

    def _load(s):
        if isinstance(s, str) and s.startswith("{"):
            try:
                return json.loads(s)
            except ValueError:
                return None
        return None

    parsed = texts.map(_load)

    def _field(k):
        return parsed.map(lambda d: d.get(k) if isinstance(d, dict) else None)

    j_lvl, j_svc, j_msg = _field("level"), _field("service"), _field("message")
    j_log, j_src, j_date = _field("log"), _field("source"), _field("date")
    fb = j_log.map(lambda s: _C_FB.match(s) if isinstance(s, str) else None)
    fb_lvl = fb.map(lambda m: m.group(1) if m else None)
    fb_msg = fb.map(lambda m: m.group(2) if m else None)

    def _labels(d):
        if not isinstance(d, dict):
            return None
        for path in ("labels", "kubernetes_labels"):
            if isinstance(d.get(path), dict):
                return d[path]
        k8s = d.get("kubernetes")
        if isinstance(k8s, dict) and isinstance(k8s.get("labels"), dict):
            return k8s["labels"]
        return None

    labels = parsed.map(_labels)

    has_plain = plain[1].notna()
    has_json = j_lvl.notna() & ~has_plain
    has_fb = fb_lvl.notna() & ~has_plain & ~has_json
    has_klog = klog[0].notna() & ~has_plain & ~has_json & ~has_fb

    out["grammar"] = pd.Series(pd.NA, index=texts.index, dtype="object")
    out.loc[has_plain, "grammar"] = "plain"
    out.loc[has_json, "grammar"] = "json"
    out.loc[has_fb, "grammar"] = "fluentbit"
    out.loc[has_klog, "grammar"] = "klog"

    out["level_raw"] = plain[1].where(
        has_plain, j_lvl.where(has_json, fb_lvl.where(has_fb, klog[0]))
    )
    out["service"] = plain[2].where(
        has_plain, j_svc.where(has_json, j_src.where(has_fb, klog[3]))
    )
    out["message"] = plain[3].where(
        has_plain, j_msg.where(has_json, fb_msg.where(has_fb, klog[5]))
    )
    ts = pd.to_datetime(
        plain[0].where(has_plain), format="%Y-%m-%d %H:%M:%S", errors="coerce"
    )
    ms = (ts - pd.Timestamp("1970-01-01")) / pd.Timedelta(milliseconds=1)
    fb_ms = j_date.map(
        lambda v: None
        if v is None or v != v  # None or NaN (pandas coerces None -> NaN)
        else int(v * 1000) if v < 1e12 else int(v)
    )
    out["text_ts_ms"] = ms.astype("Int64").where(has_plain, fb_ms.where(has_fb))
    out["labels"] = labels
    return out


def _parse_pandas(df: DataFrame) -> DataFrame:
    grok = F.pandas_udf(_grok_batch, returnType=_GROK_SCHEMA)
    # materialize the struct once, then expand — avoids re-running the UDF
    # per extracted field
    df = df.withColumn("_grok", grok(F.col("text")))
    for f in PARSED_FIELDS:
        df = df.withColumn(f, F.col("_grok")[f])
    return df.drop("_grok")
