"""Unit tests for the grok parse stage — mirrors the reference's parser tests
(log-ingestor/internal/handlers/flexible_timestamp_test.go,
stream_fluentbit_test.go): each grammar, each fallback, verbatim text
preservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from timberline_spark.parse import parse_turns

ROWS = [
    # (conv_id, turn_idx, role, text, tool, expected)
    (
        "conv-000000001",
        0,
        "user",
        "2024-03-01 10:00:00 ERROR [svc-1] Connection refused",
        "",
        dict(grammar="plain", level_raw="ERROR", service="svc-1",
             message="Connection refused", text_ts_ms=1709287200000),
    ),
    (
        "conv-000000001",
        1,
        "assistant",
        '{"level":"WARN","service":"svc-2","message":"Rate limit exceeded"}',
        "http",
        dict(grammar="json", level_raw="WARN", service="svc-2",
             message="Rate limit exceeded", text_ts_ms=None),
    ),
    (
        "conv-000000001",
        2,
        "tool",
        "E0301 10:00:00.000000 1 svc-3.go:42] pod crash loop ñ中文",
        "bash",
        dict(grammar="klog", level_raw="E", service="svc-3",
             message="pod crash loop ñ中文", text_ts_ms=None),
    ),
    (
        "conv-000000001",
        3,
        "user",
        "???unparseable???",
        "",
        dict(grammar=None, level_raw=None, service=None, message=None,
             text_ts_ms=None),
    ),
    (
        "conv-000000001",
        4,
        "user",
        "",
        "",
        dict(grammar=None, level_raw=None, service=None, message=None,
             text_ts_ms=None),
    ),
    # JSON-in-log stays verbatim: message containing embedded structures is
    # not re-parsed (flexible_timestamp_test.go:192-229)
    (
        "conv-000000002",
        0,
        "user",
        '2024-03-01 11:00:00 INFO [svc-4] payload {"a": 1} kept verbatim',
        "",
        dict(grammar="plain", level_raw="INFO", service="svc-4",
             message='payload {"a": 1} kept verbatim',
             text_ts_ms=1709290800000),
    ),
]


def _mk_df(spark):
    return spark.createDataFrame(
        [(c, i, r, t, tool, __import__("datetime").datetime(2024, 3, 1)) for c, i, r, t, tool, _ in ROWS],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def _check(rows):
    got = {(r["conv_id"], r["turn_idx"]): r for r in rows}
    for conv_id, turn_idx, _, _, _, exp in ROWS:
        r = got[(conv_id, turn_idx)]
        for k, v in exp.items():
            assert r[k] == v, f"({conv_id},{turn_idx}).{k}: {r[k]!r} != {v!r}"


def test_parse_native(spark):
    df = parse_turns(_mk_df(spark), impl="native")
    _check([r.asDict() for r in df.collect()])


def test_parse_pandas(spark):
    df = parse_turns(_mk_df(spark), impl="pandas")
    _check([r.asDict() for r in df.collect()])


def test_conv_key_is_cross_engine_string_hash(spark):
    from timberline_spark.extras.xhash import py_char_hash

    df = parse_turns(_mk_df(spark))
    keys = {r.conv_id: r.conv_key for r in df.select("conv_id", "conv_key").distinct().collect()}
    assert keys == {c: py_char_hash(c) for c in keys}
    assert all(k is not None for k in keys.values())


def test_flexible_timestamp_formats(spark):
    """Every timestamp format the reference accepts (stream.go:31-53,
    log_generator.py:70-79), incl. the seconds-vs-millis heuristic
    (stream.go:77-90); unparseable -> NULL sentinel (never now())."""
    from pyspark.sql import functions as F

    from timberline_spark.parse import flexible_ts_ms

    cases = [
        ("2024-03-01 10:00:00", 1709287200000),
        ("2024-03-01 10:00:00.123", 1709287200123),
        ("2024-03-01T10:00:00Z", 1709287200000),
        ("2024-03-01T10:00:00", 1709287200000),
        ("2024-03-01T10:00:00.123Z", 1709287200123),
        ("2024/03/01 10:00:00", 1709287200000),
        ("2024-03-01 10:00:00,123", 1709287200123),
        ("1709287200", 1709287200000),  # unix seconds -> x1000
        ("1709287200123", 1709287200123),  # already millis
        ("garbage", None),
        ("", None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = {r.s: r.ms for r in df.select("s", flexible_ts_ms(F.col("s")).alias("ms")).collect()}
    for s, exp in cases:
        assert got[s] == exp, (s, got[s], exp)


def test_text_preserved_verbatim(spark):
    """The pipeline never mutates the raw text column."""
    df = parse_turns(_mk_df(spark))
    texts = [r.text for r in df.orderBy("conv_id", "turn_idx").collect()]
    assert texts == [t for _, _, _, t, _, _ in ROWS]
