"""PII/identifier redaction: class coverage, ordering, plan shape."""

from __future__ import annotations

from timberline_spark.redact import redact_turns


def _run(spark, texts):
    tr = spark.createDataFrame(
        [("c", i, t) for i, t in enumerate(texts)],
        "conv_id string, turn_idx int, text string",
    )
    return {r.turn_idx: r for r in redact_turns(tr).collect()}


def test_redaction_classes(spark):
    rows = _run(
        spark,
        [
            "contact alice.smith+dev@example.co.uk for access",
            "peer at 10.42.0.17 dropped the connection",
            "resume sess-8842 for user u91",
            "nothing sensitive here",
        ],
    )
    assert rows[0].redacted_text == "contact <EMAIL> for access"
    assert rows[0].n_email == 1 and rows[0].n_redacted == 1
    assert rows[1].redacted_text == "peer at <IP> dropped the connection"
    assert rows[1].n_ipv4 == 1
    assert rows[2].redacted_text == "resume <SESSION> for user <USER>"
    assert rows[2].n_session == 1 and rows[2].n_user == 1 and rows[2].n_redacted == 2
    assert rows[3].redacted_text == "nothing sensitive here"
    assert rows[3].n_redacted == 0


def test_redaction_overlap_counts_on_original_text(spark):
    # the email's local part also matches the user-handle pattern; the
    # email class wins the replacement, both classes count (documented)
    rows = _run(spark, ["mail u7@host.io now"])
    r = rows[0]
    assert r.redacted_text == "mail <EMAIL> now"
    assert r.n_email == 1 and r.n_user == 1 and r.n_redacted == 2


def test_redaction_plan_is_projection_only(spark):
    tr = spark.createDataFrame(
        [("c", 0, "x")], "conv_id string, turn_idx int, text string"
    )
    plan = redact_turns(tr)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
