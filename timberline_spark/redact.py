"""PII / identifier redaction over raw transcript text.

The reference forwards log text to an external LLM provider for analysis
(ai-analyzer llm_client.py — raw messages embedded in the prompt) and stores
raw text in its results store; scrubbing user-identifying tokens BEFORE the
text leaves the pipeline is the standard compliance prerequisite for that
hand-off. This module is that scrubber, Spark-first: a fixed, ordered chain
of ``regexp_replace`` expressions — pure per-row projection inside the scan
stage (no shuffle, no UDF, whole-stage codegen), so at 100 TB it rides the
same scan as parsing and costs only CPU.

Patterns are chosen to be portable between Java regex (Spark) and RE2
(DuckDB oracle): character classes + bounded quantifiers + ``\\b``, no
lookaround, no backreferences.

Semantics:
- Replacements are applied IN ORDER (email, ipv4, session, user); an
  earlier class consumes its text before later patterns see it.
- Per-class counts are measured on the ORIGINAL text, so overlapping
  classes (an email whose local part looks like a user handle) are counted
  in every class they match; ``n_redacted`` is the sum of class counts.
  Both engines implement exactly this, so the contract is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (class name, regex, replacement) — applied in order.
REDACT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("session", r"\bsess-[0-9]+\b", "<SESSION>"),
    ("user", r"\bu[0-9]+\b", "<USER>"),
)


def redact_text(col: Column) -> Column:
    out = col
    for _name, pat, repl in REDACT_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_counts(col: Column) -> list[Column]:
    """One count column per class, measured on the un-redacted text."""
    return [
        F.regexp_count(col, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _repl in REDACT_PATTERNS
    ]


def redact_turns(tr: DataFrame) -> DataFrame:
    counts = redact_counts(F.col("text"))
    # total = sum of the SAME count expressions (not a rebuilt regexp_count
    # chain): each class regex is evaluated once per row in the projection
    total = None
    for c in counts:
        total = c if total is None else total + c
    return tr.select(
        "conv_id",
        "turn_idx",
        redact_text(F.col("text")).alias("redacted_text"),
        *counts,
        total.alias("n_redacted"),
    )
