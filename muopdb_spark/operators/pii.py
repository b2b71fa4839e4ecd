"""PII scrubbing / text normalization for training-data pipelines.

Redacts personally-identifiable spans (emails, phone numbers, SSN-style
ids, IPv4 addresses, long digit runs) from a text column and reports
per-document counts per category — the standard privacy pass applied
to web corpora before LLM pretraining.

Beyond-reference operator (BASELINE.json north star).

Design constraints:
  - Pure Column expressions (regexp_replace / regexp_extract_all) —
    fully map-side, JVM regex engine, no shuffle, no Python. At 100 TB
    this pass is scan-bound, exactly as it should be.
  - Patterns deliberately restricted to constructs with identical
    semantics in Java regex (Spark) and RE2 (DuckDB): no lookaround,
    no backreferences, greedy bounded quantifiers, `\\b`, non-capturing
    groups. The DuckDB oracle runs the same patterns verbatim.
  - Categories are applied IN ORDER, each counting matches on the text
    as redacted so far — so a digit run inside an already-redacted
    email is not double-counted. Both engines express this as staged
    expressions, so results agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters (see module docstring).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # international (+-prefixed) OR bare NANP 3-3-4 — the r10
    # real-corpus smoke caught 555-867-5309 leaking through the
    # +-only pattern. All nine separator combinations over {-, ., ' '}
    # are redacted: r10 required a CONSISTENT separator (mixed forms
    # like "555-867.5309" read as technical prose to some), but on the
    # privacy-sensitive side RECALL wins — an unredacted real number
    # is a worse failure than a redacted version string (r11 ADVICE).
    # RE2 (the DuckDB oracle engine) has no backreferences, so the
    # 3x3 separator product is spelled as nine explicit alternatives
    # rather than ([-. ])...([-. ]) with \1 checks.
    ("phone",
     r"\+\d[\d -]{7,14}\d"
     r"|\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
     "<PHONE>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("longnum", r"\b\d{9,}\b", "<NUM>"),
]


def count_matches(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches of `pattern` in `text`."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def scrub_pii(
    df: DataFrame, *, text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """Adds `n_<category>` count columns and a `redacted` text column.

    Counts are per-stage (each category counted on the output of the
    previous category's redaction), so overlapping categories never
    double-count. All other input columns pass through untouched.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    stage = F.col(text_col)
    out = df
    for name, rx, repl in pats:
        # count on the current stage, then redact for the next stage;
        # staging through a real column keeps each regex evaluated once
        out = out.withColumn(f"n_{name}", count_matches(stage, rx))
        out = out.withColumn(f"_pii_stage_{name}", F.regexp_replace(stage, rx, repl))
        stage = F.col(f"_pii_stage_{name}")
    out = out.withColumn("redacted", stage)
    return out.drop(*[f"_pii_stage_{name}" for name, _, _ in pats])
