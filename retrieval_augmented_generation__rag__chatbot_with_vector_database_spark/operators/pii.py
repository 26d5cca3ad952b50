"""PII detection + scrubbing for a training-data pipeline at scale.

The reference ingests raw user documents without any PII handling
(``scripts/ingest_documents.py:42-64`` loads text verbatim into the
vector store); a corpus pipeline feeding model training must scrub
identifiers before anything else touches the text. Implemented as
pure SQL regex expressions — codegen'd JVM-side, one narrow map over
the corpus, zero shuffles — so at 100 TB this is scan-bandwidth-bound
and embarrassingly parallel (the same shape as ``operators.textstats``).

Pattern dialect: every regex below is valid and equivalent in BOTH
Java (Spark) and RE2 (DuckDB oracle) — no backrefs, no lookaround —
so the oracle executes the identical automaton.

Categories are mutually non-overlapping by construction (an SSN
``ddd-dd-dddd`` cannot match the phone ``ddd-ddd-dddd``; an IPv4 needs
three dots where a phone has two), so per-category counts are
independent of scrub order and counting on the ORIGINAL text equals
counting interleaved with replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (category, regex, replacement token) — ordered, though order is
#: immaterial for these non-overlapping patterns (see module doc).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CARD]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IPV4]"),
]


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_counts(
    text: Column | str,
    patterns: list[tuple[str, str, str]] | None = None,
) -> dict[str, Column]:
    """Per-category match counts on the ORIGINAL text column — valid
    as independent counts because the default patterns are mutually
    non-overlapping. For pattern sets where one class can swallow
    another's span (e.g. a greedy phone run inside an email),
    count SHIELDED instead: ``operators.textstats.pii_counts`` counts
    class k after classes < k are replaced."""
    t = _col(text)
    return {
        cat: F.regexp_count(t, F.lit(pat))
        for cat, pat, _ in (patterns or PII_PATTERNS)
    }


def pii_scrub(
    text: Column | str,
    patterns: list[tuple[str, str, str]] | None = None,
) -> Column:
    """Replace every PII match with its category token — the one
    sequential regexp_replace fold both pattern dialects share
    (``operators.textstats.redact_pii`` delegates here with its
    legacy shielded pattern list). Idempotent for the default set:
    no replacement token matches any pattern, so scrub(scrub(x)) ==
    scrub(x)."""
    out = _col(text)
    for _, pat, token in patterns or PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_documents(
    df: DataFrame, text_col: str = "text", keep_text: bool = True
) -> DataFrame:
    """Append per-category ``n_<cat>`` counts, a total ``n_pii``, and
    the scrubbed text column ``<text_col>_scrubbed``.

    ``keep_text=False`` drops the raw column — the shape a 100 TB
    scrub-and-rewrite job wants (never carry the unscrubbed bytes past
    this operator)."""
    counts = pii_counts(F.col(text_col))
    out = df
    for cat in counts:
        out = out.withColumn(f"n_{cat}", counts[cat].cast("long"))
    out = out.withColumn(
        "n_pii",
        sum(F.col(f"n_{cat}") for cat, _, _ in PII_PATTERNS).cast("long"),
    ).withColumn(f"{text_col}_scrubbed", pii_scrub(F.col(text_col)))
    if not keep_text:
        out = out.drop(text_col)
    return out
