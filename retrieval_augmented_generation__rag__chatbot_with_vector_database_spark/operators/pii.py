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

Counting is SHIELDED (class k is counted after classes < k are
replaced, same sequence as the scrub), so the per-category counts sum
to exactly the number of placeholder tokens the scrub emits — even in
adversarial text where one class's span contains another's shape
(e.g. a phone-shaped email local part ``123-456-7890@x.com``: one
[EMAIL], zero [PHONE]).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (category, regex, replacement token) — ordered (earlier classes
#: shield later ones, see module doc). Exact covered formats:
#:
#: - email: ``local@domain.tld`` (RFC-ish local part charset)
#: - ssn:   ``\d{3} SEP \d{2} SEP \d{4}`` with SEP ∈ {-, space}
#:          (``123-45-6789``, ``123 45 6789``); bare 9-digit runs are
#:          NOT matched (too many false positives on ordinary ids)
#: - card:  four 4-digit groups, separators ∈ {-, space} or none
#:          (``4111-1111-1111-1111``, ``4111 1111 1111 1111``,
#:          ``4111111111111111``); runs of ≠16 digits never match
#:          (the trailing ``\b`` kills 17+-digit runs)
#: - phone: NANP 10-digit with area code either parenthesized
#:          (``(415) 555-0134``, optional space after the paren) or
#:          bare with separators ∈ {-, ., space}
#:          (``415-555-0134``, ``415.555.0134``, ``415 555 0134``);
#:          bare 10-digit runs are NOT matched
#: - ipv4:  dotted quads of 1-3 digits (documented over-capture:
#:          3-dot version strings match; out-of-range octets match)
#:
#: Documented over-capture beyond ipv4 (the space-separator cost):
#: the space-SEP ssn and phone alternatives also match ordinary
#: digit-group runs — tabular numbers like ``100 200 3000`` scrub to
#: ``[PHONE]`` and ``123 45 6789``-shaped quantity columns to
#: ``[SSN]``. This is the chosen trade-off: space-separated is how
#: real SSNs/phones appear in prose, and a training-corpus scrub
#: prefers false positives over leaks. Profiling callers
#: (``pii_counts``-based dashboards) should expect inflated
#: ssn/phone counts on digit-dense text; scrub-gate callers lose
#: only the digit groups, never surrounding text.
#:
#: Callers relying on ``keep_text=False`` as a scrub gate should
#: treat anything outside these shapes (international phone formats,
#: IBANs, passport numbers, free-text names/addresses) as UNCOVERED.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}[- ]\d{2}[- ]\d{4}\b", "[SSN]"),
    ("card", r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b", "[CARD]"),
    ("phone", r"(?:\(\d{3}\) ?|\b\d{3}[-. ])\d{3}[-. ]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IPV4]"),
]


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_counts(
    text: Column | str,
    patterns: list[tuple[str, str, str]] | None = None,
) -> dict[str, Column]:
    """Per-category SHIELDED match counts: class k is counted on the
    text with classes < k already replaced — the same sequence
    ``pii_scrub`` walks — so the counts sum to exactly the number of
    placeholders the scrub emits. (Counting every class on the raw
    text instead would double-count spans that match two shapes, e.g.
    a phone-shaped email local part.)"""
    if patterns is None:
        patterns = PII_PATTERNS
    cur = _col(text)
    out: dict[str, Column] = {}
    for cat, pat, token in patterns:
        out[cat] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, token)
    return out


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
    if patterns is None:
        patterns = PII_PATTERNS
    out = _col(text)
    for _, pat, token in patterns:
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
