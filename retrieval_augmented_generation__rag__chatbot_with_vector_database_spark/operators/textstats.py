"""Text analysis operators for a training-data pipeline at scale:
language ID, quality scoring, token counting, document fingerprinting.

The reference implies these needs (chunking + metadata over financial
text, ``scripts/ingest_documents.py``); a 100 TB corpus pipeline makes
them first-class. Everything here is pure SQL expressions — codegen'd
JVM-side, no Python on the hot path — so the operators are just column
builders over ``documents``-shaped frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
    quality_features,
    token_count,
)

# Tiny per-language function-word lists for the stopword-vote language
# heuristic. Chosen to be unambiguous across the five fixture
# languages (FIXTURES.md: en/de/es/fr/zh).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "with", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "es": ["el", "la", "que", "los", "es"],
    "fr": ["le", "les", "des", "est", "dans"],
}


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker hit counts: ONE tokenize pass (split on
    non-alphanumerics — equivalent to per-marker ``\\b`` boundary
    matches for these ASCII function words) + one array membership
    filter per language, instead of a regexp split per marker word
    (20 regex passes over every document, several of which the
    argmax when-chain re-evaluates). CJK is detected by
    unicode-range ratio."""
    t = F.lower(F.col(text) if isinstance(text, str) else text)
    toks = F.split(t, r"[^a-z0-9]+")
    scores: dict[str, Column] = {
        lang: F.size(F.filter(toks, lambda x: x.isin(*words)))
        for lang, words in LANG_MARKERS.items()
    }
    # zh: percentage of CJK codepoints (double — no int cast, DuckDB
    # rounds on int casts while Spark truncates)
    total = F.length(t)
    cjk = total - F.length(F.regexp_replace(t, r"[一-鿿]", ""))
    scores["zh"] = F.when(total > 0, (cjk * 100.0) / total).otherwise(F.lit(0.0))
    return scores


def detect_language(text: Column | str) -> Column:
    """Argmax over marker votes; 'zh' wins if CJK ratio > 5%;
    'unknown' when no marker fires. Deterministic tiebreak by language
    code order (en < de < es < fr handled by explicit precedence)."""
    s = lang_scores(text)
    return (
        F.when(s["zh"] > 5, F.lit("zh"))
        .when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] > 0),
            F.lit("en"),
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] > 0), F.lit("de"))
        .when((s["es"] >= s["fr"]) & (s["es"] > 0), F.lit("es"))
        .when(s["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0, 1]: rewards mid-length docs
    with mostly alphabetic text and typical stopword density; punishes
    digit/punct-heavy or fragmentary text. A cheap first-pass corpus
    filter (the C4/Gopher-style rules, SQL-only)."""
    f = quality_features(text)
    len_ok = F.when((f["n_chars"] >= 200) & (f["n_chars"] <= 20000), 1.0).otherwise(0.5)
    tok_ok = F.when((f["mean_token_len"] >= 3) & (f["mean_token_len"] <= 12), 1.0).otherwise(
        0.5
    )
    punct_ok = F.when(f["punct_ratio"] <= 0.2, 1.0).otherwise(0.4)
    digit_ok = F.when(f["digit_ratio"] <= 0.2, 1.0).otherwise(0.4)
    return F.round(0.25 * len_ok + 0.25 * tok_ok + 0.25 * punct_ok + 0.25 * digit_ok, 6)


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 of whitespace-normalized, lowercased
    text — the normalization-robust exact-dup key (vs the raw chunk id
    which is byte-exact, ``functions.text.chunk_id``)."""
    t = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    return F.md5(norm.cast("binary"))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document repetition signal (the Gopher-style filter rule):
    top-bigram share = occurrences of the most frequent word bigram /
    total bigrams. Boilerplate and template spam score high; docs with
    < 2 tokens drop out (no bigrams).

    Plan shape: tokenize once (projected — HOFs don't CSE), explode
    bigrams, two hash aggregations; partial map-side combine keeps the
    shuffle ∝ distinct (doc, bigram), not total tokens."""
    t = F.lower(F.col(text_col))
    toks = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        F.filter(F.split(t, r"[^a-z0-9]+"), lambda x: x != "").alias("__arr"),
    )
    arr = F.col("__arr")
    bigrams = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - 2),
            lambda i: F.concat_ws(" ", arr[i], arr[i + 1]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = toks.select("id", *extra_cols, F.explode(bigrams).alias("bigram"))
    cnt = bi.groupBy("id", *extra_cols, "bigram").agg(F.count("*").alias("c"))
    return (
        cnt.groupBy("id", *extra_cols)
        .agg(F.sum("c").alias("total_bigrams"), F.max("c").alias("top_bigram_count"))
        .withColumn(
            "top_bigram_share",
            F.col("top_bigram_count").cast("double") / F.col("total_bigrams"),
        )
    )


#: (n, mode) per Gopher Table A1: top-n-gram share for short n-grams,
#: duplicate-n-gram mass for long ones
GOPHER_NGRAMS: tuple[tuple[int, str], ...] = (
    (2, "top"),
    (3, "top"),
    (4, "top"),
    (5, "dup"),
    (8, "dup"),
    (10, "dup"),
)


#: Rae et al. 2021 (Gopher) Table A1 repetition-filter thresholds for
#: the signals :func:`gopher_repetition_stats` computes — a document
#: whose share EXCEEDS any bound is filtered. Public numbers from the
#: paper; exposed so pipelines and oracles gate on the same constants.
GOPHER_THRESHOLDS: dict[str, float] = {
    "top_2gram_share": 0.20,
    "top_3gram_share": 0.18,
    "top_4gram_share": 0.16,
    "dup_5gram_share": 0.15,
    "dup_8gram_share": 0.12,
    "dup_10gram_share": 0.10,
}


def gopher_repetition_gate(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_col, gopher_ok): True iff EVERY Gopher repetition share is
    within its Table A1 bound. One call to
    :func:`gopher_repetition_stats`; the conjunction folds JVM-side."""
    stats = gopher_repetition_stats(df, id_col)
    ok = F.lit(True)
    for col, bound in GOPHER_THRESHOLDS.items():
        ok = ok & (F.col(col) <= F.lit(bound))
    return stats.select(id_col, ok.alias("gopher_ok"))


def gopher_repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full Gopher repetition-filter signal set (Rae et al. 2021,
    Table A1's n-gram rules): per document, ``top_{n}gram_share`` for
    n=2,3,4 (occurrences of the most frequent word n-gram / total
    n-grams — generalizing :func:`repetition_stats`) and
    ``dup_{n}gram_share`` for n=5,8,10 (count MASS of n-grams occurring
    more than once / total n-grams; Gopher's exact rule measures
    character coverage of duplicate n-grams — the count-mass form is
    the standard streaming approximation and upper-bounds it). Docs
    with fewer than n tokens score 0.0 for that n (nothing to repeat).

    Plan shape: tokenize once, then per n one explode + two hash
    aggregations (map-side partial combine; shuffle ∝ distinct
    (doc, n-gram)); the six per-n frames join back on the doc id —
    all JVM-side, no UDFs."""
    t = F.lower(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"),
        F.filter(F.split(t, r"[^a-z0-9]+"), lambda x: x != "").alias("__arr"),
    )
    arr = F.col("__arr")

    def _gram(width: int):
        # closure, NOT a default arg: a 2-param lambda would be read
        # by transform() as (element, index)
        return lambda i: F.concat_ws(" ", *[arr[i + j] for j in range(width)])

    out = base.select("id")
    for n, mode in GOPHER_NGRAMS:
        grams = F.when(
            F.size(arr) >= n,
            F.transform(F.sequence(F.lit(0), F.size(arr) - n), _gram(n)),
        ).otherwise(F.array().cast("array<string>"))
        g = base.select("id", F.explode(grams).alias("g"))
        cnt = g.groupBy("id", "g").agg(F.count("*").alias("c"))
        if mode == "top":
            col = f"top_{n}gram_share"
            per = cnt.groupBy("id").agg(
                (F.max("c").cast("double") / F.sum("c")).alias(col)
            )
        else:
            col = f"dup_{n}gram_share"
            per = cnt.groupBy("id").agg(
                (
                    F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).cast(
                        "double"
                    )
                    / F.sum("c")
                ).alias(col)
            )
        out = out.join(per, "id", "left").withColumn(
            col, F.round(F.coalesce(F.col(col), F.lit(0.0)), 6)
        )
    return out.withColumnRenamed("id", id_col)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the full analysis column set — one projection, one pass."""
    f = quality_features(text_col)
    return df.select(
        "*",
        f["n_tokens"].alias("n_tokens"),
        F.round(f["mean_token_len"], 6).alias("mean_token_len"),
        F.round(f["punct_ratio"], 6).alias("punct_ratio"),
        F.round(f["digit_ratio"], 6).alias("digit_ratio"),
        F.round(f["stopword_ratio"], 6).alias("stopword_ratio"),
        detect_language(text_col).alias("detected_lang"),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("fingerprint"),
    )


__all__ = [
    "detect_language",
    "lang_scores",
    "quality_score",
    "fingerprint",
    "repetition_stats",
    "gopher_repetition_stats",
    "gopher_repetition_gate",
    "GOPHER_THRESHOLDS",
    "text_profile",
    "token_count",
]


# PII scrubbing: the redaction pass every released training corpus
# runs (emails, phone-like digit runs, IPv4, simple card-like runs).
# Patterns are deliberately the RE2-safe subset (no lookaround, no
# backreferences) so they compile identically under Java regex
# (Spark, whole-stage codegen) and RE2 (DuckDB/Go tooling a corpus
# team cross-checks with). Order matters: EMAIL before PHONE keeps
# digit-bearing local parts from being half-eaten; IP before PHONE
# keeps dotted quads out of the phone pattern.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("card", r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b", "<CARD>"),
    ("phone", r"\+?\d[\d \-()]{7,}\d", "<PHONE>"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace PII-shaped spans with typed placeholder tokens —
    JVM-side ``regexp_replace`` chain, no Python in the path. The
    replacement is applied in ``PII_PATTERNS`` order on the running
    result, so earlier classes shield their spans from later, greedier
    patterns (an email's digits never re-match as a phone). The fold
    itself is ``operators.pii.pii_scrub`` — this list is the
    shielded/greedy dialect (broad phone runs), that module's default
    list is the non-overlapping dialect with per-doc count columns,
    queries, and the streaming scrub.

    This is a pattern scrubber, not an NER system: it removes the
    mechanically-identifiable classes (the pass corpus releases run at
    minimum); names/addresses need a model-based pass through the
    same column-transform seam.
    """
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.pii import (
        pii_scrub,
    )

    return pii_scrub(text, patterns=PII_PATTERNS)


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-class match counts (for audit reports / drop thresholds).
    Counted on the SAME shielded sequence as ``redact_pii`` — class k
    is counted after classes < k have been replaced — so the counts
    sum to exactly the number of placeholders the scrubber emits."""
    col = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    for name, pat, token in PII_PATTERNS:
        out[name] = F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0)))
        col = F.regexp_replace(col, F.lit(pat), F.lit(token))
    return out
