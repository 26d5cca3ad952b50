"""Text-analysis queries (operators.textstats) over ``documents``:
token counting, quality features, language ID, fingerprinting.
The oracle SQL is generated from the same marker lists / formulas so
both engines execute the identical heuristic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import (
    textstats,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.textstats import (
    LANG_MARKERS,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (
    load,
    register,
)


@register(
    "text_token_counts",
    r"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
       length(text) AS n_chars
FROM documents
""",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
        token_count,
    )

    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "text_quality_profile",
    r"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks,
         length(regexp_replace(text, '\s', '', 'g')) AS nonspace,
         length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
  FROM documents
)
SELECT doc_id,
       toks AS n_tokens,
       round(CASE WHEN toks > 0 THEN nonspace * 1.0 / toks ELSE 0.0 END, 6) AS mean_token_len,
       round(CASE WHEN nonspace > 0 THEN n_punct * 1.0 / nonspace ELSE 0.0 END, 6) AS punct_ratio,
       round(CASE WHEN nonspace > 0 THEN n_digit * 1.0 / nonspace ELSE 0.0 END, 6) AS digit_ratio,
       round(CASE WHEN nonspace > 0 THEN n_upper * 1.0 / nonspace ELSE 0.0 END, 6) AS upper_ratio
FROM f
""",
)
def text_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features (C4/Gopher-style rules, SQL-only)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
        quality_features,
    )

    docs = load(spark, sf_dir, "documents")
    f = quality_features("text")
    return docs.select(
        "doc_id",
        f["n_tokens"].alias("n_tokens"),
        F.round(f["mean_token_len"], 6).alias("mean_token_len"),
        F.round(f["punct_ratio"], 6).alias("punct_ratio"),
        F.round(f["digit_ratio"], 6).alias("digit_ratio"),
        F.round(f["upper_ratio"], 6).alias("upper_ratio"),
    )


def _duck_hits(lang: str) -> str:
    # same single-tokenize semantics as textstats.lang_scores
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        "len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
        f"x -> x IN ({words})))"
    )


_LANGID_ORACLE = rf"""
WITH s AS (
  SELECT doc_id, lang,
         {_duck_hits('en')} AS en_h,
         {_duck_hits('de')} AS de_h,
         {_duck_hits('es')} AS es_h,
         {_duck_hits('fr')} AS fr_h,
         CASE WHEN length(lower(text)) > 0
              THEN (length(lower(text)) - length(regexp_replace(lower(text), '[一-鿿]', '', 'g'))) * 100.0 / length(lower(text))
              ELSE 0.0 END AS zh_pct
  FROM documents
),
d AS (
  SELECT doc_id, lang,
         CASE WHEN zh_pct > 5 THEN 'zh'
              WHEN en_h >= de_h AND en_h >= es_h AND en_h >= fr_h AND en_h > 0 THEN 'en'
              WHEN de_h >= es_h AND de_h >= fr_h AND de_h > 0 THEN 'de'
              WHEN es_h >= fr_h AND es_h > 0 THEN 'es'
              WHEN fr_h > 0 THEN 'fr'
              ELSE 'unknown' END AS detected_lang
  FROM s
)
SELECT lang, detected_lang, count(*) AS n_docs
FROM d GROUP BY lang, detected_lang
"""


@register("text_langid_confusion", _LANGID_ORACLE)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID vs fixture ground truth — confusion
    matrix counts. The heuristic is identical SQL on both engines."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("detected_lang", textstats.detect_language("text"))
        .groupBy("lang", "detected_lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register(
    "text_fingerprint_uniques",
    r"""
WITH fp AS (
  SELECT lang,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
  FROM documents
)
SELECT lang, count(*) AS n_docs, count(DISTINCT fingerprint) AS n_unique
FROM fp GROUP BY lang
""",
)
def text_fingerprint_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: normalized-content hash uniqueness per
    language slice."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("fingerprint", textstats.fingerprint("text"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_unique"),
        )
    )


@register(
    "text_quality_by_lang",
    r"""
WITH f AS (
  SELECT lang, length(text) AS n,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks,
         length(regexp_replace(text, '\s', '', 'g')) AS nonspace,
         length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
  FROM documents
),
q AS (
  SELECT lang,
         round(0.25 * (CASE WHEN n >= 200 AND n <= 20000 THEN 1.0 ELSE 0.5 END)
             + 0.25 * (CASE WHEN toks > 0 AND nonspace * 1.0 / toks >= 3 AND nonspace * 1.0 / toks <= 12 THEN 1.0 ELSE 0.5 END)
             + 0.25 * (CASE WHEN nonspace > 0 AND n_punct * 1.0 / nonspace <= 0.2 THEN 1.0
                            WHEN nonspace = 0 THEN 1.0 ELSE 0.4 END)
             + 0.25 * (CASE WHEN nonspace > 0 AND n_digit * 1.0 / nonspace <= 0.2 THEN 1.0
                            WHEN nonspace = 0 THEN 1.0 ELSE 0.4 END), 6) AS quality
  FROM f
)
SELECT lang, count(*) AS n_docs,
       round(avg(quality::DECIMAL(10,6))::DOUBLE, 6) AS avg_quality,
       round(min(quality), 6)::DOUBLE AS min_quality
FROM q GROUP BY lang
""",
)
def text_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score aggregated per language (decimal avg —
    order-independent across engines)."""
    docs = load(spark, sf_dir, "documents")
    q = docs.select("lang", textstats.quality_score("text").alias("quality"))
    return q.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.col("quality").cast("decimal(10,6)")).cast("double"), 6).alias(
            "avg_quality"
        ),
        F.round(F.min("quality"), 6).alias("min_quality"),
    )


@register(
    "text_repetition_profile",
    """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
  FROM documents
),
bi AS (
  SELECT doc_id, lang, arr[i] || ' ' || arr[i+1] AS bigram
  FROM toks, unnest(range(1, greatest(len(arr), 1))) t(i)
  WHERE len(arr) >= 2
),
cnt AS (SELECT doc_id, lang, bigram, count(*) AS c FROM bi GROUP BY doc_id, lang, bigram),
per_doc AS (
  SELECT doc_id, lang, sum(c) AS total, max(c) AS mx FROM cnt GROUP BY doc_id, lang
)
SELECT lang, count(*) AS n_docs,
       round(avg(mx * 1.0 / total), 6) AS avg_top_bigram_share,
       round(max(mx * 1.0 / total), 6) AS max_top_bigram_share,
       sum(CASE WHEN mx * 1.0 / total > 0.1 THEN 1 ELSE 0 END)::BIGINT AS n_repetitive
FROM per_doc GROUP BY lang
""",
)
def text_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signal per language slice:
    top-bigram share distribution + count of docs above the 0.1
    repetitiveness threshold (operators.textstats.repetition_stats)."""
    docs = load(spark, sf_dir, "documents")
    per_doc = textstats.repetition_stats(docs, extra_cols=("lang",))
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("top_bigram_share"), 6).alias("avg_top_bigram_share"),
        F.round(F.max("top_bigram_share"), 6).alias("max_top_bigram_share"),
        F.sum((F.col("top_bigram_share") > 0.1).cast("int"))
        .cast("bigint")
        .alias("n_repetitive"),
    )


@register(
    "corpus_mixture_sample",
    """
WITH kept AS (
  SELECT doc_id, lang FROM documents
  WHERE (lang = 'en' AND doc_id % 1 < 1)
     OR (lang = 'de' AND doc_id % 2 < 1)
     OR (lang = 'es' AND doc_id % 5 < 1)
     OR (lang NOT IN ('en', 'de', 'es') AND doc_id % 10 < 1)
),
tot AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang)
SELECT tot.lang, tot.n_total, coalesce(k.n_kept, 0) AS n_kept,
       round(coalesce(k.n_kept, 0) * 1.0 / tot.n_total, 6) AS kept_share
FROM tot LEFT JOIN (SELECT lang, count(*) AS n_kept FROM kept GROUP BY lang) k
       ON k.lang = tot.lang
""",
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing stage: deterministic stratified downsampling
    (keep all en, 1/2 de, 1/5 es, 1/10 everything else) via
    operators.sampling.stratified_mod_sample — a pure filter, no
    shuffle, re-run-stable row for row."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        stratified_mod_sample,
    )

    docs = load(spark, sf_dir, "documents")
    kept = stratified_mod_sample(
        docs,
        "lang",
        "doc_id",
        {"en": (1, 1), "de": (1, 2), "es": (1, 5)},
        default=(1, 10),
    )
    tot = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    k = kept.groupBy("lang").agg(F.count("*").alias("n_kept"))
    return tot.join(k, "lang", "left").select(
        "lang",
        "n_total",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.round(
            F.coalesce("n_kept", F.lit(0)).cast("double") / F.col("n_total"), 6
        ).alias("kept_share"),
    )


@register(
    "corpus_weighted_sample",
    """
WITH pri AS (
  SELECT lang, doc_id, n_chars,
         pow(((doc_id * 2654435761) % 4294967296 + 0.5) / 4294967296.0,
             1.0 / n_chars) AS priority
  FROM documents WHERE n_chars > 0
), ranked AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY priority DESC, doc_id ASC) AS rank
  FROM pri
)
SELECT lang, rank::INT AS rank, doc_id, n_chars
FROM ranked WHERE rank <= 5
""",
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES priorities, operators/sampling.py):
    top-5 docs per language, inclusion probability proportional to
    n_chars. The uniform is a pure integer function of doc_id, so the
    DuckDB oracle reproduces the exact sample — the re-run/backfill
    stability a 100 TB curation pipeline needs (seeded RNG sampling
    changes rows whenever partitioning changes; this never does).
    Priorities are ranked but not emitted (pow ULP is engine-specific;
    rank order is not)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        weighted_priority_sample,
    )

    docs = load(spark, sf_dir, "documents")
    top = weighted_priority_sample(
        docs, "doc_id", "n_chars", k=5, strata_col="lang"
    )
    return top.select("lang", "rank", "doc_id", "n_chars")


# shared head (langid features + quality/fingerprint scoring) and
# tail (dedup survivors + mixture + stage counts) of the curation
# funnel oracles — the two pipeline variants differ only in the
# repetition gate plugged in between
_CUR_HEAD = rf"""f AS (
  SELECT doc_id, text, length(text) AS n,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks,
         length(regexp_replace(text, '\s', '', 'g')) AS nonspace,
         length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
         {_duck_hits('en')} AS en_h,
         {_duck_hits('de')} AS de_h,
         {_duck_hits('es')} AS es_h,
         {_duck_hits('fr')} AS fr_h,
         CASE WHEN length(lower(text)) > 0
              THEN (length(lower(text)) - length(regexp_replace(lower(text), '[一-鿿]', '', 'g'))) * 100.0 / length(lower(text))
              ELSE 0.0 END AS zh_pct
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN zh_pct > 5 THEN 'zh'
              WHEN en_h >= de_h AND en_h >= es_h AND en_h >= fr_h AND en_h > 0 THEN 'en'
              WHEN de_h >= es_h AND de_h >= fr_h AND de_h > 0 THEN 'de'
              WHEN es_h >= fr_h AND es_h > 0 THEN 'es'
              WHEN fr_h > 0 THEN 'fr'
              ELSE 'unknown' END AS dl,
         0.25 * (CASE WHEN n >= 200 AND n <= 20000 THEN 1.0 ELSE 0.5 END)
       + 0.25 * (CASE WHEN toks > 0 AND nonspace * 1.0 / toks >= 3 AND nonspace * 1.0 / toks <= 12 THEN 1.0 ELSE 0.5 END)
       + 0.25 * (CASE WHEN nonspace > 0 AND n_punct * 1.0 / nonspace <= 0.2 THEN 1.0
                      WHEN nonspace = 0 THEN 1.0 ELSE 0.4 END)
       + 0.25 * (CASE WHEN nonspace > 0 AND n_digit * 1.0 / nonspace <= 0.2 THEN 1.0
                      WHEN nonspace = 0 THEN 1.0 ELSE 0.4 END) AS quality,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM f
)"""

_CUR_TAIL = """, clean AS (
  SELECT *, doc_id = min(doc_id) OVER (PARTITION BY fp) AS survivor
  FROM flags WHERE q_ok AND rep_ok
), kept AS (
  SELECT doc_id, dl FROM clean
  WHERE survivor AND (
        (dl = 'en' AND doc_id % 1 < 1)
     OR (dl = 'de' AND doc_id % 2 < 1)
     OR (dl = 'es' AND doc_id % 5 < 1)
     OR (dl NOT IN ('en', 'de', 'es') AND doc_id % 10 < 1))
)
SELECT flags.dl AS lang,
       count(*) AS n_input,
       sum(q_ok::int)::BIGINT AS n_quality,
       sum((q_ok AND rep_ok)::int)::BIGINT AS n_clean,
       (SELECT count(*) FROM clean c WHERE c.survivor AND c.dl = flags.dl) AS n_unique,
       (SELECT count(*) FROM kept k WHERE k.dl = flags.dl) AS n_kept
FROM flags GROUP BY flags.dl
"""

_CURATION_ORACLE = rf"""
WITH {_CUR_HEAD}, rtoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
  FROM documents
), bi AS (
  SELECT doc_id, arr[i] || ' ' || arr[i+1] AS bigram
  FROM rtoks, unnest(range(1, greatest(len(arr), 1))) t(i) WHERE len(arr) >= 2
), bcnt AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY doc_id, bigram),
rep AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS share FROM bcnt GROUP BY doc_id),
flags AS (
  SELECT s.doc_id, s.dl, s.fp,
         s.quality >= 0.9 AS q_ok,
         coalesce(r.share, 0.0) <= 0.1 AS rep_ok
  FROM s LEFT JOIN rep r USING (doc_id)
){_CUR_TAIL}"""


@register("corpus_curation_pipeline", _CURATION_ORACLE)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation funnel a training-data pipeline runs as
    ONE job (each stage individually oracle-verified elsewhere):
    language-ID -> quality gate (score >= 0.9) -> Gopher repetition
    gate (top-bigram share <= 0.1) -> exact-dedup survivors ->
    deterministic mixture sampling, reported as per-detected-language
    stage counts. One DAG, no intermediate materialization — Catalyst
    shares the scan and pipelines the filters; the only shuffles are
    the repetition aggregation, the fingerprint window, and the final
    count. Mirrors what C4/Gopher-style corpus builds actually run."""
    from pyspark.sql import Window

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        stratified_mod_sample,
    )

    docs = load(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        textstats.detect_language("text").alias("dl"),
        textstats.quality_score("text").alias("quality"),
        textstats.fingerprint("text").alias("fp"),
    )
    rep = textstats.repetition_stats(docs).select(
        F.col("id").alias("doc_id"), "top_bigram_share"
    )
    flags = feats.join(rep, "doc_id", "left").select(
        "doc_id",
        "dl",
        "fp",
        (F.col("quality") >= 0.9).alias("q_ok"),
        (F.coalesce("top_bigram_share", F.lit(0.0)) <= 0.1).alias("rep_ok"),
    )
    clean = flags.filter("q_ok AND rep_ok").withColumn(
        "survivor",
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp")),
    )
    survivors = clean.filter("survivor")
    kept = stratified_mod_sample(
        survivors,
        "dl",
        "doc_id",
        {"en": (1, 1), "de": (1, 2), "es": (1, 5)},
        default=(1, 10),
    )
    base = flags.groupBy(F.col("dl").alias("lang")).agg(
        F.count("*").alias("n_input"),
        F.sum(F.col("q_ok").cast("int")).cast("bigint").alias("n_quality"),
        F.sum((F.col("q_ok") & F.col("rep_ok")).cast("int"))
        .cast("bigint")
        .alias("n_clean"),
    )
    n_uniq = survivors.groupBy(F.col("dl").alias("lang")).agg(
        F.count("*").alias("n_unique")
    )
    n_kept = kept.groupBy(F.col("dl").alias("lang")).agg(
        F.count("*").alias("n_kept")
    )
    return (
        base.join(n_uniq, "lang", "left")
        .join(n_kept, "lang", "left")
        .select(
            "lang",
            "n_input",
            "n_quality",
            "n_clean",
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


@register(
    "corpus_top_terms",
    r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS term
  FROM documents
),
cnt AS (
  SELECT term, count(*) AS n_occurrences,
         count(DISTINCT doc_id) AS n_docs
  FROM toks GROUP BY term
),
ranked AS (
  SELECT term, n_occurrences, n_docs,
         row_number() OVER (ORDER BY n_occurrences DESC, term ASC) AS rank
  FROM cnt
)
SELECT rank::INT AS rank, term, n_occurrences, n_docs
FROM ranked WHERE rank <= 20
""",
)
def corpus_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact heavy hitters: global top-20 terms by
    occurrence count (plus document frequency) — the vocabulary-audit
    query behind stopword lists, df-caps, and tokenizer sanity checks.

    Scale shape: the explode never materializes a global term list —
    partial aggregation collapses each partition to its distinct
    terms before the one shuffle (∝ vocabulary, not tokens), and the
    global top-20 is TakeOrderedAndProject over per-partition top-20s,
    not a global sort. The sketch alternative for streaming is
    count-min + heap; this exact form is its oracle-checkable
    reference."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
            )
        ).alias("term"),
    )
    cnt = toks.groupBy("term").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    top = cnt.orderBy(F.col("n_occurrences").desc(), F.col("term").asc()).limit(20)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "rank", "term", "n_occurrences", "n_docs"
    )


def _gopher_cte(n: int, mode: str) -> str:
    share = (
        "max(c) * 1.0 / sum(c)"
        if mode == "top"
        else "sum(CASE WHEN c >= 2 THEN c ELSE 0 END) * 1.0 / sum(c)"
    )
    name = f"{'top' if mode == 'top' else 'dup'}_{n}gram_share"
    return f"""
g{n} AS (
  SELECT doc_id, array_to_string(arr[i:i+{n - 1}], ' ') AS g
  FROM gtoks, unnest(range(1, len(arr) - {n - 2})) t(i)
  WHERE len(arr) >= {n}
),
c{n} AS (SELECT doc_id, g, count(*) AS c FROM g{n} GROUP BY doc_id, g),
s{n} AS (SELECT doc_id, round({share}, 6) AS {name} FROM c{n} GROUP BY doc_id)"""


_GOPHER_ORACLE = (
    """
WITH gtoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
  FROM documents
),"""
    + ",".join(
        _gopher_cte(n, m)
        for n, m in ((2, "top"), (3, "top"), (4, "top"), (5, "dup"), (8, "dup"), (10, "dup"))
    )
    + """
SELECT d.doc_id,
       coalesce(s2.top_2gram_share, 0.0) AS top_2gram_share,
       coalesce(s3.top_3gram_share, 0.0) AS top_3gram_share,
       coalesce(s4.top_4gram_share, 0.0) AS top_4gram_share,
       coalesce(s5.dup_5gram_share, 0.0) AS dup_5gram_share,
       coalesce(s8.dup_8gram_share, 0.0) AS dup_8gram_share,
       coalesce(s10.dup_10gram_share, 0.0) AS dup_10gram_share
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
LEFT JOIN s4 USING (doc_id) LEFT JOIN s5 USING (doc_id)
LEFT JOIN s8 USING (doc_id) LEFT JOIN s10 USING (doc_id)
"""
)


@register("text_gopher_repetition", _GOPHER_ORACLE)
def text_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL Gopher repetition-rule signal set per document
    (operators.textstats.gopher_repetition_stats; Rae et al. 2021
    Table A1): top-{2,3,4}-gram count share and duplicate-{5,8,10}-gram
    count mass — the published multi-n generalization of
    ``text_repetition_profile``'s single top-bigram rule. Six
    independent explode+aggregate branches over one tokenization,
    all JVM-side; full-value oracle re-derives every share."""
    docs = load(spark, sf_dir, "documents")
    return textstats.gopher_repetition_stats(docs)


_CURATION_GOPHER_ORACLE = (
    "WITH "
    + _CUR_HEAD
    + """, gtoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
  FROM documents
),"""
    + ",".join(
        _gopher_cte(n, m)
        for n, m in ((2, "top"), (3, "top"), (4, "top"), (5, "dup"), (8, "dup"), (10, "dup"))
    )
    + """,
flags AS (
  SELECT s.doc_id, s.dl, s.fp,
         s.quality >= 0.9 AS q_ok,
         coalesce(s2.top_2gram_share, 0.0) <= 0.2
     AND coalesce(s3.top_3gram_share, 0.0) <= 0.18
     AND coalesce(s4.top_4gram_share, 0.0) <= 0.16
     AND coalesce(s5.dup_5gram_share, 0.0) <= 0.15
     AND coalesce(s8.dup_8gram_share, 0.0) <= 0.12
     AND coalesce(s10.dup_10gram_share, 0.0) <= 0.1 AS rep_ok
  FROM s LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
         LEFT JOIN s4 USING (doc_id) LEFT JOIN s5 USING (doc_id)
         LEFT JOIN s8 USING (doc_id) LEFT JOIN s10 USING (doc_id)
)"""
    + _CUR_TAIL
)


@register("corpus_curation_pipeline_gopher", _CURATION_GOPHER_ORACLE)
def corpus_curation_pipeline_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel with the FULL Gopher repetition-rule gate
    composed in (Rae et al. 2021 Table A1 thresholds,
    operators.textstats.GOPHER_THRESHOLDS) in place of the single
    top-bigram rule of ``corpus_curation_pipeline``: language-ID →
    quality gate → six-signal Gopher gate (top-{2,3,4}-gram share and
    dup-{5,8,10}-gram mass each within its published bound) →
    exact-dedup survivors → deterministic mixture sampling, reported
    as per-language stage counts. Same one-DAG shape: the six n-gram
    aggregations share one tokenization, everything else pipelines —
    the form a Gopher-style 100 TB corpus build actually runs."""
    from pyspark.sql import Window

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        stratified_mod_sample,
    )

    docs = load(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        textstats.detect_language("text").alias("dl"),
        textstats.quality_score("text").alias("quality"),
        textstats.fingerprint("text").alias("fp"),
    )
    gate = textstats.gopher_repetition_gate(docs)
    flags = (
        feats.join(gate, "doc_id")
        .select(
            "doc_id",
            "dl",
            "fp",
            (F.col("quality") >= 0.9).alias("q_ok"),
            F.col("gopher_ok").alias("rep_ok"),
        )
        # the six-signal Gopher gate (six n-gram explode+aggregate
        # branches) feeds both the stage counters and the survivor
        # branch — materialize the per-doc flags once instead of
        # re-running the gate per consumer (guide §5; lazy since r16 —
        # the first consuming job materializes it, no extra eager job)
        .localCheckpoint(eager=False)
    )
    clean = flags.filter("q_ok AND rep_ok").withColumn(
        "survivor",
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp")),
    )
    survivors = clean.filter("survivor")
    kept = stratified_mod_sample(
        survivors,
        "dl",
        "doc_id",
        {"en": (1, 1), "de": (1, 2), "es": (1, 5)},
        default=(1, 10),
    )
    base = flags.groupBy(F.col("dl").alias("lang")).agg(
        F.count("*").alias("n_input"),
        F.sum(F.col("q_ok").cast("int")).cast("bigint").alias("n_quality"),
        F.sum((F.col("q_ok") & F.col("rep_ok")).cast("int"))
        .cast("bigint")
        .alias("n_clean"),
    )
    n_uniq = survivors.groupBy(F.col("dl").alias("lang")).agg(
        F.count("*").alias("n_unique")
    )
    n_kept = kept.groupBy(F.col("dl").alias("lang")).agg(
        F.count("*").alias("n_kept")
    )
    return (
        base.join(n_uniq, "lang", "left")
        .join(n_kept, "lang", "left")
        .select(
            "lang",
            "n_input",
            "n_quality",
            "n_clean",
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


_TEMP_MIX_ORACLE = """
WITH c AS (SELECT lang, count(*)::BIGINT AS c FROM documents GROUP BY lang),
sc AS (SELECT lang, c, pow(c, 0.3) AS s FROM c),
q AS (SELECT lang, c, 100 * s / sum(s) OVER () AS raw FROM sc),
t AS (
  SELECT lang, c, floor(raw) AS base, raw - floor(raw) AS frac,
         100 - sum(floor(raw)) OVER () AS leftover,
         row_number() OVER (ORDER BY raw - floor(raw) DESC, lang ASC) AS fr
  FROM q
),
tgt AS (
  SELECT lang, least(base + (fr <= leftover)::int, c)::BIGINT AS target FROM t
),
pick AS (
  SELECT d.lang, d.doc_id,
         row_number() OVER (PARTITION BY d.lang
           ORDER BY ((d.doc_id * 2654435761) % 4294967296 + 0.5) / 4294967296.0 DESC,
                    d.doc_id ASC) AS rank
  FROM documents d
)
SELECT p.lang, p.rank::INT AS rank, p.doc_id
FROM pick p JOIN tgt USING (lang) WHERE p.rank <= tgt.target
"""


@register("corpus_temperature_mixture", _TEMP_MIX_ORACLE)
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling
    (operators.sampling.temperature_mixture_sample) — the
    multilingual-LM data-mixing rule (XLM-R's q_l ∝ p_l^alpha,
    alpha=0.3): per-language targets from largest-remainder
    apportionment of a 100-doc budget over temperature-scaled corpus
    shares (low-resource languages up-weighted), realized by the
    deterministic Knuth-uniform within-language pick. Every window in
    the apportionment runs over the |languages| dimension frame; the
    pick is the WindowGroupLimit top-k shape. Full-value oracle
    re-derives targets and the exact sampled rows."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    docs = load(spark, sf_dir, "documents")
    return temperature_mixture_sample(
        docs, strata_col="lang", key_col="doc_id", alpha=0.3, total=100
    )


_TEMP_MIX_REDIST_ORACLE = """
WITH c AS (SELECT lang, count(*)::BIGINT AS c FROM documents GROUP BY lang),
sc AS (SELECT lang, c, pow(c, 0.3) AS s FROM c),
q AS (SELECT lang, c, s / sum(s) OVER () AS qs,
             4000 * s / sum(s) OVER () AS raw FROM sc),
t AS (
  SELECT lang, c, qs, floor(raw) AS base, raw - floor(raw) AS frac,
         4000 - sum(floor(raw)) OVER () AS leftover,
         row_number() OVER (ORDER BY raw - floor(raw) DESC, lang ASC) AS fr
  FROM q
),
t0 AS (
  SELECT lang, c, qs,
         least(base + (fr <= leftover)::int, c)::BIGINT AS target FROM t
),
t1 AS (
  SELECT lang, target, c - target AS cap, qs,
         4000 - sum(target) OVER () AS deficit,
         coalesce(sum(c - target) OVER (ORDER BY qs DESC, lang ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS taken
  FROM t0
),
tgt AS (
  SELECT lang,
         (target + greatest(0, least(cap, deficit - taken)))::BIGINT AS target
  FROM t1
),
pick AS (
  SELECT d.lang, d.doc_id,
         row_number() OVER (PARTITION BY d.lang
           ORDER BY ((d.doc_id * 2654435761) % 4294967296 + 0.5) / 4294967296.0 DESC,
                    d.doc_id ASC) AS rank
  FROM documents d
)
SELECT p.lang, p.rank::INT AS rank, p.doc_id
FROM pick p JOIN tgt USING (lang) WHERE p.rank <= tgt.target
"""


@register("corpus_temperature_mixture_redist", _TEMP_MIX_REDIST_ORACLE)
def corpus_temperature_mixture_redist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture with DEFICIT REDISTRIBUTION
    (``temperature_mixture_sample(redistribute=True)``): when the
    4000-doc budget exhausts a stratum (the cap binds), the shortfall
    refills from the remaining strata's capacity greedily in
    temperature-share order — the sample totals exactly
    ``min(4000, corpus)`` instead of silently under-delivering. At
    sf ≤ 0.01 the whole corpus returns (budget > corpus, the exhaust
    branch); at sf0.1 the small languages cap and the refill fires —
    the oracle replays apportionment, cap, and the greedy
    cumulative-capacity refill value-for-value."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    docs = load(spark, sf_dir, "documents")
    return temperature_mixture_sample(
        docs,
        strata_col="lang",
        key_col="doc_id",
        alpha=0.3,
        total=4000,
        redistribute=True,
    )


# WARC-ingest HTML extraction (round 11, sources/warc.py): plant a
# deterministic HTML wrapper (title/style/script/entities/comment)
# around each document's text on BOTH engines, strip with the SHARED
# step list (functions.text.HTML_STRIP_STEPS — the oracle SQL is
# generated from it, the PII_PATTERNS discipline), compare md5 +
# length full-value. Proves the codegen'd fold that warc_documents
# runs over every captured page.
_HTML_PLANT_SQL = """
SELECT doc_id,
       '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR)
       || '</title><style>p{color:red}</style></head><body><h1>H'
       || CAST(doc_id % 7 AS VARCHAR) || '</h1><p>' || text
       || '</p><script>var x = "<p>ignore</p>";</script><!-- c --><p>tail &amp; fin</p></body></html>'
       AS html
FROM documents
"""


def _html_extract_oracle() -> str:
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
        html_strip_sql,
    )

    return f"""
WITH planted AS ({_HTML_PLANT_SQL})
SELECT doc_id, md5({html_strip_sql("html")}) AS text_md5,
       CAST(length({html_strip_sql("html")}) AS BIGINT) AS n_chars
FROM planted
"""


@register("text_html_extract", _html_extract_oracle())
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → visible text over the whole corpus: the WARC ingest's
    extraction stage (``warc_documents``) as a standalone oracle-
    checked operator — one codegen'd regexp fold, zero shuffles, scan
    bandwidth at 100 TB."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
        html_to_text,
    )

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        did.cast("string"),
        F.lit('</title><style>p{color:red}</style></head><body><h1>H'),
        (did % 7).cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><script>var x = "<p>ignore</p>";</script><!-- c --><p>tail &amp; fin</p></body></html>'),
    )
    # staged so the strip fold runs once per row (see
    # text_html_main_content's note)
    return (
        docs.select("doc_id", html_to_text(html).alias("_t"))
        .select(
            "doc_id",
            F.md5(F.col("_t").cast("binary")).alias("text_md5"),
            F.length("_t").cast("long").alias("n_chars"),
        )
    )


# URL-canonical dedup (round 11, the web-crawl dedup key): URLs are
# planted from doc_id arithmetic with every mess the canonicalizer
# must collapse — case variants, default ports, fragments, utm/gclid
# params, param order, trailing slashes — and both engines reduce
# them to the documented canonical form (functions/url.py contract)
# before a min-survivor group-by. Full value: survivor id, canonical
# url, copy count.
_URL_PLANT_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END
       || '://WWW.Example' || CAST(doc_id % 40 AS VARCHAR) || '.COM'
       || CASE WHEN doc_id % 4 = 0 THEN
               CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END
          ELSE '' END
       || '/Docs/' || CAST(doc_id % 160 AS VARCHAR)
       || CASE WHEN doc_id % 8 = 0 THEN '/' ELSE '' END
       || CASE doc_id % 3
            WHEN 0 THEN '?utm_source=feed&b=2&a=1&gclid=Z'
            WHEN 1 THEN '?a=1&b=2'
            ELSE '' END
       || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END
       AS url
FROM documents
"""

_URL_CANON_SQL = """
  WITH parts AS (
    SELECT doc_id,
           -- first-'#' cut, mirroring the engine's substring_index
           -- (strips the fragment even when it contains a newline)
           split_part(url, '#', 1) AS u
    FROM planted
  ), split3 AS (
    SELECT doc_id,
           lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
           lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth0,
           regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest
    FROM parts
  ), norm AS (
    SELECT doc_id, scheme,
           CASE WHEN scheme = 'http'  AND auth0 LIKE '%:80'
                THEN substr(auth0, 1, length(auth0) - 3)
                WHEN scheme = 'https' AND auth0 LIKE '%:443'
                THEN substr(auth0, 1, length(auth0) - 4)
                ELSE auth0 END AS auth,
           CASE WHEN coalesce(regexp_extract(rest, '^([^?]*)', 1), '') = ''
                THEN '/'
                ELSE regexp_extract(rest, '^([^?]*)', 1) END AS path0,
           -- DuckDB regexp_extract is NULL on no match (Spark: '')
           coalesce(regexp_extract(rest, '\\?(.*)$', 1), '') AS query
    FROM split3
  ), canon AS (
    SELECT doc_id,
           scheme || '://' || auth
           -- ALL trailing slashes (idempotence contract, r14);
           -- rtrim(str, chars) mirrors the engine's '/+\\z' strip
           || CASE WHEN rtrim(path0, '/') = '' THEN '/'
              ELSE rtrim(path0, '/') END
           || CASE WHEN cq = '' THEN '' ELSE '?' || cq END AS curl
    FROM (
      SELECT *,
             -- DuckDB array_to_string([]) is NULL (Spark array_join: '')
             coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
               p -> p <> '' AND p NOT LIKE 'utm\\_%' ESCAPE '\\'
                    AND NOT list_contains(
                          ['fbclid','gclid','msclkid','ref_src','mc_eid'],
                          string_split(p, '=')[1]))), '&'), '') AS cq
      FROM norm
    )
  )
"""


@register(
    "web_url_dedup",
    f"""
WITH planted AS ({_URL_PLANT_SQL}),
c AS ({_URL_CANON_SQL} SELECT doc_id, curl FROM canon)
SELECT min(doc_id) AS survivor_id, curl AS canonical_url,
       count(*) AS n_copies
FROM c GROUP BY curl
""",
)
def web_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-crawl URL dedup: canonicalize (case, default ports,
    fragments, tracking params, param order, trailing slashes) then
    keep one survivor per canonical URL — the key a crawl dedups on
    BEFORE any content hashing. One hash-groupBy shuffle; the
    canonicalizer is a codegen'd expression tree
    (``functions/url.py``)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        with_canonical_url,
    )

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://WWW.Example"),
        (did % 40).cast("string"),
        F.lit(".COM"),
        F.when(
            did % 4 == 0,
            F.when(did % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        ).otherwise(F.lit("")),
        F.lit("/Docs/"),
        (did % 160).cast("string"),
        F.when(did % 8 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 3 == 0, F.lit("?utm_source=feed&b=2&a=1&gclid=Z"))
        .when(did % 3 == 1, F.lit("?a=1&b=2"))
        .otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return (
        with_canonical_url(docs.select("doc_id", url.alias("url")))
        .select("doc_id", "canonical_url")
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count("*").alias("n_copies"),
        )
        .select("survivor_id", "canonical_url", "n_copies")
    )


@register(
    "corpus_host_cap",
    f"""
WITH planted AS ({_URL_PLANT_SQL}),
h AS (
  SELECT doc_id,
         regexp_replace(lower(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':[0-9]+$', '') AS host
  FROM planted
),
r AS (
  SELECT doc_id, host,
         row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rk,
         count(*) OVER (PARTITION BY host) AS host_docs
  FROM h
)
SELECT host, CAST(host_docs AS BIGINT) AS host_docs,
       CAST(count(*) AS BIGINT) AS kept,
       CAST(min(doc_id) AS BIGINT) AS first_kept,
       CAST(max(doc_id) AS BIGINT) AS last_kept
FROM r WHERE rk <= 8 GROUP BY host, host_docs
""",
)
def corpus_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document cap — the anti-domination stage of a crawl
    curation recipe (no single site should dominate the training
    mix): keep the first ``cap`` docs per host by a deterministic
    order, report per-host kept/total. One window shuffle on the host
    key; at 100 TB hot hosts are exactly the skewed keys AQE's
    skew-join handling splits, and the cap bounds what any of them
    contributes downstream."""
    from pyspark.sql import Window

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        url_host,
    )

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://WWW.Example"),
        (did % 40).cast("string"),
        F.lit(".COM"),
        F.when(
            did % 4 == 0,
            F.when(did % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        ).otherwise(F.lit("")),
        F.lit("/Docs/"),
        (did % 160).cast("string"),
        F.when(did % 8 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 3 == 0, F.lit("?utm_source=feed&b=2&a=1&gclid=Z"))
        .when(did % 3 == 1, F.lit("?a=1&b=2"))
        .otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    hosts = docs.select("doc_id", url_host(url).alias("host"))
    w = Window.partitionBy("host").orderBy("doc_id")
    wc = Window.partitionBy("host")
    return (
        hosts.withColumn("rk", F.row_number().over(w))
        .withColumn("host_docs", F.count("*").over(wc))
        .filter(F.col("rk") <= 8)
        .groupBy("host", F.col("host_docs").cast("long").alias("host_docs"))
        .agg(
            F.count("*").alias("kept"),
            F.min("doc_id").alias("first_kept"),
            F.max("doc_id").alias("last_kept"),
        )
    )


# Boilerplate-aware main-content extraction (round 12): plant a
# nav-heavy page around each document's text — header nav, a
# breadcrumb, a "see also" prose paragraph with one low-density link,
# an all-link sidebar, a short footer — on BOTH engines, then gate
# blocks with the SHARED link-density constants
# (functions.text.html_main_content / html_main_content_sql: same
# pattern lists + MIN_BLOCK_CHARS/MAX_LINK_DENSITY). The title, nav,
# breadcrumb, sidebar, and footer must all die (short or ~all-anchor);
# the heading, body, and see-also paragraphs survive — full value via
# md5 + length of the extracted content.
_MAIN_PLANT_SQL = """
SELECT doc_id,
       '<html><head><title>T' || CAST(doc_id AS VARCHAR)
       || '</title></head><body><nav><a href="/">Home</a> <a href="/s'
       || CAST(doc_id % 7 AS VARCHAR)
       || '">Section</a> <a href="/about">About</a></nav>'
       || '<div class="crumb"><a href="/">Home</a> &gt; <a href="/c">Cat</a> &gt; now</div>'
       || '<h1>Document ' || CAST(doc_id AS VARCHAR)
       || ' heading with enough words to pass the gate</h1><p>' || text
       || '</p><p>See also <a href="/d' || CAST(doc_id % 11 AS VARCHAR)
       || '">related doc ' || CAST(doc_id % 11 AS VARCHAR)
       || '</a> plus surrounding prose keeping the link density of this paragraph low.</p>'
       || '<aside><a href="/x">Link one here</a> <a href="/y">Link two here</a>'
       || ' <a href="/z">Link three here</a></aside>'
       || '<footer>&#39;24 <a href="/tos">Terms</a> <a href="/p">Privacy</a></footer>'
       || '</body></html>' AS html
FROM documents
"""


def _main_content_oracle() -> str:
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
        html_main_content_sql,
    )

    return f"""
WITH planted AS ({_MAIN_PLANT_SQL})
SELECT doc_id, md5({html_main_content_sql("html")}) AS content_md5,
       CAST(length({html_main_content_sql("html")}) AS BIGINT) AS n_chars
FROM planted
"""


@register("text_html_main_content", _main_content_oracle())
def text_html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction over the whole corpus: the
    link-density block gate a crawl curation pipeline runs so Gopher
    quality gates score article text, not navigation chrome (public
    jusText-style recipe). One codegen'd expression tree, zero
    shuffles — scan bandwidth at 100 TB."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
        html_main_content,
    )

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    html = F.concat(
        F.lit('<html><head><title>T'),
        did.cast("string"),
        F.lit('</title></head><body><nav><a href="/">Home</a> <a href="/s'),
        (did % 7).cast("string"),
        F.lit('">Section</a> <a href="/about">About</a></nav>'),
        F.lit('<div class="crumb"><a href="/">Home</a> &gt; <a href="/c">Cat</a> &gt; now</div>'),
        F.lit("<h1>Document "),
        did.cast("string"),
        F.lit(" heading with enough words to pass the gate</h1><p>"),
        F.col("text"),
        F.lit('</p><p>See also <a href="/d'),
        (did % 11).cast("string"),
        F.lit('">related doc '),
        (did % 11).cast("string"),
        F.lit("</a> plus surrounding prose keeping the link density of this paragraph low.</p>"),
        F.lit('<aside><a href="/x">Link one here</a> <a href="/y">Link two here</a>'),
        F.lit(' <a href="/z">Link three here</a></aside>'),
        F.lit('<footer>&#39;24 <a href="/tos">Terms</a> <a href="/p">Privacy</a></footer>'),
        F.lit("</body></html>"),
    )
    # extraction aliased across a select boundary: CollapseProject
    # will not inline a non-cheap expression into multiple references,
    # so the block-split + regex-fold tree runs ONCE per row instead
    # of once per derived column (the functions/url.py staging lesson,
    # SCALE.md round 12)
    return (
        docs.select("doc_id", html_main_content(html).alias("_content"))
        .select(
            "doc_id",
            F.md5(F.col("_content").cast("binary")).alias("content_md5"),
            F.length("_content").cast("long").alias("n_chars"),
        )
    )


# --- corpus-wide common-line dedup (round 14) --------------------------------

N_LINE_DOCS = 150
LINE_MIN_COUNT = 10


@register(
    "dedup_common_lines",
    f"""
WITH docs AS (SELECT doc_id AS d FROM documents WHERE doc_id < {N_LINE_DOCS}),
t AS (
  SELECT d,
         'COOKIE NOTICE ACCEPT ALL' || CASE WHEN d % 2 = 0 THEN '  ' ELSE '' END
         || chr(10) || 'SECTION ' || CAST(d % 3 AS VARCHAR) || ' NAVIGATION'
         || chr(10) || chr(10)
         || 'rare ribbon ' || CAST(d % 40 AS VARCHAR)
         || chr(10) || 'unique line for doc ' || CAST(d AS VARCHAR) AS text
  FROM docs
),
lines AS (
  SELECT d,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos,
         unnest(string_split(text, chr(10))) AS line
  FROM t
),
bl AS (
  SELECT line FROM (
    SELECT DISTINCT d, trim(line) AS line FROM lines WHERE trim(line) <> ''
  ) GROUP BY line HAVING count(*) >= {LINE_MIN_COUNT}
),
kept AS (
  SELECT * FROM lines WHERE trim(line) NOT IN (SELECT line FROM bl)
),
rebuilt AS (
  SELECT d, string_agg(line, chr(10) ORDER BY pos) AS text,
         count(*) AS n_after
  FROM kept GROUP BY d
),
before AS (SELECT d, count(*) AS n_before FROM lines GROUP BY d)
SELECT b.d AS doc_id,
       CAST(b.n_before AS BIGINT) AS n_lines_before,
       CAST(coalesce(r.n_after, 0) AS BIGINT) AS n_lines_after,
       md5(coalesce(r.text, '')) AS text_md5
FROM before b LEFT JOIN rebuilt r ON b.d = r.d
""",
)
def dedup_common_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide common-LINE dedup (round 14) — the RefinedWeb/
    Falcon boilerplate killer: lines repeating verbatim across >=
    {LINE_MIN_COUNT} distinct documents (cookie banners, nav crumbs)
    are blocklisted by one line-hash groupBy and excised from every
    document, order preserved, document KEPT (``operators/dedup.py::
    common_lines`` / ``strip_common_lines``). Fixture plants exact
    frequencies — a 150-doc banner (with a trailing-whitespace variant
    that must trim-normalize into the same blocklist entry), three
    50-doc section crumbs, sub-threshold 3-4-doc ribbons, per-doc
    unique lines, and an empty line that survives untouched — so the
    md5 of every rebuilt document pins the whole
    explode → count → anti-join → order-preserving-rebuild chain."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dedup import (
        common_lines,
        strip_common_lines,
    )

    d = F.col("doc_id")
    text = F.concat(
        F.lit("COOKIE NOTICE ACCEPT ALL"),
        F.when(d % 2 == 0, F.lit("  ")).otherwise(F.lit("")),
        F.lit("\nSECTION "), (d % 3).cast("string"), F.lit(" NAVIGATION"),
        F.lit("\n\nrare ribbon "), (d % 40).cast("string"),
        F.lit("\nunique line for doc "), d.cast("string"),
    )
    docs = (
        load(spark, sf_dir, "documents")
        .filter(d < N_LINE_DOCS)
        .select("doc_id", text.alias("text"))
    )
    bl = common_lines(docs, min_count=LINE_MIN_COUNT)
    out = strip_common_lines(docs, bl)
    return out.select(
        "doc_id",
        "n_lines_before",
        "n_lines_after",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    )


# --- boilerplate-scrub ingest funnel (round 15) -------------------------------
#
# VERDICT r14 ask #1: the batch boilerplate killer (common_lines /
# strip_common_lines) and the streaming scrub both existed, but the
# composition every corpus REFRESH actually runs — blocklist → strip →
# non-empty gate → chunk → embed → index — had no oracle query. This
# mirrors corpus_scrub_ingest_pipeline's staging (the reference ingest
# lifecycle, /root/reference/scripts/ingest_documents.py:108-233) with
# the scrub stage swapped from PII regexes to the corpus-derived line
# blocklist. Fixture: every doc carries a banner (with a trailing-
# whitespace variant that must trim-normalize into one blocklist entry)
# and one of four nav crumbs — both cross the K=10 threshold and are
# excised; docs in the d%10==7 class are ALL boilerplate and must be
# dropped by the non-empty gate, never reaching the chunker or the
# index; surviving docs keep exactly their unique salad line, whose
# space-separated shape makes the 500/50 chunker twin
# (ingest_queries.chunker_merge_oracle_sql) exact.

N_BL_FUNNEL_DOCS = 120
BL_FUNNEL_MIN_COUNT = 10

_BL_FUNNEL_PLANT_SQL = f"""
SELECT doc_id,
       'FUNNEL COOKIE BANNER' || CASE WHEN doc_id % 2 = 0 THEN '  ' ELSE '' END
       || chr(10) || 'NAV ' || CAST(doc_id % 4 AS VARCHAR)
       || CASE WHEN doc_id % 10 <> 7
               THEN chr(10) || 'doc ' || CAST(doc_id AS VARCHAR) || ' says ' || text
               ELSE '' END AS text
FROM documents WHERE doc_id < {N_BL_FUNNEL_DOCS}
"""


def _bl_funnel_oracle() -> str:
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries.ingest_queries import (
        chunker_merge_oracle_sql,
    )

    gated = f"""
    WITH planted AS ({_BL_FUNNEL_PLANT_SQL.strip()}),
    lns AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line
      FROM planted
    ),
    bl AS (
      SELECT line FROM (
        SELECT DISTINCT doc_id, trim(line) AS line FROM lns WHERE trim(line) <> ''
      ) GROUP BY line HAVING count(*) >= {BL_FUNNEL_MIN_COUNT}
    ),
    rebuilt AS (
      -- surviving docs keep ONE line here, so no ORDER BY is needed;
      -- docs with zero kept lines vanish = the non-empty gate
      SELECT doc_id, string_agg(line, chr(10)) AS text
      FROM lns WHERE trim(line) NOT IN (SELECT line FROM bl)
      GROUP BY doc_id
    )
    SELECT doc_id, text FROM rebuilt WHERE trim(text) <> ''
    """
    chunked = chunker_merge_oracle_sql(gated)
    return f"""
WITH chunks AS ({chunked}),
bl2 AS (
  SELECT line FROM (
    SELECT DISTINCT doc_id, trim(line) AS line
    FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
          FROM ({_BL_FUNNEL_PLANT_SQL.strip()}))
    WHERE trim(line) <> ''
  ) GROUP BY line HAVING count(*) >= {BL_FUNNEL_MIN_COUNT}
)
SELECT DISTINCT
       'doc_' || local_index || '_' || substr(md5(text), 1, 8) AS id,
       CAST(local_index AS INT) AS chunk_index,
       md5(text) AS chunk_md5,
       CAST((SELECT count(*) FROM bl2
             WHERE position(bl2.line IN chunks.text) > 0) AS BIGINT)
       AS n_bl_residual
FROM chunks
"""


@register("corpus_boilerplate_funnel", _bl_funnel_oracle())
def corpus_boilerplate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-refresh boilerplate funnel, end to end: planted
    banner/nav corpus → ``common_lines`` blocklist → ``strip_common_
    lines`` → non-empty gate → chunk → embed → ``VectorIndex`` LWW
    upsert → read back. Contract: no blocklisted line survives into
    the index — chunk ids are content-addressed over the SCRUBBED text
    (a leak changes every id) and ``n_bl_residual`` re-scans every
    indexed chunk against the blocklist (must be 0); all-boilerplate
    docs are gated before the chunker, so they never cost an embedding
    call. Collected at the fixture slice (≤ ~110 chunks); the dataflow
    is the same one-line-groupBy blocklist + anti-join strip at any
    scale, and the thresholded blocklist stays broadcast-small by
    construction (boilerplate is the heavy-hitter tail)."""
    import tempfile

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.embed.providers import (
        HashEmbedder,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dedup import (
        common_lines,
        strip_common_lines,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.index_table import (
        VectorIndex,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.ingest import (
        docs_to_records,
    )

    d = F.col("doc_id")
    planted_text = F.concat(
        F.lit("FUNNEL COOKIE BANNER"),
        F.when(d % 2 == 0, F.lit("  ")).otherwise(F.lit("")),
        F.lit("\nNAV "), (d % 4).cast("string"),
        F.when(
            d % 10 != 7,
            F.concat(
                F.lit("\ndoc "), d.cast("string"), F.lit(" says "), F.col("text")
            ),
        ).otherwise(F.lit("")),
    )
    docs = (
        load(spark, sf_dir, "documents")
        .filter(d < N_BL_FUNNEL_DOCS)
        .select("doc_id", planted_text.alias("text"))
    )
    # blocklist-small by construction and consumed TWICE (the strip
    # inside the ingest chain + the residual re-scan at the end) —
    # materialize the line-hash groupBy once (guide §5)
    bl = common_lines(docs, min_count=BL_FUNNEL_MIN_COUNT).localCheckpoint(
        eager=False  # lazy since r16: first consumer materializes it
    )
    gated = (
        strip_common_lines(docs, bl)
        .filter(F.trim(F.col("text")) != "")
        .select(
            "text",
            F.concat(F.lit("mem://bp/"), d.cast("string")).alias("source"),
        )
    )
    with tempfile.TemporaryDirectory() as tmp:
        idx = VectorIndex(spark, tmp, "bp-funnel").create(dimension=64)
        idx.upsert(docs_to_records(gated, HashEmbedder(dimension=64)), batch=0)
        back = idx.read().select("id", "chunk_index", "text")
        rows = back.collect()
    out = spark.createDataFrame(rows, back.schema)
    residual = (
        out.join(
            bl.select(F.col("line").alias("_bl")),
            F.expr("position(_bl IN text)") > 0,
            "left",
        )
        .groupBy("id")
        .agg(F.count("_bl").alias("n_bl_residual"))
    )
    return (
        out.join(residual, "id")
        .select(
            "id",
            F.col("chunk_index").cast("int").alias("chunk_index"),
            F.md5(F.col("text").cast("binary")).alias("chunk_md5"),
            F.col("n_bl_residual").cast("long").alias("n_bl_residual"),
        )
    )
