"""Curation-stage queries: benchmark decontamination, bigram-LM
perplexity scoring, BPE-ish token accounting, and training-sequence
packing — the batch-construction tail of an LLM data pipeline
(SURVEY.md north-star extensions; the reference RAG service has no
counterpart, so these compose with the dedup/textstats/sampling
stages verified elsewhere).

Oracle conventions per FIXTURES.md: identical tokenizers on both
engines, per-contribution 6-dp DECIMAL rounding for float sums, and
a recursive CTE as the independent re-implementation of the greedy
packer (sequential semantics — the one family SQL needs recursion
for).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
    BPE_ISH_PATTERN,
    bpe_token_count,
    token_count,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (
    load,
    register,
)

_BPE_SQL_PAT = BPE_ISH_PATTERN.replace("'", "''")

_EVAL_MOD = 25  # every 25th doc plays the held-out eval set
_DECON_N = 4  # word n-gram size (GPT-3 used 13; 4 fits fixture docs)

_PACK_BUDGET = 512
_PACK_SHARDS = 8


@register(
    "text_bpe_token_counts",
    f"""
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_SQL_PAT}')) AS n_bpe_tokens
FROM documents
""",
)
def text_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish pre-tokenizer token counts per document
    (functions.text.bpe_token_count) — the SQL-only estimator for
    token-level corpus accounting and sequence-budget planning. The
    regex is the lookahead-free GPT-2 pre-tokenizer subset, evaluated
    by Java regex and RE2 identically (verified)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_ws_tokens"),
        bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
    )


_DECON_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' ' || arr[i+3] AS shingle
  FROM toks, unnest(range(1, len(arr) - {_DECON_N - 2})) t(i)
  WHERE len(arr) >= {_DECON_N}
),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_EVAL_MOD} = 0)
SELECT sh.doc_id, count(*) AS n_overlapping_ngrams
FROM sh JOIN ev USING (shingle)
WHERE sh.doc_id % {_EVAL_MOD} <> 0
GROUP BY sh.doc_id
"""


@register("decontaminate_eval_overlap", _DECON_ORACLE)
def decontaminate_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators.dedup.eval_overlap): flag
    every corpus doc sharing a word 4-gram with the held-out "eval"
    slice (doc_id % 25 == 0 stands in for the benchmark file). The
    eval shingle set is broadcast — the corpus never shuffles for the
    probe; flagged docs would be dropped or span-scrubbed
    (dedup.substring_span_pairs) before training."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dedup import (
        eval_overlap,
    )

    docs = load(spark, sf_dir, "documents")
    evalset = docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
    return eval_overlap(corpus, evalset, n=_DECON_N)


_NLL_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
  FROM documents
),
bg AS (
  SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
  FROM toks, unnest(range(1, greatest(len(arr), 1))) t(i)
  WHERE len(arr) >= 2
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
v AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT unnest(arr) AS w FROM toks)
),
nll AS (
  SELECT bg.doc_id,
         round(-ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v)), 6)::DECIMAL(18,6) AS nll
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
),
per_doc AS (
  SELECT doc_id, count(*) AS n_bigrams, sum(nll) AS sum_nll
  FROM nll GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       p.sum_nll::DOUBLE AS sum_nll,
       round(p.sum_nll::DOUBLE / p.n_bigrams, 6) AS avg_nll
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN per_doc p USING (doc_id)
"""


@register("text_bigram_nll", _NLL_ORACLE)
def text_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal (operators.lm): per-doc bigram
    cross-entropy under an add-0.5-smoothed bigram model estimated
    from the corpus itself. High avg_nll = surprising/garbled text,
    low = boilerplate — the bucketing signal CCNet derives from KenLM
    perplexity, here as two hash aggregations + two dimension joins,
    fully SQL, full-value oracle."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.lm import (
        bigram_nll_scores,
    )

    docs = load(spark, sf_dir, "documents")
    return bigram_nll_scores(docs)


@register("text_bigram_nll_indexed", _NLL_ORACLE)
def text_bigram_nll_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same scores served from the PERSISTED model layout
    (operators.lm.save_bigram_model → load_bigram_model →
    model_tables=): estimate once, score per batch — hash-equal to
    ``text_bigram_nll`` against the same oracle SQL, the
    probe-from-layout ≡ rebuild contract the lexical and vector
    indexes carry. The end-to-end number includes building the layout
    (at serving time it is prebuilt)."""
    import tempfile

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.lm import (
        bigram_nll_scores,
        load_bigram_model,
        save_bigram_model,
    )

    docs = load(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/lm"
        save_bigram_model(docs, path)
        tables = load_bigram_model(spark, path)
        out = bigram_nll_scores(docs, model_tables=tables)
        out = out.localCheckpoint(eager=True)  # consume before tmp cleanup
    return out


_PACK_DOCS_CTE = f"""
docs AS (
  SELECT doc_id,
         (doc_id % {_PACK_SHARDS})::INT AS shard,
         (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)::BIGINT AS sz,
         row_number() OVER (PARTITION BY doc_id % {_PACK_SHARDS} ORDER BY doc_id) AS rn
  FROM documents
),
pack AS (
  SELECT shard, rn, doc_id, sz, 0::BIGINT AS seq, 0::BIGINT AS off, sz AS fill
  FROM docs WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.sz,
         CASE WHEN p.fill + d.sz > {_PACK_BUDGET} THEN p.seq + 1 ELSE p.seq END,
         CASE WHEN p.fill + d.sz > {_PACK_BUDGET} THEN 0::BIGINT ELSE p.fill END,
         CASE WHEN p.fill + d.sz > {_PACK_BUDGET} THEN d.sz ELSE p.fill + d.sz END
  FROM pack p JOIN docs d ON d.shard = p.shard AND d.rn = p.rn + 1
)
"""

_PACK_ORACLE = f"""
WITH RECURSIVE {_PACK_DOCS_CTE}
SELECT doc_id, shard, seq, off AS "offset", sz AS n_tokens FROM pack
"""

_PACK_STATS_ORACLE = f"""
WITH RECURSIVE {_PACK_DOCS_CTE}
SELECT shard,
       count(*) AS n_docs,
       count(DISTINCT seq) AS n_seqs,
       sum(sz)::BIGINT AS total_tokens,
       round(sum(sz) / (count(DISTINCT seq) * {float(_PACK_BUDGET)}), 6) AS fill_rate
FROM pack GROUP BY shard
"""


def _packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
        pack_sequences,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    return pack_sequences(
        docs, size_col="n_tokens", budget=_PACK_BUDGET, shards=_PACK_SHARDS
    )


@register("corpus_pack_sequences", _PACK_ORACLE)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing (operators.packing.pack_sequences):
    greedy next-fit of whitespace token counts into 512-token
    sequences across 8 id-mod shards. The oracle re-derives every
    (shard, seq, offset) slot with a recursive CTE — a fully
    independent sequential implementation of the same packer."""
    return _packed(spark, sf_dir).withColumnRenamed("size", "n_tokens")


@register("corpus_packing_stats", _PACK_STATS_ORACLE)
def corpus_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste rollup over the packed layout
    (operators.packing.packing_stats): per-shard sequence counts and
    fill rate — the metric that sizes budget/shards before a 100 TB
    packing run."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
        packing_stats,
    )

    return packing_stats(_packed(spark, sf_dir), budget=_PACK_BUDGET)


_EPOCH_SEED = 42
_EPOCH_N = 1
_EPOCH_SHARDS = 8

_EPOCH_ORACLE = f"""
WITH RECURSIVE {_PACK_DOCS_CTE},
sq AS (SELECT DISTINCT shard, seq FROM pack),
keyed AS (
  SELECT shard, seq,
         md5({_EPOCH_SEED} || ':' || {_EPOCH_N} || ':' || shard || ':' || seq) AS k
  FROM sq
),
sharded AS (
  SELECT shard, seq, k,
         (('0x' || substr(k, 1, 8))::BIGINT % {_EPOCH_SHARDS})::INT AS epoch_shard
  FROM keyed
)
SELECT shard, seq, epoch_shard,
       (row_number() OVER (PARTITION BY epoch_shard
                           ORDER BY k ASC, shard ASC, seq ASC) - 1)::BIGINT AS epoch_pos
FROM sharded
"""


@register("corpus_epoch_shuffle", _EPOCH_ORACLE)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded epoch-level shuffle of packed training sequences
    (operators.packing.epoch_shuffle): every (shard, seq) key gets an
    md5(seed:epoch:shard:seq) sort key; first-8-hex-chars mod
    {n} picks its epoch shard and the per-shard rank is its position.
    Pure function of key — the oracle re-derives the whole permutation
    value-for-value. Feeding the result through
    ``epoch_pack_assignment`` re-keys docs for
    ``write_training_shards``, so each epoch materializes as its own
    physically-ordered layout. No global sort anywhere: the only
    window is per-epoch-shard.""".format(n=_EPOCH_SHARDS)
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
        epoch_shuffle,
    )

    return epoch_shuffle(
        _packed(spark, sf_dir), _EPOCH_SEED, _EPOCH_N, _EPOCH_SHARDS
    )


_NB_MOD = 5  # doc_id % 5 == 0 is the held-out scoring slice

# Shared NB CTE chain (train on doc_id % 5 != 0, score the held-out
# slice, argmax per doc) — ends at ``pred``; used by the standalone
# scores query and as the learned-gate stage of the curation funnel.
_NB_CTE = f"""
tok AS (
  SELECT doc_id, lang,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w
  FROM documents
),
train AS (SELECT * FROM tok WHERE doc_id % {_NB_MOD} <> 0),
test AS (SELECT * FROM tok WHERE doc_id % {_NB_MOD} = 0),
classes AS (SELECT lang AS k, count(DISTINCT doc_id) AS nk FROM train GROUP BY lang),
ndocs AS (SELECT count(DISTINCT doc_id) AS n FROM train),
cwk AS (SELECT w, lang AS k, count(*) AS c FROM train GROUP BY w, lang),
ck AS (SELECT k, sum(c) AS ck FROM cwk GROUP BY k),
v AS (SELECT count(DISTINCT w) AS v FROM train),
dense AS (
  SELECT vw.w, cl.k,
         round(ln((coalesce(cwk.c, 0) + 0.5) / (ck.ck + 0.5 * v.v)), 6)::DECIMAL(18,6) AS logp
  FROM (SELECT DISTINCT w FROM train) vw
  CROSS JOIN classes cl
  LEFT JOIN cwk ON cwk.w = vw.w AND cwk.k = cl.k
  JOIN ck ON ck.k = cl.k CROSS JOIN v
),
fb AS (
  SELECT ck.k, round(ln(0.5 / (ck.ck + 0.5 * v.v)), 6)::DECIMAL(18,6) AS fallback
  FROM ck CROSS JOIN v
),
pri AS (
  SELECT c.k, round(ln(c.nk / n.n), 6)::DECIMAL(18,6) AS prior
  FROM classes c CROSS JOIN ndocs n
),
scored AS (
  SELECT t.doc_id, any_value(t.lang) AS lang, cl.k,
         sum(CASE WHEN d.logp IS NOT NULL THEN d.logp ELSE f.fallback END) AS ll
  FROM test t CROSS JOIN classes cl
  LEFT JOIN dense d ON d.w = t.w AND d.k = cl.k
  JOIN fb f ON f.k = cl.k
  GROUP BY t.doc_id, cl.k
),
final AS (
  SELECT s.doc_id, s.lang, s.k,
         (p.prior + s.ll)::VARCHAR::DOUBLE AS score
  FROM scored s JOIN pri p ON p.k = s.k
),
pred AS (
  SELECT doc_id, lang, k AS pred_lang, round(score, 6) AS score,
         lang = k AS is_correct,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, k ASC) AS rn
  FROM final
)
"""

_NB_ORACLE = f"""
WITH {_NB_CTE}
SELECT doc_id, lang, pred_lang, score, is_correct FROM pred WHERE rn = 1
"""


@register("corpus_nb_quality_scores", _NB_ORACLE)
def corpus_nb_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality/domain classifier (operators.classifier
    .nb_classify): multinomial naive Bayes trained on the labeled
    slice (doc_id % 5 != 0; the fixture's ``lang`` metadata stands in
    for quality/domain labels), scoring the held-out slice — the
    fastText-style learned gate beside the unsupervised bigram-LM
    signal. Pure aggregation: token-class counts -> smoothed log-odds
    -> broadcast model -> one DECIMAL sum per (doc, class) -> argmax.
    Full-value oracle re-derives model and predictions. (On this
    synthetic fixture the labels carry only weak signal, so accuracy
    ~ the majority baseline; the leakage-safe-split accuracy contract
    is pinned in tests/test_classifier.py on a corpus with real
    class-conditional token distributions.)"""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.classifier import (
        nb_classify,
    )

    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % _NB_MOD != 0)
    test = docs.filter(F.col("doc_id") % _NB_MOD == 0)
    return nb_classify(train, test)


_VOCAB_ORACLE = """
WITH tok AS (
  SELECT lang, unnest(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
  FROM documents
),
cnt AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token),
ranked AS (
  SELECT lang, token, c,
         row_number() OVER (PARTITION BY lang ORDER BY c DESC, token ASC) AS rn
  FROM cnt
),
agg AS (
  SELECT lang,
         sum(c)::BIGINT AS n_tokens_total,
         count(*) AS n_vocab,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax
  FROM cnt GROUP BY lang
)
SELECT agg.lang, agg.n_tokens_total, agg.n_vocab, agg.n_hapax,
       r.token AS top_token, r.c AS top_token_count
FROM agg JOIN ranked r ON r.lang = agg.lang AND r.rn = 1
"""


@register("corpus_vocab_stats", _VOCAB_ORACLE)
def corpus_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile per language slice: total token mass,
    vocabulary size, hapax-legomenon count (the Zipf-tail health
    signal — a scraped corpus whose hapax share collapses is
    template spam), and the deterministic top token. Two hash
    aggregations; shuffle ∝ distinct (lang, token), vocabulary-
    bounded like the LM tables."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
                lambda x: x != "",
            )
        ).alias("token"),
    )
    cnt = tok.groupBy("lang", "token").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tokens_total"),
        F.count("*").alias("n_vocab"),
        F.sum((F.col("c") == 1).cast("int")).cast("bigint").alias("n_hapax"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("token").asc())
    top = (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "lang",
            F.col("token").alias("top_token"),
            F.col("c").alias("top_token_count"),
        )
    )
    return agg.join(top, "lang")


_TOKCHUNK_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS arr
  FROM documents
),
st AS (
  SELECT doc_id, arr, (i - 1) / 24 AS chunk_index, i AS s
  FROM toks, unnest(range(1, len(arr) + 1, 24)) t(i)
  WHERE len(arr) > 0
)
SELECT doc_id, chunk_index::INT AS chunk_index,
       len(arr[s:s+31]) AS n_tokens,
       array_to_string(arr[s:s+31], ' ') AS chunk_text
FROM st
"""


@register("text_token_chunks", _TOKCHUNK_ORACLE)
def text_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget chunking (operators.chunker.token_chunks): 32-token
    windows, 8-token overlap (stride 24) over the whitespace token
    stream — every chunk fits the sequence budget by construction.
    Pure SQL on both engines, full-value oracle down to the joined
    chunk text."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.chunker import (
        token_chunks,
    )

    docs = load(spark, sf_dir, "documents")
    return token_chunks(docs, chunk_tokens=32, overlap=8)


_TRAINSEQ_ORACLE = f"""
WITH RECURSIVE {_PACK_DOCS_CTE},
joined AS (
  SELECT p.shard, p.seq, p.doc_id, p.off, p.sz, d.text
  FROM pack p JOIN documents d USING (doc_id)
)
SELECT shard, seq,
       count(*) AS n_docs,
       sum(sz)::BIGINT AS n_tokens,
       string_agg(trim(text), ' ' ORDER BY off, doc_id) AS sequence_text
FROM joined GROUP BY shard, seq
"""


@register("corpus_training_sequences", _TRAINSEQ_ORACLE)
def corpus_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled training artifact itself: packed documents joined
    back to their text and concatenated IN OFFSET ORDER into one row
    per (shard, seq) — what a sequential loader feeds the trainer.
    One groupBy over the packed assignment; ordering inside a
    sequence is reconstructed with a sorted collect per group (bounded
    by the token budget, never corpus-sized). The recursive-CTE
    oracle re-derives every sequence's exact byte content."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
        pack_sequences,
    )

    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.trim("text").alias("text"), token_count("text").alias("n_tokens")
    )
    packed = pack_sequences(
        sized, size_col="n_tokens", budget=_PACK_BUDGET, shards=_PACK_SHARDS
    )
    joined = packed.join(sized.select("doc_id", "text"), "doc_id")
    ordered = F.array_sort(
        F.collect_list(F.struct("offset", "doc_id", "text"))
    )
    return (
        joined.groupBy("shard", "seq")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("size").cast("bigint").alias("n_tokens"),
            F.concat_ws(
                " ", F.transform(ordered, lambda s: s["text"])
            ).alias("sequence_text"),
        )
    )


_PERPLEXITY_BUCKET_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
  FROM documents
),
bg AS (
  SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2
  FROM toks, unnest(range(1, greatest(len(arr), 1))) t(i)
  WHERE len(arr) >= 2
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1),
v AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT unnest(arr) AS w FROM toks)
),
nll AS (
  SELECT bg.doc_id,
         round(-ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v)), 6)::DECIMAL(18,6) AS nll
  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
),
per_doc AS (
  SELECT doc_id, round(sum(nll)::DOUBLE / count(*), 6) AS avg_nll
  FROM nll GROUP BY doc_id
),
buck AS (
  SELECT d.lang, p.doc_id, p.avg_nll,
         ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY p.avg_nll ASC, p.doc_id ASC) AS b
  FROM per_doc p JOIN documents d USING (doc_id)
)
SELECT lang,
       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       sum(avg_nll::DECIMAL(18,6))::VARCHAR::DOUBLE AS sum_avg_nll,
       round(min(avg_nll), 6) AS min_avg_nll,
       round(max(avg_nll), 6) AS max_avg_nll
FROM buck GROUP BY lang, bucket
"""


@register("corpus_perplexity_buckets", _PERPLEXITY_BUCKET_ORACLE)
def corpus_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split: per-language perplexity
    tertiles over the bigram-LM score (``text_bigram_nll``) — head =
    most fluent third (usually kept), tail = most surprising third
    (dropped or down-weighted). The bucketing is an ``ntile`` window
    per language over (score, doc_id) — deterministic under ties, so
    both engines cut identical tertiles.

    Scale shape: the model tables are vocabulary-sized (shuffle
    plateaus with vocab, not corpus); the tertile window shuffles one
    SCORE row per doc, not documents; at 100 TB the cut points would
    come from a KLL sketch instead of a full sort — the exact window
    here doubles as the oracle-checkable reference for that."""
    from pyspark.sql import Window

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.lm import (
        bigram_nll_scores,
    )

    docs = load(spark, sf_dir, "documents")
    scores = bigram_nll_scores(docs).filter(F.col("n_bigrams") > 0)
    withlang = scores.join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.col("avg_nll").asc(), F.col("doc_id").asc()
    )
    buck = withlang.withColumn("b", F.ntile(3).over(w)).withColumn(
        "bucket",
        F.when(F.col("b") == 1, "head")
        .when(F.col("b") == 2, "middle")
        .otherwise("tail"),
    )
    return buck.groupBy("lang", "bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("avg_nll").cast("decimal(18,6)"))
        .cast("string")
        .cast("double")
        .alias("sum_avg_nll"),
        F.round(F.min("avg_nll"), 6).alias("min_avg_nll"),
        F.round(F.max("avg_nll"), 6).alias("max_avg_nll"),
    )


_NB_PIPE_ORACLE = rf"""
WITH {_NB_CTE},
f AS (
  SELECT doc_id, lang AS mlang, text, length(text) AS n,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks,
         length(regexp_replace(text, '\s', '', 'g')) AS nonspace,
         length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
  FROM documents WHERE doc_id % {_NB_MOD} = 0
), s AS (
  SELECT doc_id, mlang,
         0.25 * (CASE WHEN n >= 200 AND n <= 20000 THEN 1.0 ELSE 0.5 END)
       + 0.25 * (CASE WHEN toks > 0 AND nonspace * 1.0 / toks >= 3 AND nonspace * 1.0 / toks <= 12 THEN 1.0 ELSE 0.5 END)
       + 0.25 * (CASE WHEN nonspace > 0 AND n_punct * 1.0 / nonspace <= 0.2 THEN 1.0
                      WHEN nonspace = 0 THEN 1.0 ELSE 0.4 END)
       + 0.25 * (CASE WHEN nonspace > 0 AND n_digit * 1.0 / nonspace <= 0.2 THEN 1.0
                      WHEN nonspace = 0 THEN 1.0 ELSE 0.4 END) AS quality,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM f
), rtoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
  FROM documents WHERE doc_id % {_NB_MOD} = 0
), bi AS (
  SELECT doc_id, arr[i] || ' ' || arr[i+1] AS bigram
  FROM rtoks, unnest(range(1, greatest(len(arr), 1))) t(i) WHERE len(arr) >= 2
), bcnt AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY doc_id, bigram),
rep AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS share FROM bcnt GROUP BY doc_id),
nbp AS (SELECT doc_id, pred_lang, is_correct FROM pred WHERE rn = 1),
flags AS (
  SELECT s.doc_id, s.mlang, s.fp,
         s.quality >= 0.9 AS q_ok,
         coalesce(r.share, 0.0) <= 0.1 AS rep_ok,
         p.pred_lang IS NOT NULL AS nb_scored,
         coalesce(p.is_correct, FALSE) AS nb_ok
  FROM s LEFT JOIN rep r USING (doc_id) LEFT JOIN nbp p USING (doc_id)
), pass AS (
  SELECT *, doc_id = min(doc_id) OVER (PARTITION BY fp) AS survivor
  FROM flags WHERE q_ok AND rep_ok AND nb_ok
)
SELECT flags.mlang AS lang,
       count(*) AS n_input,
       sum(q_ok::int)::BIGINT AS n_quality,
       sum((q_ok AND rep_ok)::int)::BIGINT AS n_clean,
       sum(nb_scored::int)::BIGINT AS n_nb_scored,
       sum((q_ok AND rep_ok AND nb_ok)::int)::BIGINT AS n_nb_kept,
       (SELECT count(*) FROM pass p WHERE p.survivor AND p.mlang = flags.mlang)::BIGINT AS n_unique
FROM flags GROUP BY flags.mlang
"""


@register("corpus_curation_pipeline_nb", _NB_PIPE_ORACLE)
def corpus_curation_pipeline_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel with the LEARNED classifier gate composed
    in — how CCNet chains its LM filter after the cheap heuristics:
    heuristic quality gate (score >= 0.9) -> Gopher repetition gate
    (top-bigram share <= 0.1) -> naive-Bayes agreement gate (the model
    trains on the labeled slice doc_id % {m} != 0 and scores ONLY the
    held-out slice doc_id % {m} == 0 — leakage-safe by construction;
    a doc is kept when the learned prediction agrees with its metadata
    label, the learned-language-consistency check) -> exact-dedup
    survivors. Reported as per-label stage counts over the held-out
    slice; the oracle replays every stage including NB training.
    Token-less docs are never NB-scored and thus never pass the
    learned gate (nb_scored counts them).""".format(m=_NB_MOD)
    from pyspark.sql import Window

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import (
        textstats,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.classifier import (
        nb_classify,
    )

    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % _NB_MOD != 0)
    test = docs.filter(F.col("doc_id") % _NB_MOD == 0)
    feats = test.select(
        "doc_id",
        F.col("lang").alias("mlang"),
        textstats.quality_score("text").alias("quality"),
        textstats.fingerprint("text").alias("fp"),
    )
    rep = textstats.repetition_stats(test).select(
        F.col("id").alias("doc_id"), "top_bigram_share"
    )
    nb = nb_classify(train, test).select(
        "doc_id",
        F.col("pred_lang").isNotNull().alias("nb_scored"),
        F.col("is_correct").alias("nb_ok"),
    )
    flags = (
        feats.join(rep, "doc_id", "left")
        .join(nb, "doc_id", "left")
        .select(
            "doc_id",
            "mlang",
            "fp",
            (F.col("quality") >= 0.9).alias("q_ok"),
            (F.coalesce("top_bigram_share", F.lit(0.0)) <= 0.1).alias("rep_ok"),
            F.coalesce("nb_scored", F.lit(False)).alias("nb_scored"),
            F.coalesce("nb_ok", F.lit(False)).alias("nb_ok"),
        )
        # held-out-slice-sized flag frame consumed by BOTH the stage
        # counters and the dedup-survivor branch — materialize once so
        # NB training/scoring and the repetition aggregate never
        # re-run per consumer (guide §5; lazy since r16 — the first
        # consuming job materializes it, no extra eager job)
        .localCheckpoint(eager=False)
    )
    passing = flags.filter("q_ok AND rep_ok AND nb_ok").withColumn(
        "survivor",
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp")),
    )
    base = flags.groupBy(F.col("mlang").alias("lang")).agg(
        F.count("*").alias("n_input"),
        F.sum(F.col("q_ok").cast("int")).cast("bigint").alias("n_quality"),
        F.sum((F.col("q_ok") & F.col("rep_ok")).cast("int"))
        .cast("bigint")
        .alias("n_clean"),
        F.sum(F.col("nb_scored").cast("int")).cast("bigint").alias("n_nb_scored"),
        F.sum(
            (F.col("q_ok") & F.col("rep_ok") & F.col("nb_ok")).cast("int")
        )
        .cast("bigint")
        .alias("n_nb_kept"),
    )
    n_uniq = (
        passing.filter("survivor")
        .groupBy(F.col("mlang").alias("lang"))
        .agg(F.count("*").cast("bigint").alias("n_unique"))
    )
    return base.join(n_uniq, "lang", "left").select(
        "lang",
        "n_input",
        "n_quality",
        "n_clean",
        "n_nb_scored",
        "n_nb_kept",
        F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
    )


_EPOCH_SHARDS_ORACLE = f"""
WITH RECURSIVE {_PACK_DOCS_CTE},
sq AS (SELECT DISTINCT shard, seq FROM pack),
keyed AS (
  SELECT shard, seq,
         md5({_EPOCH_SEED} || ':' || {_EPOCH_N} || ':' || shard || ':' || seq) AS k
  FROM sq
),
sharded AS (
  SELECT shard, seq, k,
         (('0x' || substr(k, 1, 8))::BIGINT % {_EPOCH_SHARDS})::INT AS epoch_shard
  FROM keyed
),
perm AS (
  SELECT shard, seq, epoch_shard,
         (row_number() OVER (PARTITION BY epoch_shard
                             ORDER BY k ASC, shard ASC, seq ASC) - 1)::BIGINT AS epoch_pos
  FROM sharded
),
rekeyed AS (
  SELECT pm.epoch_shard AS shard, pm.epoch_pos AS seq,
         p.doc_id, p.off, p.sz, d.text
  FROM pack p
  JOIN perm pm ON pm.shard = p.shard AND pm.seq = p.seq
  JOIN documents d USING (doc_id)
)
SELECT shard, seq,
       count(*) AS n_docs,
       sum(sz)::BIGINT AS n_tokens,
       string_agg(trim(text), ' ' ORDER BY off, doc_id) AS sequence_text
FROM rekeyed GROUP BY shard, seq
"""


@register("corpus_epoch_shards", _EPOCH_SHARDS_ORACLE)
def corpus_epoch_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-shuffle materialized END TO END (r6 verdict #7):
    pack -> ``epoch_pack_assignment`` (seed {s}, epoch {e}) ->
    ``write_training_shards`` -> read EVERY shard back through the
    loader API (``read_training_shard``, manifest-gated) and
    reassemble one row per re-keyed (shard, seq) with its exact
    concatenated text — so the physically-written epoch layout itself
    is byte-verified against the oracle's independent re-derivation
    (pack CTE -> md5 permutation -> re-key -> string_agg), mirroring
    ``corpus_training_sequences`` for the epoch-1 layout.""".format(
        s=_EPOCH_SEED, e=_EPOCH_N
    )
    import json
    import os
    import tempfile

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
        epoch_pack_assignment,
        pack_sequences,
        read_training_shard,
        write_training_shards,
    )

    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", F.trim("text").alias("text"), token_count("text").alias("n_tokens")
    )
    packed = pack_sequences(
        sized, size_col="n_tokens", budget=_PACK_BUDGET, shards=_PACK_SHARDS
    )
    ep = epoch_pack_assignment(packed, _EPOCH_SEED, _EPOCH_N, _EPOCH_SHARDS)
    withtext = ep.join(sized.select("doc_id", "text"), "doc_id")
    ordered = F.array_sort(F.collect_list(F.struct("offset", "doc_id", "text")))
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/epoch{_EPOCH_N}"
        write_training_shards(withtext, path, budget=_PACK_BUDGET)
        with open(os.path.join(path, "_manifest.json")) as fh:
            shard_ids = sorted(int(s) for s in json.load(fh)["shards"])
        back = None
        for s in shard_ids:
            part = read_training_shard(spark, path, s)
            back = part if back is None else back.unionByName(part)
        out = (
            back.groupBy("shard", "seq")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("size").cast("bigint").alias("n_tokens"),
                F.concat_ws(
                    " ", F.transform(ordered, lambda x: x["text"])
                ).alias("sequence_text"),
            )
        )
        # materialize before the tempdir disappears (sequence-count rows)
        return spark.createDataFrame(out.collect(), out.schema)


_KLL_BUCKETS_ORACLE = """
SELECT d.lang, b.bucket, TRUE AS size_ok
FROM (SELECT DISTINCT lang FROM documents) d,
     (VALUES ('head'), ('middle'), ('tail')) b(bucket)
"""


@register("corpus_perplexity_buckets_kll", _KLL_BUCKETS_ORACLE)
def corpus_perplexity_buckets_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``corpus_perplexity_buckets`` made real (its
    docstring promised "at 100 TB the cut points would come from a KLL
    sketch instead of a full sort" — this is that query): per-language
    CUT POINTS come from a mergeable Datasketches KLL aggregate
    (q(1/3), q(2/3) off one hash aggregate — no per-language sort, no
    window over document scores), and every doc buckets by comparing
    its score to the broadcast cuts. Shuffle is one score row per doc
    into the sketch aggregate plus a |langs|-row broadcast — the
    window-free shape that survives a 1000-executor corpus.

    Contract oracle (codes are sketch-dependent, same pattern as
    ``events_value_quantiles_kll``): for every (lang, bucket) cell the
    threshold-bucketed count must sit within max(2, 5% of the
    language's scored docs) of the exact ntile tertile size — pinned
    TRUE. At fixture scale KLL (k=800) holds every value exactly, so
    the slack only absorbs tie-group placement (ntile splits ties
    arbitrarily; thresholds keep tied docs together — the honest
    difference between the two cuts)."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.lm import (
        bigram_nll_scores,
    )

    docs = load(spark, sf_dir, "documents")
    # one narrow (doc_id, lang, avg_nll) row per doc, consumed TWICE
    # below (the KLL cuts aggregate and the threshold-bucketing join)
    # — a lazy localCheckpoint shares it instead of re-running the
    # whole LM scoring chain per consumer (round 16, guide §5: the
    # checkpointed RDD computes once under the first consuming job; a
    # persist would be inadmissible here — the CacheManager would
    # serve later bench passes from the first pass's cache)
    scores = (
        bigram_nll_scores(docs)
        .filter(F.col("n_bigrams") > 0)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "avg_nll")
        .localCheckpoint(eager=False)
    )
    cuts = (
        scores.groupBy("lang")
        .agg(
            F.expr("kll_sketch_agg_double(avg_nll, 800)").alias("sk"),
            F.count("*").alias("n_lang"),
        )
        .select(
            "lang",
            "n_lang",
            F.expr("kll_sketch_get_quantile_double(sk, 0.3333333333333333)").alias("q33"),
            F.expr("kll_sketch_get_quantile_double(sk, 0.6666666666666666)").alias("q67"),
        )
    )
    bucketed = scores.join(F.broadcast(cuts), "lang").withColumn(
        "bucket",
        F.when(F.col("avg_nll") <= F.col("q33"), "head")
        .when(F.col("avg_nll") <= F.col("q67"), "middle")
        .otherwise("tail"),
    )
    counts = bucketed.groupBy("lang", "bucket").agg(
        F.count("*").alias("n_docs"), F.any_value("n_lang").alias("n_lang")
    )
    # exact ntile target sizes: n = 3q + r docs per lang -> the first
    # r tertiles get q+1; compare per cell with the tie-absorbing slack
    grid = (
        docs.select("lang")
        .distinct()
        .crossJoin(
            spark.createDataFrame(
                [("head", 1), ("middle", 2), ("tail", 3)], "bucket string, b int"
            )
        )
    )
    cells = grid.join(counts, ["lang", "bucket"], "left").join(
        cuts.select("lang", F.col("n_lang").alias("n_all")), "lang"
    )
    slack = F.greatest(F.lit(2.0), 0.05 * F.col("n_all"))
    return cells.select(
        "lang",
        "bucket",
        (
            F.abs(F.coalesce("n_docs", F.lit(0)) - F.floor(F.col("n_all") / 3)
                  - F.when((F.col("n_all") % 3) >= F.col("b"), 1).otherwise(0))
            <= slack
        ).alias("size_ok"),
    )


@register("corpus_nb_quality_scores_indexed", _NB_ORACLE)
def corpus_nb_quality_scores_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same predictions served from the PERSISTED model layout
    (operators.classifier.save_nb_model → load_nb_model →
    nb_classify(model_tables=)): train once, score per batch — the
    estimate-once/probe-many contract the bigram-LM, lexical and
    vector layouts all carry, against the SAME oracle SQL as
    ``corpus_nb_quality_scores`` (hash-equal by construction: the
    stored tables are the model's sufficient statistics and the
    derivation is shared). The end-to-end number includes building
    the layout; incremental ``update_nb_model`` ≡ rebuild is pinned
    in tests/test_classifier.py."""
    import tempfile

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.classifier import (
        load_nb_model,
        nb_classify,
        save_nb_model,
    )

    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % _NB_MOD != 0)
    test = docs.filter(F.col("doc_id") % _NB_MOD == 0)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/nb"
        save_nb_model(train, path)
        out = nb_classify(None, test, model_tables=load_nb_model(spark, path))
        out = out.localCheckpoint(eager=True)  # consume before tmp cleanup
    return out


_NB_AUC_ORACLE = f"""
WITH {_NB_CTE},
sc AS (SELECT doc_id, lang, k, round(score, 6) AS score FROM final),
ranked AS (
  SELECT k AS class, (lang = k) AS is_pos,
         rank() OVER (PARTITION BY k ORDER BY score ASC)
         + (count(*) OVER (PARTITION BY k, score) - 1) / 2.0 AS mid_rank
  FROM sc
),
agg AS (
  SELECT class,
         sum(CASE WHEN is_pos THEN 1 ELSE 0 END)::BIGINT AS n_pos,
         sum(CASE WHEN is_pos THEN 0 ELSE 1 END)::BIGINT AS n_neg,
         sum(CASE WHEN is_pos THEN mid_rank ELSE 0 END) AS prs
  FROM ranked GROUP BY class
)
SELECT class, n_pos, n_neg,
       round((prs - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg), 6) AS auc
FROM agg WHERE n_pos > 0 AND n_neg > 0
"""


@register("corpus_nb_auc", _NB_AUC_ORACLE)
def corpus_nb_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest ROC AUC of the learned NB gate on the held-out
    slice (operators.classifier.ovr_auc over
    ``nb_classify(return_scores=True)``) — the evaluation that
    justifies deploying the gate at a threshold: AUC is the
    probability a random in-class doc outscores a random out-of-class
    doc under the class's score, every threshold at once, where argmax
    accuracy sees only one operating point. Mann-Whitney midrank form
    — windows keyed by class + one aggregate, no pairwise expansion —
    and both engines re-derive the model AND the rank arithmetic, so
    the oracle is full-value down to the sixth decimal of each AUC."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.classifier import (
        nb_classify,
        ovr_auc,
    )

    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % _NB_MOD != 0)
    test = docs.filter(F.col("doc_id") % _NB_MOD == 0)
    scored = nb_classify(train, test, return_scores=True)
    return ovr_auc(scored)


_DSIR_MOD = 11  # doc_id % 11 == 0 stands in for the small target corpus
_DSIR_N = 200

_DSIR_CTE = f"""
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS arr
  FROM documents
),
grams AS (
  SELECT doc_id, substring(md5(g), 1, 2) AS bucket FROM (
    SELECT doc_id, unnest(arr) AS g FROM toks
    UNION ALL
    SELECT doc_id, arr[i] || ' ' || arr[i+1] AS g
    FROM toks, unnest(range(1, greatest(len(arr), 1))) t(i)
    WHERE len(arr) >= 2
  )
),
cr AS (
  SELECT bucket, count(*) AS cr FROM grams
  WHERE doc_id % {_DSIR_MOD} <> 0 GROUP BY bucket
),
ct AS (
  SELECT bucket, count(*) AS ct FROM grams
  WHERE doc_id % {_DSIR_MOD} = 0 GROUP BY bucket
),
tot AS (
  SELECT (SELECT coalesce(sum(cr), 0) FROM cr) AS tr,
         (SELECT coalesce(sum(ct), 0) FROM ct) AS tt
),
lam AS (
  SELECT bucket,
         round(ln((coalesce(ct, 0) + 0.5) / (tt + 0.5 * 256))
             - ln((coalesce(cr, 0) + 0.5) / (tr + 0.5 * 256)),
               6)::DECIMAL(24,6) AS lam
  FROM cr FULL JOIN ct USING (bucket) CROSS JOIN tot
),
per_bucket AS (
  SELECT doc_id, bucket, count(*) AS n_b FROM grams
  WHERE doc_id % {_DSIR_MOD} <> 0 GROUP BY doc_id, bucket
),
per_doc AS (
  SELECT doc_id, sum(n_b) AS n_grams, sum(n_b * lam) AS log_w
  FROM per_bucket JOIN lam USING (bucket) GROUP BY doc_id
),
weights AS (
  SELECT d.doc_id,
         coalesce(p.n_grams, 0)::BIGINT AS n_grams,
         p.log_w::DOUBLE AS log_w
  FROM (SELECT DISTINCT doc_id FROM documents
        WHERE doc_id % {_DSIR_MOD} <> 0) d
  LEFT JOIN per_doc p USING (doc_id)
)
"""

_DSIR_WEIGHTS_ORACLE = f"WITH {_DSIR_CTE} SELECT doc_id, n_grams, log_w FROM weights"


@register("corpus_dsir_weights", _DSIR_WEIGHTS_ORACLE)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. NeurIPS 2023,
    `operators/dsir.py`): every raw doc's log importance weight under
    hashed unigram+bigram bag models of a small target slice
    (doc_id % {mod} == 0 stands in for the 'looks like Wikipedia'
    corpus) vs the raw pool. 256 md5-prefix buckets, add-0.5
    smoothing, per-bucket log-ratios rounded to 6 dp and summed as
    DECIMAL — the FULL-VALUE oracle re-derives both histograms, the
    ratio table, and every doc's weight digit for digit. The model is
    two 256-row aggregates (mergeable partials — corpus-size-free
    driver state); scoring is one broadcast join + one groupBy.""".format(
        mod=_DSIR_MOD
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dsir import (
        dsir_log_weights,
    )

    docs = load(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % _DSIR_MOD == 0)
    raw = docs.filter(F.col("doc_id") % _DSIR_MOD != 0)
    return dsir_log_weights(raw, target)


_DSIR_SAMPLE_ORACLE = f"""
WITH {_DSIR_CTE},
keyed AS (
  SELECT doc_id, n_grams, log_w,
         round(log_w + -ln(-ln(((doc_id * 2654435761) % 4294967296 + 0.5)
                               / 4294967296)), 6) AS gumbel_key
  FROM weights WHERE log_w IS NOT NULL
),
ranked AS (
  SELECT doc_id, n_grams, log_w, gumbel_key,
         row_number() OVER (ORDER BY gumbel_key DESC, doc_id ASC) AS rank
  FROM keyed
)
SELECT doc_id, n_grams, log_w, gumbel_key, rank::INT AS rank
FROM ranked WHERE rank <= {_DSIR_N}
"""


@register("corpus_dsir_sample", _DSIR_SAMPLE_ORACLE)
def corpus_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR Gumbel-top-k resampling (the paper's selection rule):
    key = log_w + Gumbel(u) with u the deterministic Knuth uniform of
    the doc id — a pure function of the key, so the selected set is
    identical across runs, partial re-runs, and engines (the oracle
    replays weight AND noise). The ranking is a distributed
    orderBy().limit() (TakeOrderedAndProject — no global sort); the
    result is the {n}-doc importance-resampled training slice.""".format(
        n=_DSIR_N
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dsir import (
        dsir_sample,
    )

    docs = load(spark, sf_dir, "documents")
    target = docs.filter(F.col("doc_id") % _DSIR_MOD == 0)
    raw = docs.filter(F.col("doc_id") % _DSIR_MOD != 0)
    return dsir_sample(raw, target, n=_DSIR_N)


_NB_PREC = 0.8

_NB_THRESHOLD_ORACLE = f"""
WITH {{cte}},
sc AS (SELECT doc_id, lang, k, round(score, 6) AS score FROM final),
ranked AS (
  SELECT k AS class, score AS threshold,
         sum(CASE WHEN lang = k THEN 1 ELSE 0 END)
           OVER (PARTITION BY k ORDER BY score DESC
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         count(*)
           OVER (PARTITION BY k ORDER BY score DESC
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_kept,
         sum(CASE WHEN lang = k THEN 1 ELSE 0 END)
           OVER (PARTITION BY k) AS n_pos
  FROM sc
),
q AS (
  SELECT * FROM ranked
  WHERE n_pos > 0 AND tp * 1.0 / n_kept >= {_NB_PREC}
),
best AS (
  SELECT class, min(threshold) AS threshold,
         min_by(tp, threshold) AS tp,
         min_by(n_kept, threshold) AS n_kept,
         min_by(n_pos, threshold) AS n_pos
  FROM q GROUP BY class
)
SELECT class, threshold,
       round(tp * 1.0 / n_kept, 6) AS precision,
       round(tp * 1.0 / n_pos, 6) AS recall,
       n_kept::BIGINT AS n_kept
FROM best
""".format(cte=_NB_CTE)


@register("corpus_nb_threshold", _NB_THRESHOLD_ORACLE)
def corpus_nb_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point calibration for the learned NB gate
    (`classifier.threshold_at_precision`): per class, the LOWEST score
    threshold whose held-out precision is >= {p} — maximal recall
    subject to the precision floor, the rule a deployed curation gate
    actually runs under (AUC says the ranking is good; THIS says where
    to cut it). RANGE-frame cumulatives make every score tie see its
    whole group, so a threshold admits exactly the rows a >= filter
    would. Classes that cannot reach the floor are dropped — an honest
    'not deployable at this precision'. Full-value oracle re-derives
    the model, the cumulative curves, and the picked points.""".format(
        p=_NB_PREC
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.classifier import (
        nb_classify,
        threshold_at_precision,
    )

    docs = load(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % _NB_MOD != 0)
    test = docs.filter(F.col("doc_id") % _NB_MOD == 0)
    scored = nb_classify(train, test, return_scores=True)
    return threshold_at_precision(scored, _NB_PREC)


_DSIR_PIPE_N = 150


from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries.text_queries import (  # noqa: E402
    _CUR_HEAD,
)

_DSIR_PIPE_ORACLE = rf"""
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
), clean AS (
  SELECT *, doc_id = min(doc_id) OVER (PARTITION BY fp) AS survivor
  FROM flags WHERE q_ok AND rep_ok
), surv AS (SELECT doc_id, dl FROM clean WHERE survivor),
grams AS (
  SELECT t.doc_id, substring(md5(g), 1, 2) AS bucket FROM (
    SELECT doc_id, unnest(arr) AS g FROM rtoks
    UNION ALL
    SELECT doc_id, arr[i] || ' ' || arr[i+1] AS g
    FROM rtoks, unnest(range(1, greatest(len(arr), 1))) t(i)
    WHERE len(arr) >= 2
  ) t
),
cr AS (
  SELECT bucket, count(*) AS cr FROM grams JOIN surv USING (doc_id)
  GROUP BY bucket
),
ct AS (
  SELECT bucket, count(*) AS ct FROM grams
  WHERE doc_id % {_DSIR_MOD} = 0 GROUP BY bucket
),
tot AS (
  SELECT (SELECT coalesce(sum(cr), 0) FROM cr) AS tr,
         (SELECT coalesce(sum(ct), 0) FROM ct) AS tt
),
lam AS (
  SELECT bucket,
         round(ln((coalesce(ct, 0) + 0.5) / (tt + 0.5 * 256))
             - ln((coalesce(cr, 0) + 0.5) / (tr + 0.5 * 256)),
               6)::DECIMAL(24,6) AS lam
  FROM cr FULL JOIN ct USING (bucket) CROSS JOIN tot
),
per_bucket AS (
  SELECT g.doc_id, g.bucket, count(*) AS n_b
  FROM grams g JOIN surv USING (doc_id) GROUP BY g.doc_id, g.bucket
),
per_doc AS (
  SELECT doc_id, sum(n_b * lam) AS log_w
  FROM per_bucket JOIN lam USING (bucket) GROUP BY doc_id
),
keyed AS (
  SELECT doc_id,
         round(log_w::DOUBLE + -ln(-ln(((doc_id * 2654435761) % 4294967296 + 0.5)
                                       / 4294967296)), 6) AS gumbel_key
  FROM per_doc WHERE log_w IS NOT NULL
),
sel AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (ORDER BY gumbel_key DESC, doc_id ASC) AS rn
    FROM keyed
  ) WHERE rn <= {_DSIR_PIPE_N}
)
SELECT flags.dl AS lang,
       count(*) AS n_input,
       sum(q_ok::int)::BIGINT AS n_quality,
       sum((q_ok AND rep_ok)::int)::BIGINT AS n_clean,
       (SELECT count(*) FROM surv c WHERE c.dl = flags.dl) AS n_unique,
       (SELECT count(*) FROM sel JOIN surv USING (doc_id)
        WHERE surv.dl = flags.dl) AS n_kept
FROM flags GROUP BY flags.dl
"""


@register("corpus_curation_pipeline_dsir", _DSIR_PIPE_ORACLE)
def corpus_curation_pipeline_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel with DSIR as the SELECTION stage: language
    ID -> quality gate -> repetition gate -> exact-dedup survivors ->
    DSIR Gumbel-top-{n} toward the target slice (doc_id % {mod} == 0),
    replacing the fixed per-language mod-sampling of the base funnel
    with learned importance resampling — 'keep what looks like the
    target', the data-recipe form actually used for domain-matched
    pretraining mixes. One DAG; the DSIR model is two 256-row
    histograms (target grams over the raw corpus slice, pool grams
    over the survivors); per-language stage counts are full-value
    oracle-pinned end to end including the selected set.""".format(
        n=_DSIR_PIPE_N, mod=_DSIR_MOD
    )
    from pyspark.sql import Window

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import (
        textstats,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.dsir import (
        dsir_sample,
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
    # flags feeds the gate chain AND the per-language base counts;
    # survivors feeds the DSIR pool, n_unique and n_kept — lazy
    # localCheckpoints share each once per pass (round 16: the r15
    # A/B that left these alone assumed AQE exchange reuse covered
    # the DAG, but the executed plan shows the leaf stages re-run;
    # both frames are bounded — doc_id + a few small columns)
    flags = (
        feats.join(rep, "doc_id", "left")
        .select(
            "doc_id",
            "dl",
            "fp",
            (F.col("quality") >= 0.9).alias("q_ok"),
            (F.coalesce("top_bigram_share", F.lit(0.0)) <= 0.1).alias(
                "rep_ok"
            ),
        )
        .localCheckpoint(eager=False)
    )
    clean = flags.filter("q_ok AND rep_ok").withColumn(
        "survivor",
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp")),
    )
    survivors = (
        clean.filter("survivor")
        .select("doc_id", "dl")
        .localCheckpoint(eager=False)
    )
    pool = docs.join(survivors.select("doc_id"), "doc_id")
    target = docs.filter(F.col("doc_id") % _DSIR_MOD == 0)
    sel = dsir_sample(pool, target, n=_DSIR_PIPE_N).select("doc_id")
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
    n_kept = (
        survivors.join(sel, "doc_id")
        .groupBy(F.col("dl").alias("lang"))
        .agg(F.count("*").alias("n_kept"))
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
