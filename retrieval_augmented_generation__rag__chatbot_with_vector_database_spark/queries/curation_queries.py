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

_NB_ORACLE = f"""
WITH tok AS (
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
