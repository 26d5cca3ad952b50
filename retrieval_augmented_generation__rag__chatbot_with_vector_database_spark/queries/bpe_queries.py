"""Full merge-table BPE queries (operators.bpe): trained merge table,
encoded token stream, and BPE-budget sequence packing — closing the
pipeline gap where ``text_bpe_token_counts`` only ESTIMATED token
counts from the pre-tokenizer. The reference budgets chunks in
characters (`scripts/ingest_documents.py:67-90`); these queries carry
that budget contract to real tokenizer units.

Oracle design (FIXTURES.md "bpe"): the DuckDB side INDEPENDENTLY
replays the whole algorithm — training as a recursive CTE whose
single-row working state holds the (word, freq) vocabulary and applies
one best-pair merge per recursion level (LATERAL argmax with the
count-desc/(l,r)-asc tie-break), encoding as a ``list_reduce`` fold of
``replace`` steps over the delimited-symbol word string. Both engines
share only the ALGORITHM definition; no merge table crosses between
them, so a trainer bug on either side breaks the hash. Practical
because training state is word-TYPE-bounded (the fixture corpus has
~61 distinct pretokens; the cap is 4096).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
    BPE_ISH_PATTERN,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (
    load,
    register,
)

_PAT = BPE_ISH_PATTERN.replace("'", "''")

NUM_MERGES = 64
MIN_PAIR_FREQ = 2
VOCAB_CAP = 4096
_BPE_PACK_BUDGET = 256
_BPE_PACK_SHARDS = 8

# -- shared oracle CTEs -------------------------------------------------

# Training: single-row state (it, vocab, merges). Each level: LATERAL
# computes the argmax pair over the unnested vocab (weighted by word
# freq); the outer select applies it to every word via replace() on the
# "|a||b||c|" delimited form and appends "l\x01r\x01freq" to merges.
# Recursion stops when no pair reaches MIN_PAIR_FREQ (LATERAL yields no
# row) or at NUM_MERGES.
_TRAIN_CTE = f"""
pre AS (
  SELECT tok, count(*)::BIGINT AS f
  FROM (SELECT unnest(regexp_extract_all(text, '{_PAT}')) AS tok FROM documents)
  -- reserved-delimiter word types are dropped from the training
  -- vocabulary BEFORE the cap (operators/bpe.py train_bpe policy)
  WHERE strpos(tok, '|') = 0 AND strpos(tok, chr(1)) = 0
  GROUP BY tok
  ORDER BY f DESC, tok ASC
  LIMIT {VOCAB_CAP}
),
init AS (
  SELECT list({{'w': '|' || array_to_string(list_filter(string_split(tok, ''), c -> c <> ''), '||') || '|',
                'f': f}} ORDER BY tok) AS vocab
  FROM pre
),
st(it, vocab, merges) AS (
  SELECT 0, (SELECT vocab FROM init), []::VARCHAR[]
  UNION ALL
  SELECT it + 1,
         (SELECT list({{'w': replace(u.v.w, '|' || b.l || '||' || b.r || '|',
                                     '|' || b.l || b.r || '|'),
                       'f': u.v.f}} ORDER BY u.v.w)
          FROM (SELECT unnest(st.vocab) AS v) u),
         st.merges || [b.l || chr(1) || b.r || chr(1) || b.c::VARCHAR]
  FROM st, LATERAL (
    SELECT p.l, p.r, p.c FROM (
      SELECT sy[i] AS l, sy[i + 1] AS r, sum(f)::BIGINT AS c
      FROM (SELECT list_transform(string_split(v.w, '||'), x -> trim(x, '|')) AS sy,
                   v.f AS f
            FROM (SELECT unnest(st.vocab) AS v)),
           unnest(range(1, greatest(len(sy), 1))) t(i)
      GROUP BY 1, 2
    ) p
    WHERE p.c >= {MIN_PAIR_FREQ}
    ORDER BY p.c DESC, p.l ASC, p.r ASC
    LIMIT 1
  ) b(l, r, c)
  WHERE it < {NUM_MERGES}
),
fm AS (SELECT merges FROM st ORDER BY it DESC LIMIT 1)
"""

# Encoding: ids = sorted base chars 0..B-1, merge #r mints B+r, min id
# wins on string collisions; every distinct pretoken is encoded once by
# the same fold the Spark side runs, then joined back to the stream.
_ENCODE_CTE = f"""
alpha AS (
  SELECT c, (row_number() OVER (ORDER BY c ASC) - 1)::BIGINT AS id
  FROM (SELECT DISTINCT unnest(list_filter(string_split(text, ''), x -> x <> '')) AS c
        FROM documents)
),
mtab AS (
  SELECT split_part(merges[i], chr(1), 1) || split_part(merges[i], chr(1), 2) AS sym,
         (SELECT count(*) FROM alpha) + i - 1 AS id
  FROM fm, unnest(range(1, len(merges) + 1)) t(i)
),
vocab AS (
  SELECT sym, min(id)::BIGINT AS id
  FROM (SELECT c AS sym, id FROM alpha UNION ALL SELECT sym, id FROM mtab)
  GROUP BY sym
),
dtok AS (
  SELECT doc_id, arr[i] AS tok, (i - 1)::INT AS tok_pos
  FROM (SELECT doc_id, regexp_extract_all(text, '{_PAT}') AS arr FROM documents),
       unnest(range(1, len(arr) + 1)) t(i)
),
dim AS (
  SELECT tok,
         -- reserved-delimiter pretokens take the character fallback
         -- (operators/bpe.py encode_fold policy): no merges apply,
         -- round-trip invariant preserved
         CASE WHEN strpos(tok, '|') > 0 OR strpos(tok, chr(1)) > 0
              THEN list_filter(string_split(tok, ''), c -> c <> '')
              ELSE list_transform(string_split(
           list_reduce(
             list_prepend(
               '|' || array_to_string(list_filter(string_split(tok, ''), c -> c <> ''), '||') || '|',
               (SELECT merges FROM fm)),
             (acc, m) -> replace(acc,
               '|' || split_part(m, chr(1), 1) || '||' || split_part(m, chr(1), 2) || '|',
               '|' || split_part(m, chr(1), 1) || split_part(m, chr(1), 2) || '|')),
           '||'), x -> trim(x, '|'))
         END AS syms
  FROM (SELECT DISTINCT tok FROM dtok)
)
"""


def _trained(spark: SparkSession, sf_dir: str):
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.bpe import (
        train_bpe,
    )

    docs = load(spark, sf_dir, "documents")
    return docs, train_bpe(
        docs,
        num_merges=NUM_MERGES,
        min_pair_freq=MIN_PAIR_FREQ,
        vocab_cap=VOCAB_CAP,
    )


_MERGES_ORACLE = f"""
WITH RECURSIVE {_TRAIN_CTE}
SELECT (i - 1)::INT AS rank,
       split_part(merges[i], chr(1), 1) AS left_sym,
       split_part(merges[i], chr(1), 2) AS right_sym,
       split_part(merges[i], chr(1), 1) || split_part(merges[i], chr(1), 2) AS merged,
       split_part(merges[i], chr(1), 3)::BIGINT AS pair_freq
FROM fm, unnest(range(1, len(merges) + 1)) t(i)
"""


@register("corpus_bpe_merges", _MERGES_ORACLE)
def corpus_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained merge table itself (operators.bpe.train_bpe):
    one distributed vocabulary-bounded count, then the driver merge
    loop over the capped (pretoken, freq) table — the production-BPE
    architecture. The oracle re-trains from scratch inside DuckDB
    (recursive CTE, one merge per level), so rank order, tie-breaks
    and at-merge-time pair frequencies are all value-checked."""
    _, merges = _trained(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType()),
            T.StructField("left_sym", T.StringType()),
            T.StructField("right_sym", T.StringType()),
            T.StructField("merged", T.StringType()),
            T.StructField("pair_freq", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(m.rank, m.left, m.right, m.merged, m.pair_freq) for m in merges],
        schema,
    )


_ENCODE_ORACLE = f"""
WITH RECURSIVE {_TRAIN_CTE},
{_ENCODE_CTE},
enc AS (
  SELECT tok, syms[i] AS token, (i - 1)::INT AS sym_pos
  FROM dim, unnest(range(1, len(syms) + 1)) t(i)
)
SELECT d.doc_id, d.tok_pos, e.sym_pos, e.token,
       coalesce(v.id, -1)::BIGINT AS token_id
FROM dtok d
JOIN enc e USING (tok)
LEFT JOIN vocab v ON v.sym = e.token
"""


@register("text_bpe_full_encode", _ENCODE_ORACLE)
def text_bpe_full_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full encoded token stream (operators.bpe.bpe_encode): one
    row per BPE token with (tok_pos, sym_pos) provenance and vocab id.
    Spark applies the merge rules as ONE Catalyst ``aggregate`` fold
    over the distinct-pretoken dimension (broadcast back, document
    side never shuffles); the oracle independently re-trains AND
    re-encodes, value-checking every emitted token and id."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.bpe import (
        bpe_encode,
        corpus_alphabet,
    )

    docs, merges = _trained(spark, sf_dir)
    return bpe_encode(docs, merges, corpus_alphabet(docs))


_PACK_BPE_ORACLE = f"""
WITH RECURSIVE {_TRAIN_CTE},
{_ENCODE_CTE},
cnt AS (
  SELECT d.doc_id, sum(len(m.syms))::BIGINT AS sz
  FROM dtok d JOIN dim m USING (tok)
  GROUP BY d.doc_id
),
docs2 AS (
  SELECT doc_id, (doc_id % {_BPE_PACK_SHARDS})::INT AS shard,
         coalesce(c.sz, 0)::BIGINT AS sz,
         row_number() OVER (PARTITION BY doc_id % {_BPE_PACK_SHARDS}
                            ORDER BY doc_id) AS rn
  FROM (SELECT DISTINCT doc_id FROM documents)
  LEFT JOIN cnt c USING (doc_id)
),
pack AS (
  SELECT shard, rn, doc_id, sz, 0::BIGINT AS seq, 0::BIGINT AS off, sz AS fill
  FROM docs2 WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.sz,
         CASE WHEN p.fill + d.sz > {_BPE_PACK_BUDGET} THEN p.seq + 1 ELSE p.seq END,
         CASE WHEN p.fill + d.sz > {_BPE_PACK_BUDGET} THEN 0::BIGINT ELSE p.fill END,
         CASE WHEN p.fill + d.sz > {_BPE_PACK_BUDGET} THEN d.sz ELSE p.fill + d.sz END
  FROM pack p JOIN docs2 d ON d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT doc_id, shard, seq, off AS "offset", sz AS n_tokens FROM pack
"""


@register("corpus_pack_sequences_bpe", _PACK_BPE_ORACLE)
def corpus_pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing budgeted in REAL BPE tokens
    (``budget_in="bpe"``): per-doc counts from
    operators.bpe.bpe_token_counts feed the same next-fit packer as
    ``corpus_pack_sequences`` — the whitespace-budget twin — with a
    {budget}-token budget. The oracle chains train -> encode -> count
    -> recursive next-fit, re-deriving every (shard, seq, offset)
    slot.""".format(budget=_BPE_PACK_BUDGET)
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.bpe import (
        bpe_token_counts,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.packing import (
        pack_sequences,
    )

    docs, merges = _trained(spark, sf_dir)
    sized = bpe_token_counts(docs, merges)
    packed = pack_sequences(
        sized,
        size_col="n_bpe_tokens",
        budget=_BPE_PACK_BUDGET,
        shards=_BPE_PACK_SHARDS,
    )
    return packed.withColumnRenamed("size", "n_tokens")
