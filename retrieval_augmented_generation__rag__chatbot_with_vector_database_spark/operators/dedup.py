"""Deduplication operators for large-scale corpus curation:
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

The reference deduplicates only retrieval sources
(``/root/reference/app/rag/chain.py:107`` — ``list(set(...))``) and
relies on content-addressed ids for idempotent upsert
(``scripts/ingest_documents.py:93-105``); a 100 TB training-data
pipeline needs document-level dedup as a first-class stage. All
operators here are DataFrame→DataFrame, built to be oracle-checkable:
hashing uses ``md5`` (identical in Spark and DuckDB) and tiebreaks are
deterministic.

Scale design:
- **Exact** dedup is one hash-groupBy — a single shuffle on the
  fingerprint; at 100 TB, AQE handles skew (empty/boilerplate docs
  hashing to one key → skew-join split).
- **MinHash+LSH** is the scale path for near-dup: signatures are one
  groupBy over exploded shingles (shuffle ∝ corpus token count), and
  candidate generation joins on *band keys* only — never all-pairs.
  Band count/width trade recall vs cost (b bands of r rows ≈
  threshold (1/b)^(1/r)).
- **SimHash** gives 64-bit signatures; candidates via exact match on
  any of 4 16-bit bands (Hamming ≤ 3 guaranteed caught for ≤ 3-bit
  flips by pigeonhole across 4 bands).
- **n-gram Jaccard** verifies candidates exactly; the shingle
  self-join is bounded by LSH candidates at scale (here also exposed
  standalone for the oracle).
- **Embedding near-dup** brute force is quadratic — kept for
  correctness; the sub-quadratic route is ``operators.ann`` (IVF:
  only intra-centroid pairs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(t), TOKEN_SPLIT), lambda x: x != "")


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>); empty array for
    docs with < n tokens."""
    arr = tokens(text)
    idx = F.sequence(F.lit(0), F.size(arr) - n)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", *[arr[i + j] for j in range(n)]))
    return F.when(F.size(arr) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def exploded_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingle) — one row per distinct shingle per doc."""
    return df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, n)).alias("shingle")
    )


def exact_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalized: bool = True,
) -> DataFrame:
    """Keep one survivor (min id) per content fingerprint.

    ``normalized=True`` collapses case/whitespace variants (the
    fingerprint from ``operators.textstats``); ``False`` is byte-exact
    (the reference's md5 id scheme)."""
    t = F.col(text_col)
    key = (
        F.md5(F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ").cast("binary"))
        if normalized
        else F.md5(t.cast("binary"))
    )
    return (
        df.withColumn("__fp", key)
        .groupBy("__fp")
        .agg(F.min(F.col(id_col)).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, F.col("__fp").alias("fingerprint"), "n_copies")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing ≥ 1
    shingle. Shuffle is on the shingle key (inverted-index join), not
    all-pairs; at 100 TB gate this behind LSH candidates."""
    sh = exploded_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_inter", "sz_a", "sz_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, h0..h{n-1}) MinHash signature — min over shingles of
    ``md5(seed || ':' || shingle)``. String-min over hex digests is a
    valid uniform minhash and is reproducible in any engine with md5.
    One groupBy → one shuffle, n_hashes mins computed map-side."""
    sh = exploded_shingles(df, id_col, text_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")).cast("binary"))).alias(
            f"h{s}"
        )
        for s in range(n_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_est: float = 0.25,
) -> DataFrame:
    """LSH candidate pairs + estimated Jaccard.

    Signatures are banded (``bands`` bands × ``n_hashes//bands``
    rows); docs sharing any band key become candidates; the estimate
    is the fraction of equal signature components. Only band keys are
    joined — the scalable near-dup path."""
    rows = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_n)
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"h{b * rows + r}") for r in range(rows)]).cast(
                "binary"
            )
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", *[F.col(f"h{i}") for i in range(n_hashes)], *band_cols)
    pairs = None
    for b in range(bands):
        a = banded.select(F.col("id").alias("id_a"), F.col(f"band{b}").alias("bk"))
        c = banded.select(F.col("id").alias("id_b"), F.col(f"band{b}").alias("bk"))
        p = a.join(c, "bk").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        pairs = p if pairs is None else pairs.unionByName(p)
    cand = pairs.distinct()
    sa = banded.select(
        F.col("id").alias("id_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(n_hashes)]
    )
    sb = banded.select(
        F.col("id").alias("id_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(n_hashes)]
    )
    eq = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(n_hashes)
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("est_jaccard", F.round(eq / F.lit(n_hashes), 6))
        .filter(F.col("est_jaccard") >= min_est)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_bits(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 64,
) -> DataFrame:
    """(id, simhash) with ``simhash`` a '0'/'1' string of length
    ``n_bits``: per-token md5 bits, summed ±1 weighted by token count,
    sign per bit. Fully SQL (explode tokens × bits → groupBy) so the
    oracle can mirror it bit-for-bit."""
    tok = df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
    counted = tok.groupBy("id", "tok").agg(F.count("*").alias("w"))
    hashed = counted.withColumn("h", F.md5(F.col("tok").cast("binary")))
    bits = hashed.select(
        "id",
        "w",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("b"),
    )
    # bit b of the hex digest: digit = h[b div 4], bit = (digit >> (3 - b mod 4)) & 1
    digit = F.substring(F.col("h"), (F.col("b") / 4).cast("int") + 1, 1)
    dval = F.instr(F.lit("0123456789abcdef"), digit) - 1
    # shiftright() needs a literal shift; the shift varies per row, so
    # divide by 2^shift instead (dval ≤ 15, exact in doubles)
    shift = (F.lit(3) - F.col("b") % 4).cast("double")
    bit = F.floor(dval / F.pow(F.lit(2.0), shift)).cast("int") % 2
    signed = bits.withColumn("contrib", (bit * 2 - 1) * F.col("w"))
    per_bit = signed.groupBy("id", "b").agg(
        F.when(F.sum("contrib") > 0, F.lit("1")).otherwise(F.lit("0")).alias("bitval")
    )
    return per_bit.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("b", "bitval"))), lambda s: s["bitval"]
            ),
            "",
        ).alias("simhash")
    )


def simhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 64,
    bands: int = 4,
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share an exact 16-bit
    band (pigeonhole: any pair within Hamming ≤ bands-1 is caught),
    then exact Hamming distance filters. Join is on band substrings —
    never all-pairs."""
    width = n_bits // bands
    sig = simhash_bits(df, id_col, text_col, n_bits)
    pairs = None
    for b in range(bands):
        key = F.substring("simhash", b * width + 1, width)
        a = sig.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), key.alias("bk"))
        c = sig.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), key.alias("bk"))
        p = (
            a.join(c, "bk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    cand = pairs.distinct()
    ham = F.size(
        F.filter(
            F.zip_with(
                F.split(F.col("sh_a"), ""),
                F.split(F.col("sh_b"), ""),
                lambda x, y: x != y,
            ),
            lambda v: v,
        )
    )
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Brute-force cosine near-dup pairs (id_a < id_b, sim ≥ t).
    Quadratic — correctness baseline; use ``operators.ann`` IVF
    grouping to bound the pair space at scale."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.vector import (
        cosine_similarity,
    )

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
