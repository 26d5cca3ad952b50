"""Multimodal pipeline queries (operators.multimodal).

The fake-payload format derives every metadata field from ``doc_id``
by pure integer arithmetic (``fake_media_params``), so the DuckDB
oracle recomputes the metadata WITHOUT the binary payloads — it
checks that the Spark kernels (build → decode → resize → sample)
round-trip the bytes faithfully. Feature extraction output is
byte-derived and registers rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import (
    multimodal as mm,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.topk import (
    topk_search,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (
    load,
    register,
)

# mirrors operators.multimodal.fake_media_params
_PARAMS_CTE = """
params AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][(doc_id % 3) + 1] AS kind,
         CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 16 + (doc_id * 7) % 240 END AS width,
         CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 16 + (doc_id * 11) % 240 END AS height,
         CASE WHEN doc_id % 3 = 0 THEN 1
              WHEN doc_id % 3 = 2 THEN 2 + (doc_id * 13) % 30
              ELSE 0 END AS n_frames,
         CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 5) * 8000 ELSE 0 END AS sample_rate,
         15 + 64 + (doc_id * 17) % 193 AS n_bytes
  FROM documents
)
"""


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.attach_fake_media(load(spark, sf_dir, "documents"))


@register(
    "multimodal_manifest",
    f"""
WITH {_PARAMS_CTE}
SELECT kind, count(*) AS n_items,
       sum(n_bytes)::BIGINT AS total_bytes,
       round(avg(width), 6) AS avg_width,
       max(n_frames)::INT AS max_frames,
       max(sample_rate)::INT AS max_sample_rate
FROM params GROUP BY kind
""",
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus manifest by modality — metadata-only aggregation; the
    payload column is pruned out of the scan entirely."""
    media = _media(spark, sf_dir)
    return media.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("width"), 6).alias("avg_width"),
        F.max("n_frames").alias("max_frames"),
        F.max("sample_rate").alias("max_sample_rate"),
    )


@register(
    "multimodal_decode_roundtrip",
    f"""
WITH {_PARAMS_CTE}
SELECT media_id, kind, width, height, n_frames, sample_rate
FROM params WHERE media_id < 200
""",
)
def multimodal_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload → decode kernel → metadata must equal the typed columns
    (the binary round-trip proof, checked fully by the oracle)."""
    media = _media(spark, sf_dir).filter(F.col("media_id") < 200)
    return mm.decode_media(media)


@register(
    "multimodal_resize_plan",
    f"""
WITH {_PARAMS_CTE}
SELECT media_id, kind,
       CASE WHEN kind = 'audio' OR greatest(width, height) <= 64 THEN width
            ELSE greatest(1, floor(width * (64.0 / greatest(width, height)))::INT) END AS width,
       CASE WHEN kind = 'audio' OR greatest(width, height) <= 64 THEN height
            ELSE greatest(1, floor(height * (64.0 / greatest(width, height)))::INT) END AS height
FROM params WHERE media_id < 200
""",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving thumbnail resize (stub header rewrite); the
    oracle recomputes the target geometry arithmetically."""
    media = _media(spark, sf_dir).filter(F.col("media_id") < 200)
    return mm.resize_images(media, max_side=64).select(
        "media_id", "kind", "width", "height"
    )


@register(
    "multimodal_frame_counts",
    f"""
WITH {_PARAMS_CTE}
SELECT media_id, ((n_frames + 3) // 4)::BIGINT AS n_sampled
FROM params WHERE kind = 'video' AND media_id < 500
""",
)
def multimodal_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (every 4th frame): per-video kept-frame count.
    The kind filter prunes images/audio before payloads are read."""
    media = _media(spark, sf_dir).filter(F.col("media_id") < 500)
    frames = mm.sample_frames(media, every=4)
    return frames.groupBy("media_id").agg(F.count("*").alias("n_sampled"))


# Full-value contract oracle (round 11; was rows-only): payloads are
# md5-chained from the media id (operators/multimodal.py:_build_payload)
# so all 64 features are distinct unit vectors — each query's true
# top-1 cosine neighbor is itself at exactly 1.0, strictly above every
# other candidate. The output carries no floats, so the whole row is
# hash-checkable; a kernel or search defect (wrong neighbor, dropped
# query, id mixup) breaks the hash.
_SELFMATCH_ORACLE = """
SELECT doc_id AS query_id, doc_id AS matched_id, true AS is_self
FROM documents WHERE doc_id < 64
"""


@register("multimodal_feature_selfmatch", _SELFMATCH_ORACLE)
def multimodal_feature_selfmatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media → feature vector → top-k self-similarity through the
    SAME search operators as text (operators.topk): every item's
    nearest neighbor in feature space is itself. Demonstrates the
    multimodal → vector-index bridge end-to-end."""
    media = _media(spark, sf_dir).filter(F.col("media_id") < 64)
    feats = mm.media_features(media, dim=64)
    queries = feats.select(
        F.col("media_id").alias("query_id"), F.col("feature").alias("qvec")
    )
    out = topk_search(
        queries, feats, k=1, metric="cosine", id_col="media_id", vec_col="feature"
    )
    return out.select(
        "query_id",
        F.col("vec_id").alias("matched_id"),
        (F.col("query_id") == F.col("vec_id")).alias("is_self"),
    )


_DEDUP_SEED_MOD = 97

_MM_DEDUP_ORACLE = f"""
WITH seeds AS (
  SELECT doc_id, doc_id % {_DEDUP_SEED_MOD} AS seed FROM documents
),
groups AS (
  SELECT seed, min(doc_id) AS survivor_id, count(*) AS n_copies
  FROM seeds GROUP BY seed
)
SELECT survivor_id, n_copies,
       ['image','audio','video'][(seed % 3) + 1] AS kind
FROM groups
"""


@register("multimodal_dedup_exact", _MM_DEDUP_ORACLE)
def multimodal_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob-level exact dedup — the media-pipeline twin of
    `dedup_exact`: items whose BINARY payloads are byte-identical
    collapse to one survivor (min item id) with a copy count, via
    ``md5(content)`` computed JVM-side inside one hash-groupBy — the
    single-shuffle shape that holds at 100 TB of media because only
    (16-byte digest, id) pairs shuffle, never the blobs themselves.
    Duplicates are constructed by seeding payload synthesis with
    ``doc_id % {_DEDUP_SEED_MOD}`` (every seed's payload is a pure
    function of the seed), so the oracle re-derives every group, its
    survivor, and its modality WITHOUT the bytes — equal seeds ⟺
    equal payloads by construction, and `multimodal_decode_roundtrip`
    separately proves the bytes are faithful."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators import (
        multimodal as _mm,
    )

    docs = load(spark, sf_dir, "documents")
    seeds = docs.select(
        F.col("doc_id").alias("item_id"),
        (F.col("doc_id") % _DEDUP_SEED_MOD).alias("media_id"),
    )
    media = _mm.attach_fake_media(
        seeds.select("media_id").distinct(), id_col="media_id"
    )
    items = seeds.join(media.select("media_id", "kind", "content"), "media_id")
    return (
        items.groupBy(F.md5(F.col("content")).alias("__h"))
        .agg(
            F.min("item_id").alias("survivor_id"),
            F.count("*").alias("n_copies"),
            F.any_value("kind").alias("kind"),
        )
        .drop("__h")
        .select("survivor_id", "n_copies", "kind")
    )


_PHASH_TWIN_OFFSET = 10_000_000

_MM_PHASH_ORACLE = f"""
SELECT doc_id AS id_a, doc_id + {_PHASH_TWIN_OFFSET} AS id_b, 0 AS hamming
FROM documents WHERE doc_id % 3 = 0
"""


@register("multimodal_phash_neardup", _MM_PHASH_ORACLE)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup over images: pHash (DCT low-frequency
    signature) + banded Hamming join — catches the copies byte-level
    dedup (`multimodal_dedup_exact`) provably misses. Every image
    gets a planted twin whose payload differs in trailing
    container-metadata bytes (EXIF-tweak model: md5 differs, pixels
    don't), so the expected pairs — and nothing else, checked
    full-value — are exactly (id, id + {_PHASH_TWIN_OFFSET}) at
    Hamming 0. The banding is exact by pigeonhole (bands >
    max_hamming), so the oracle needs no approximation slack."""
    docs = load(spark, sf_dir, "documents")
    base = (
        _media(spark, sf_dir)
        .filter(F.col("kind") == "image")
        .select("media_id", "content")
    )
    twins = base.select(
        (F.col("media_id") + _PHASH_TWIN_OFFSET).alias("media_id"),
        F.concat(
            "content",
            F.encode(
                F.concat(F.lit("exif:"), F.col("media_id").cast("string")),
                "utf-8",
            ),
        ).alias("content"),
    )
    items = base.unionByName(twins).withColumn("kind", F.lit("image"))
    hashes = mm.phash_media(items)
    return mm.phash_neardup_pairs(hashes, max_hamming=4).select(
        "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
    )
