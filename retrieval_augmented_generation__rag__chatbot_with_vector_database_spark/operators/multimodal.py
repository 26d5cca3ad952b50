"""Multimodal (image/audio/video) columns for the training-data
pipeline: opaque ``binary`` content + typed metadata, with
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` kernels.

The reference is text-only; this is the north-star extension that
makes the engine usable for multimodal corpus curation at 100 TB.
Design rules:

- **Content is an opaque ``binary`` column**; all typed facts about
  it (width/height/frames/sample rate) live in explicit columns, so
  Catalyst can filter/prune on metadata WITHOUT touching payload
  bytes (column pruning keeps multi-MB blobs out of shuffles).
- **Kernels are mapInPandas** — one Arrow batch of payloads at a
  time; never collect, never per-row Python UDFs.
- **Real codecs are not in this container.** Decoding is stubbed
  behind a deterministic fake payload format (``FAKE`` header +
  md5-chain body, below) so every kernel's Spark plumbing — schema,
  batch shape, explode semantics — is real and tested; swapping
  ``_decode_header`` for PIL/ffmpeg is a kernel-internal change.

Fake payload layout (deterministic from the source row):
  bytes 0-3   b"FAKE"
  byte  4     kind: 0=image 1=audio 2=video
  bytes 5-6   width   (big-endian u16, images/video)
  bytes 7-8   height  (big-endian u16, images/video)
  bytes 9-10  n_frames (u16, video; 1 for image, 0 for audio)
  bytes 11-14 sample_rate (u32, audio; 0 otherwise)
  body        md5 chain seeded by doc_id (16-byte blocks)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ("image", "audio", "video")
HEADER_LEN = 15

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def fake_media_params(doc_id: int) -> tuple[str, int, int, int, int, int]:
    """Deterministic (kind, width, height, n_frames, sample_rate,
    body_len) for a source row — pure integer arithmetic so a SQL
    oracle can recompute every metadata column without the bytes."""
    kind = KINDS[doc_id % 3]
    width = 16 + (doc_id * 7) % 240 if kind != "audio" else 0
    height = 16 + (doc_id * 11) % 240 if kind != "audio" else 0
    n_frames = 1 if kind == "image" else (2 + (doc_id * 13) % 30 if kind == "video" else 0)
    sample_rate = 8000 + (doc_id % 5) * 8000 if kind == "audio" else 0
    body_len = 64 + (doc_id * 17) % 193
    return kind, width, height, n_frames, sample_rate, body_len


def _build_payload(doc_id: int) -> bytes:
    kind, width, height, n_frames, sample_rate, body_len = fake_media_params(doc_id)
    head = (
        b"FAKE"
        + bytes([KINDS.index(kind)])
        + width.to_bytes(2, "big")
        + height.to_bytes(2, "big")
        + n_frames.to_bytes(2, "big")
        + sample_rate.to_bytes(4, "big")
    )
    body = b""
    block = hashlib.md5(f"media:{doc_id}".encode()).digest()
    while len(body) < body_len:
        body += block
        block = hashlib.md5(block).digest()
    return head + body[:body_len]


def _decode_header(content: bytes) -> dict:
    """The stub decoder — replace with PIL/soundfile/ffmpeg probes in
    an environment that has them."""
    if content[:4] != b"FAKE":
        raise NotImplementedError(
            "real media decoding requires codec libraries not present "
            "in this environment; payload is not in the FAKE format"
        )
    return {
        "kind": KINDS[content[4]],
        "width": int.from_bytes(content[5:7], "big"),
        "height": int.from_bytes(content[7:9], "big"),
        "n_frames": int.from_bytes(content[9:11], "big"),
        "sample_rate": int.from_bytes(content[11:15], "big"),
    }


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize the media table from any id-bearing source — the
    fixture generator for multimodal tests/queries (no binary fixture
    table exists)."""
    src = docs.select(F.col(id_col).cast("long").alias("media_id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                payload = _build_payload(mid)
                meta = _decode_header(payload)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": meta["kind"],
                        "content": payload,
                        "width": meta["width"],
                        "height": meta["height"],
                        "n_frames": meta["n_frames"],
                        "sample_rate": meta["sample_rate"],
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return src.mapInPandas(kernel, MEDIA_SCHEMA)


def decode_media(media: DataFrame) -> DataFrame:
    """Re-derive metadata from payload bytes (the 'probe' kernel) —
    proves the binary round-trips; output matches the typed columns."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                meta = _decode_header(bytes(content))
                rows.append({"media_id": int(mid), **meta})
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height", "n_frames", "sample_rate"]
            )

    return media.select("media_id", "content").mapInPandas(
        kernel,
        "media_id long, kind string, width int, height int, n_frames int, sample_rate int",
    )


def resize_images(media: DataFrame, max_side: int) -> DataFrame:
    """Resize kernel: shrink width/height preserving aspect ratio
    (header rewrite in the stub; a PIL thumbnail in production).
    Non-images pass through untouched."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            new_contents, new_w, new_h = [], [], []
            for content, kind, w, h in zip(
                pdf["content"], pdf["kind"], pdf["width"], pdf["height"]
            ):
                content = bytes(content)
                if kind == "audio" or max(w, h) <= max_side:
                    new_contents.append(content)
                    new_w.append(w)
                    new_h.append(h)
                    continue
                scale = max_side / max(w, h)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                content = (
                    content[:5]
                    + nw.to_bytes(2, "big")
                    + nh.to_bytes(2, "big")
                    + content[9:]
                )
                new_contents.append(content)
                new_w.append(nw)
                new_h.append(nh)
            out["content"] = new_contents
            out["width"] = new_w
            out["height"] = new_h
            yield out

    return media.mapInPandas(kernel, media.schema)


def sample_frames(media: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling: one output row per kept frame of each video
    (frame 0, every `every`-th after). The stub fabricates frame
    bytes from the payload body; production decodes real frames.
    Images/audio produce no rows — filter pushes down on ``kind``
    before the kernel ever sees payload bytes."""
    vids = media.filter(F.col("kind") == "video")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content, n_frames in zip(
                pdf["media_id"], pdf["content"], pdf["n_frames"]
            ):
                body = bytes(content)[HEADER_LEN:]
                for i in range(0, int(n_frames), every):
                    frame = hashlib.md5(body + i.to_bytes(4, "big")).digest()
                    rows.append(
                        {"media_id": int(mid), "frame_index": i, "frame": frame}
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_index", "frame"])

    return vids.select("media_id", "content", "n_frames").mapInPandas(
        kernel, "media_id long, frame_index int, frame binary"
    )


def media_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """Feature-extraction kernel: payload bytes → unit ``array<float>``
    (md5-chain pseudo-features in the stub; a vision/audio encoder in
    production). Output plugs straight into operators.topk /
    operators.ann — multimodal similarity search shares the text
    index machinery."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for content in pdf["content"]:
                raw = bytes(content)
                vals: list[float] = []
                block = hashlib.md5(raw).digest()
                while len(vals) < dim:
                    for k in range(0, 16, 4):
                        if len(vals) >= dim:
                            break
                        word = int.from_bytes(block[k : k + 4], "big")
                        vals.append(word / 4294967295.0 - 0.5)
                    block = hashlib.md5(block).digest()
                v = np.asarray(vals, dtype=np.float64)
                n = float(np.sqrt((v * v).sum()))
                vecs.append((v / n if n else v).astype(np.float32))
            out = pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "feature": vecs}
            )
            yield out

    return media.select("media_id", "content").mapInPandas(
        kernel, "media_id long, feature array<float>"
    )


# -- perceptual hashing ------------------------------------------------

#: body bytes that determine the decoded pixels; everything after is
#: container metadata (EXIF-like) a real decoder ignores. This is the
#: hook that makes byte-level dedup (md5 over the whole payload) and
#: perceptual dedup observably DIFFERENT operators: re-encoded or
#: metadata-tweaked copies share pixels but not bytes.
PHASH_PIXEL_SEED_BYTES = 32


def _fake_pixels(content: bytes, side: int) -> "np.ndarray":
    """Stub pixel decode: a deterministic side×side grayscale matrix
    from the md5 chain of the body's first PHASH_PIXEL_SEED_BYTES.
    Production swaps this for a real image decode + grayscale +
    resize; everything downstream (DCT, thresholding, banding) is the
    real algorithm."""
    body = bytes(content)[HEADER_LEN:]
    seed = body[:PHASH_PIXEL_SEED_BYTES]
    need = side * side
    buf = b""
    block = hashlib.md5(seed).digest()
    while len(buf) < need:
        buf += block
        block = hashlib.md5(block).digest()
    return (
        np.frombuffer(buf[:need], dtype=np.uint8)
        .astype(np.float64)
        .reshape(side, side)
    )


def _dct_matrix(n: int) -> "np.ndarray":
    """Orthonormal DCT-II basis (type-II, norm='ortho')."""
    k = np.arange(n)[:, None].astype(np.float64)
    i = np.arange(n)[None, :].astype(np.float64)
    D = np.cos(np.pi * (2.0 * i + 1.0) * k / (2.0 * n))
    D[0] *= np.sqrt(1.0 / n)
    D[1:] *= np.sqrt(2.0 / n)
    return D


def phash_from_pixels(img: "np.ndarray", hash_size: int = 8) -> int:
    """Classic pHash (Zauner 2010 / imagehash): 2-D DCT of the
    grayscale image, keep the top-left ``hash_size²`` low-frequency
    block, threshold each coefficient against the block median →
    64 bits, packed big-endian into a SIGNED int64 (Spark ``long``).
    Robust to noise/re-encode because low frequencies carry the
    image's structure; brightness shifts move only the DC term."""
    n = img.shape[0]
    D = _dct_matrix(n)
    low = (D @ img @ D.T)[:hash_size, :hash_size].flatten()
    bits = low > np.median(low)
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h


def phash_media(
    media: DataFrame, hash_size: int = 8, img_side: int = 32
) -> DataFrame:
    """(media_id, phash) for every IMAGE row — one ``mapInPandas``
    pass (the kind filter pushes down; audio/video payloads never
    reach the kernel). The hash is 8 bytes per image whatever the
    blob size, so downstream dedup shuffles hashes, never pixels."""
    imgs = media.filter(F.col("kind") == "image").select("media_id", "content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                phash_from_pixels(_fake_pixels(c, img_side), hash_size)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "phash": pd.Series(out, dtype="int64"),
                }
            )

    return imgs.mapInPandas(kernel, "media_id long, phash long")


def _banded_values(hash_col: str, bands: int) -> "Column":
    """Array of ``bands`` near-equal-width bit-band values of a 64-bit
    hash (13/13/13/13/12 at bands=5 — widths need not divide 64)."""
    base_w, rem = divmod(64, bands)
    widths = [base_w + 1] * rem + [base_w] * (bands - rem)
    offsets = [sum(widths[:b]) for b in range(bands)]
    return F.array(
        *[
            F.shiftrightunsigned(F.col(hash_col), offsets[b]).bitwiseAND(
                F.lit((1 << widths[b]) - 1)
            )
            for b in range(bands)
        ]
    )


def _explode_bands(hashes: DataFrame, id_col: str, hash_col: str, bands: int) -> DataFrame:
    return hashes.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.posexplode(_banded_values(hash_col, bands)).alias("band", "bval"),
    )


def phash_neardup_pairs(
    hashes: DataFrame,
    max_hamming: int = 4,
    bands: int | str = "auto",
    id_col: str = "media_id",
    hash_col: str = "phash",
    bval_cap: int | None = None,
    max_band_rounds: int = 3,
) -> DataFrame:
    """Near-duplicate image pairs by banded Hamming join — the
    MinHash-LSH shape on 64-bit perceptual hashes: split each hash
    into ``bands`` equal bit-bands, equi-join on (band index, band
    value), verify candidates with an exact popcount. By pigeonhole
    any pair within ``max_hamming`` bit flips shares at least one
    untouched band when ``bands > max_hamming`` (enforced), so the
    banding is exact, not probabilistic — candidates it skips are
    provably above the threshold.

    At 100 TB: the join shuffles (band, value, id) rows only —
    sub-quadratic as long as band values spread. Candidate volume is
    the knob: narrow bands (many) collide quadratically on large
    corpora (8-bit buckets at 1M uniform hashes already hold ~4k
    items each), so ``bands="auto"`` (default) sizes DOWN to the
    guarantee floor ``max_hamming + 1`` — the fewest, widest bands,
    which minimizes both exploded rows and per-band collision rates
    for any near-uniform bit distribution. The popcount verify runs
    BEFORE the pair dedup, so the big candidate stream is filtered by
    codegen'd xor+bit_count and only surviving near-dups pay the
    distinct's shuffle.

    **Hot-bucket guard** (``bval_cap``, ADVICE r10): visually flat or
    mass-duplicated corpora concentrate a band value — one (band,
    bval) bucket holding c of n images makes the self-join emit c²/2
    candidate rows, quadratic on that key (the same failure mode
    ``substring_span_pairs`` caps with ``df_cap``). With ``bval_cap``
    set, buckets holding more than that many ids are EXCLUDED from
    the join — and unlike a bare drop, exactness is preserved by
    re-banding: if ``h`` bands contain at least one over-cap bucket,
    any pair within ``max_hamming`` still has ``bands - max_hamming -
    h`` untouched bands that are entirely cap-free, so ``bands`` is
    grown (auto mode) until ``bands ≥ max_hamming + h + 1`` — then
    every qualifying pair still shares ≥ 1 joined band and the
    result is EXACT UNDER CAP. Growth is re-probed up to
    ``max_band_rounds`` times (re-banding moves bucket boundaries);
    if it cannot converge — a corpus so degenerate that most bands
    stay hot — the call raises rather than silently dropping pairs.
    Each probe is one count-aggregate over (band, bval) rows (8-byte
    hashes, never pixels); ``hashes`` is checkpointed first so the
    upstream DCT kernel runs once, not once per probe.

    Truly degenerate corpora (thousands of byte-identical images)
    should be exact-deduped upstream (``media_dedup_exact``) — a
    quadratic PAIR LIST over c identical images is quadratic output,
    not a join inefficiency any banding can fix.
    """
    auto = bands == "auto"
    if auto:
        bands = max_hamming + 1
    if not (isinstance(bands, int) and max_hamming < bands <= 64):
        raise ValueError(
            f"bands={bands} must exceed max_hamming={max_hamming} (the "
            "pigeonhole guarantee needs one band no flip can touch) "
            "and fit in 64 bits"
        )

    if bval_cap is not None:
        if max_band_rounds < 1:
            raise ValueError("max_band_rounds must be >= 1")
        # probe loop: grow bands until capped buckets can't uncover a
        # qualifying pair (bands ≥ max_hamming + hot_bands + 1)
        hashes = hashes.localCheckpoint()
        for _ in range(max_band_rounds):
            hot = (
                _explode_bands(hashes, id_col, hash_col, bands)
                .groupBy("band", "bval")
                .agg(F.count("*").alias("c"))
                .filter(F.col("c") > bval_cap)
                .agg(F.count_distinct("band").alias("h"))
                .first()["h"]
            )
            need = max_hamming + hot + 1
            if need <= bands:
                break
            if not auto:
                raise RuntimeError(
                    f"phash_neardup_pairs: {hot} of {bands} bands contain "
                    f"over-cap (>{bval_cap}) buckets — capping them would "
                    f"break the pigeonhole guarantee (needs bands ≥ "
                    f"{need}). Pass bands='auto' to grow, raise bval_cap, "
                    "or exact-dedup the corpus first."
                )
            if need > 64:
                raise RuntimeError(
                    f"phash_neardup_pairs: cap convergence needs {need} "
                    "bands (> 64 bits) — the corpus concentrates band "
                    "values too heavily for a capped banded join; "
                    "exact-dedup identical images first or raise bval_cap."
                )
            bands = need
        else:
            raise RuntimeError(
                f"phash_neardup_pairs: band growth did not converge in "
                f"{max_band_rounds} rounds (bands={bands}, still-hot "
                f"bands would need ≥ {need}); exact-dedup the corpus "
                "first or raise bval_cap."
            )

    exploded = _explode_bands(hashes, id_col, hash_col, bands)
    if bval_cap is not None:
        keep = (
            exploded.groupBy("band", "bval")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") <= bval_cap)
            .select("band", "bval")
        )
        exploded = exploded.join(keep, ["band", "bval"])
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, ["band", "bval"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair sharing k untouched bands appears k times
    )
