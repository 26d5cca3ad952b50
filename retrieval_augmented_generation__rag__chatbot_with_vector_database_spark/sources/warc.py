"""WARC web-archive source (SURVEY.md §2a extension) — the Common
Crawl container format, THE bulk source a 100 TB training-data
pipeline actually ingests. The reference loads only local txt/pdf
files (``scripts/ingest_documents.py:42-64``); web-scale corpora
arrive as ``.warc`` / ``.warc.gz`` segments of HTTP captures.

Spark shape: ``binaryFile`` scan (one row per segment file — Spark
parallelizes by file, which is exactly how Common Crawl shards:
~1 GB/segment, ~64k segments per crawl) → a pure-Python record
parser in ``mapInPandas`` (Arrow-batched; no external warc library —
the ISO 28500 framing is ~40 lines) → typed record rows. The
HTML→text strip is NOT here: records carry the raw payload and
``functions.text.html_to_text`` handles extraction as codegen'd SQL,
so the only Python in the pipeline is the container framing itself.

Per-record gzip members (the standard ``.warc.gz`` layout) are
decompressed with a zlib member loop — each member is one record, so
a segment streams without ever materializing more than one record's
bytes beyond the batch.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("record_index", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("body", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


class WarcRecord(NamedTuple):
    warc_type: str
    url: str | None
    date: str | None
    content_type: str | None
    http_status: int | None
    http_content_type: str | None
    body: bytes
    n_bytes: int


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout).

    A truncated final member raises — the same loud-ValueError
    discipline as the plain-WARC framing below. Stopping silently at
    the partial prefix could drop the rest of a segment's records
    whenever the truncation happens to align with a record boundary.
    """
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:
            raise ValueError(
                "malformed .warc.gz segment: truncated gzip member after "
                f"{sum(len(o) for o in out)} decompressed bytes"
            )
        data = d.unused_data
    return b"".join(out)


_HEX_DIGITS = frozenset(b"0123456789abcdefABCDEF")


def _is_hex(tok: bytes) -> bool:
    return bool(tok) and all(c in _HEX_DIGITS for c in tok)


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 ``Transfer-Encoding: chunked`` framing:
    ``<hex-size>[;ext]CRLF <size bytes> CRLF`` repeated, terminated by
    a 0-size chunk (trailers ignored). Two deliberate edges:

    - if the body does NOT start with a valid chunk-size line, it is
      returned unchanged — some capture proxies dechunk the body but
      keep the header, and re-dechunking plain HTML would corrupt it;
    - a body that starts with valid framing but truncates mid-chunk
      raises (loud, like the rest of the parser) rather than
      returning a partial prefix.
    """
    # sniff window covers a hex size + a long chunk extension (e.g.
    # streaming-signature extensions run ~80 chars); hex-digit-only —
    # int(tok, 16) alone would accept '+5'/'-5' and let a negative
    # size rewind the cursor instead of raising
    first_eol = body.find(b"\r\n", 0, 1024)
    if first_eol <= 0:
        return body
    size_tok = body[:first_eol].split(b";", 1)[0].strip()
    if not _is_hex(size_tok):
        return body  # header lied: body is already dechunked
    out = []
    pos = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("malformed chunked body: missing size line")
        tok = body[pos:eol].split(b";", 1)[0].strip()
        if not _is_hex(tok):
            raise ValueError(
                f"malformed chunked body: bad chunk size {tok[:16]!r}"
            )
        size = int(tok, 16)
        if size == 0:
            break  # trailers (if any) ignored
        start = eol + 2
        if start + size > n:
            raise ValueError("malformed chunked body: truncated chunk data")
        out.append(body[start : start + size])
        pos = start + size + 2  # skip the chunk's trailing CRLF
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # line 0 = version / status
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1", "replace"
            )
    return headers


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP-response payloads carry status line + headers + body;
    anything that doesn't parse as HTTP is returned whole.

    Bodies captured with ``Transfer-Encoding: chunked`` are dechunked
    (``_dechunk``) so the returned body is byte-exact — exact-dedup
    hashing downstream needs content bytes, not framing bytes. Scope
    note (documented, not silent): header line folding (obsolete
    RFC 7230 obs-fold) is not unfolded."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, None, payload
    status_line = head.split(b"\r\n", 1)[0].split(b" ")
    status = int(status_line[1]) if len(status_line) > 1 and status_line[1].isdigit() else None
    headers = _parse_headers(head)
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    return status, headers.get("content-type"), body


def parse_warc_records(data: bytes) -> list[WarcRecord]:
    """Parse one WARC segment (plain or per-record-gzip) into records
    — ISO 28500 framing: ``WARC/1.x`` + headers, CRLFCRLF,
    Content-Length payload bytes, CRLFCRLF separator."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: list[WarcRecord] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            raise ValueError(
                f"malformed WARC segment: expected record header at byte "
                f"{pos}, found {data[pos:pos + 16]!r}"
            )
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("malformed WARC segment: unterminated header")
        headers = _parse_headers(data[pos:hdr_end])
        length = int(headers.get("content-length", "0"))
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) < length:
            raise ValueError("malformed WARC segment: truncated payload")
        status, http_ctype, body = _split_http(payload)
        records.append(
            WarcRecord(
                warc_type=headers.get("warc-type", "unknown"),
                url=headers.get("warc-target-uri"),
                date=headers.get("warc-date"),
                content_type=headers.get("content-type"),
                http_status=status,
                http_content_type=http_ctype,
                body=body,
                n_bytes=len(body),
            )
        )
        pos = body_start + length
    return records


def records_from_binary(bin_df: DataFrame) -> DataFrame:
    """Segment bytes ``(path, content)`` → one row per WARC record —
    the Arrow-batched framing shared by the batch reader below and
    the streaming web ingest (``streaming/web_ingest.py``), which
    applies it to each micro-batch of newly-landed segment files."""
    import pandas as pd

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for i, r in enumerate(parse_warc_records(bytes(content))):
                    rows.append(
                        {
                            "source": path,
                            "record_index": i,
                            **r._asdict(),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return bin_df.select("path", "content").mapInPandas(
        _parse, schema=WARC_RECORD_SCHEMA
    )


def load_warc_records(
    spark: SparkSession, data_dir: str, glob: str = "*.warc*"
) -> DataFrame:
    """One row per WARC record across every segment under
    ``data_dir`` (request/response/metadata/warcinfo all surfaced —
    filter on ``warc_type``). Parallelism = segment files, the Common
    Crawl sharding unit."""
    bin_df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", True)
        .option("pathGlobFilter", glob)
        .load(data_dir)
    )
    return records_from_binary(bin_df)


def html_pages(
    records: DataFrame, min_status: int = 200, max_status: int = 299
) -> DataFrame:
    """Successful HTML responses → DECODED page HTML ``(html, url,
    segment, record_index)`` — the shared scan under text extraction
    (:func:`_extracted_pages`) and link extraction
    (``functions.links.page_links``). Content-Type matching is
    case-insensitive (real crawls carry ``Text/HTML``). Charset
    scope: a declared latin-1-family charset (iso-8859-1 / latin1 /
    windows-1252 — the cp1252 C1 range is approximated by latin-1's
    control slots, which the tag strip discards anyway) decodes as
    ISO-8859-1; everything else — utf-8, ascii, absent, or unknown —
    decodes as lossy UTF-8 (``make_valid_utf8``: invalid sequences
    become U+FFFD instead of failing the scan, the only sane default
    at crawl scale)."""
    ctype = F.lower(F.coalesce(F.col("http_content_type"), F.lit("")))
    html = records.filter(
        (F.col("warc_type") == "response")
        & F.col("http_status").between(min_status, max_status)
        & ctype.startswith("text/html")
    )
    charset = F.regexp_extract(ctype, r"charset\s*=\s*\"?([a-z0-9_.:-]+)", 1)
    decoded = F.when(
        charset.isin("iso-8859-1", "latin-1", "latin1", "windows-1252", "cp1252"),
        F.decode(F.col("body"), "ISO-8859-1"),
    ).otherwise(F.expr("make_valid_utf8(body)"))
    return html.select(
        decoded.alias("html"),
        F.col("url"),
        F.col("source").alias("segment"),
        F.col("record_index"),
    )


def _extracted_pages(
    records: DataFrame,
    min_status: int,
    max_status: int,
    main_content: bool,
) -> DataFrame:
    """Successful HTML responses → extracted visible text, keeping
    the crawl keys ``(url, segment, record_index)`` for the curation
    stages (decode semantics documented on :func:`html_pages`).

    ``main_content=True`` swaps the plain tag strip for the
    link-density block gate (``functions.text.html_main_content``) —
    navigation chrome, sidebars, and footer link farms are dropped
    before the text reaches quality gates or the chunker. Everything
    past the container parse is a narrow codegen'd map."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
        html_main_content,
        html_to_text,
    )

    extract = html_main_content if main_content else html_to_text
    pages = html_pages(records, min_status, max_status)
    return pages.select(
        extract(F.col("html")).alias("text"),
        "url",
        "segment",
        "record_index",
    )


def warc_documents(
    records: DataFrame,
    min_status: int = 200,
    max_status: int = 299,
    main_content: bool = False,
) -> DataFrame:
    """Successful HTML responses → the engine's document shape
    ``(text, source, page)`` (decode/extract semantics documented on
    ``_extracted_pages``). ``source`` is ``url#record_index`` (stable
    across re-reads of the same capture, so chunk ids are idempotent
    like every other ingest path)."""
    pages = _extracted_pages(records, min_status, max_status, main_content)
    return pages.select(
        "text",
        F.concat_ws(
            "#", F.col("url"), F.col("record_index").cast("string")
        ).alias("source"),
        F.lit(None).cast("int").alias("page"),
    )


def web_crawl_documents(
    records: DataFrame,
    min_status: int = 200,
    max_status: int = 299,
    main_content: bool = True,
    host_cap: int | None = None,
    robots_rules: DataFrame | None = None,
    robots_agent: str = "*",
) -> DataFrame:
    """The crawl-curation front end of a 100 TB web ingest, as one
    declarative plan: extracted pages → canonical-URL dedup → per-host
    cap → the engine's document shape ``(text, source, page)``.

    - **URL dedup**: the same page is captured under syntactically
      different URLs; the FIRST capture per canonical form
      (``functions.url.with_canonical_url``, the staged scan-scale
      canonicalizer) survives, "first" =
      smallest ``(segment, record_index)`` — deterministic across
      re-runs and segment orderings. One hash groupBy with map-side
      ``min_by`` partial aggregation (no window sort): the natural
      shape when canonical URLs are near-unique, as in a real crawl.
    - **Robots gate** (``robots_rules`` — parsed via
      ``functions.robots.parse_robots_rules``): RFC 9309 verdicts for
      ``robots_agent`` on each DEDUP SURVIVOR's captured URL —
      disallowed pages never reach the host cap (no quota consumed)
      or the embedder. Broadcast join, no extra shuffle; applied
      post-dedup so the (cheap) hash groupBy shields the (regex)
      matcher, mirroring the streaming twin
      (``streaming.web_ingest``).
    - **Host cap** (``host_cap=N``): at most N pages per host, first
      captures win — the anti-domination gate (no single site should
      dominate the training mix). One window shuffle on the host key;
      hot hosts are exactly the skewed keys AQE's skew handling
      splits, and the cap bounds what they contribute downstream.

    Everything before the dedup groupBy is shuffle-free (binaryFile
    scan → Arrow-batched framing → codegen'd extract/filter), pinned
    by a plan contract in ``tests/test_plans.py``."""
    pages = _extracted_pages(records, min_status, max_status, main_content)
    return _curated_documents(pages, host_cap, robots_rules, robots_agent)


def _curated_documents(
    pages: DataFrame,
    host_cap: int | None,
    robots_rules: DataFrame | None,
    robots_agent: str,
) -> DataFrame:
    """The curation stages shared by the WARC and WET funnels
    (semantics documented on :func:`web_crawl_documents`): pages
    ``(text, url, segment, record_index)`` → canonical-URL dedup →
    robots gate → host cap → document shape."""
    from pyspark.sql import Window

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.url import (
        url_host,
        with_canonical_url,
    )

    order = F.struct(F.col("segment"), F.col("record_index"))
    payload = F.struct(
        F.col("text"), F.col("url"), F.col("segment"), F.col("record_index")
    )
    first = (
        with_canonical_url(pages)  # staged form: the scan-scale path
        .groupBy("canonical_url")
        .agg(F.min_by(payload, order).alias("s"))
        .select("canonical_url", "s.*")
    )
    if robots_rules is not None:
        from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
            robots_verdicts,
        )

        first = (
            robots_verdicts(first, robots_rules, agent=robots_agent)
            .filter(F.col("allowed") == 1)
            .drop("allowed", "matched_rule", "matched_pattern", "target", "host")
        )
    if host_cap is not None:
        w = Window.partitionBy(url_host("url")).orderBy("segment", "record_index")
        first = (
            first.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= host_cap)
            .drop("_rk")
        )
    return first.select(
        "text",
        F.concat_ws(
            "#", F.col("url"), F.col("record_index").cast("string")
        ).alias("source"),
        F.lit(None).cast("int").alias("page"),
    )


def _wet_pages(records: DataFrame) -> DataFrame:
    """WET ``conversion`` records → ``(text, url, segment,
    record_index)`` — the page shape the curation stages consume.
    Record-level Content-Type ``text/plain`` (case-insensitive), no
    HTTP envelope; decode is lossy UTF-8 (``make_valid_utf8``), the
    WARC scope default."""
    conv = records.filter(
        (F.col("warc_type") == "conversion")
        & F.lower(F.coalesce(F.col("content_type"), F.lit(""))).startswith(
            "text/plain"
        )
    )
    return conv.select(
        F.expr("make_valid_utf8(body)").alias("text"),
        F.col("url"),
        F.col("source").alias("segment"),
        F.col("record_index"),
    )


def wet_documents(records: DataFrame) -> DataFrame:
    """Common Crawl WET segments → the engine's document shape.

    WET is the SAME ISO 28500 container carrying pre-extracted text:
    one ``conversion`` record per page (record-level Content-Type
    ``text/plain``, no HTTP envelope, body = the crawl's own HTML→text
    output, UTF-8). Pipelines that trust the crawl's extraction start
    here and skip the HTML stage entirely — everything downstream
    (URL dedup, host cap, scrub, chunk) is unchanged.
    """
    return _wet_pages(records).select(
        "text",
        F.concat_ws(
            "#", F.col("url"), F.col("record_index").cast("string")
        ).alias("source"),
        F.lit(None).cast("int").alias("page"),
    )


def wet_crawl_documents(
    records: DataFrame,
    host_cap: int | None = None,
    robots_rules: DataFrame | None = None,
    robots_agent: str = "*",
) -> DataFrame:
    """:func:`web_crawl_documents`' WET twin — the funnel Common Crawl
    consumers actually run, since most pipelines start from WET (the
    crawl's own pre-extracted text) rather than re-extracting HTML:
    ``conversion`` records → canonical-URL dedup (first capture by
    ``(segment, record_index)``) → robots gate → per-host cap →
    document shape. The curation stages are the SAME code
    (:func:`_curated_documents`), so dedup keys, gate semantics, and
    cap ordering are identical across the two container flavors; only
    the text source differs (crawl-extracted vs engine-extracted).
    Reference lifecycle analog: ``scripts/ingest_documents.py:108-233``
    ingests operator-supplied text — WET is that text at crawl scale."""
    return _curated_documents(
        _wet_pages(records), host_cap, robots_rules, robots_agent
    )
