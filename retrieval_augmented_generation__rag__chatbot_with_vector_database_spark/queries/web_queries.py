"""The full web-crawl ingest funnel (round 12): WARC container →
HTML main-content extraction → canonical-URL dedup → per-host cap →
PII scrub → chunk → embed → vector index — the actual shape of a
100 TB web ingest, end to end, with a full-value DuckDB oracle.

Reference lifecycle analog: ``scripts/ingest_documents.py:108-233``
(load → chunk → embed → upsert); the web stages in front are what a
crawl-scale corpus needs before that lifecycle may run.

Fixture strategy (the ``corpus_scrub_ingest_pipeline`` convention,
extended): a deterministic messy crawl is PLANTED from doc_id
arithmetic — URL case/port/fragment/tracking-param/trailing-slash
variants that collide in pairs after canonicalization, nav-heavy HTML
chrome around each document's text, planted PII, a latin-1 charset
leg, and a chunked transfer-encoding leg — then the Spark side writes
REAL ``.warc.gz`` bytes (per-record gzip members) and runs the actual
container parse + funnel, while the oracle replays every logical
stage in SQL generated from the same shared constants
(``HTML_STRIP_STEPS`` fold, URL canon SQL, ``PII_PATTERNS`` fold,
recursive-CTE chunker twin). Expected reduction at any sf:
60 captures → 30 canonical URLs → 20 after the host cap (hosts carry
3 survivors each, cap = 2).
"""

from __future__ import annotations

import gzip

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (
    load,
    register,
)

N_DOCS = 60
HOST_CAP = 2

# --- the planted crawl, Python side (drives the WARC bytes) ---------------


def _plant_url(d: int) -> str:
    scheme = "HTTP" if d % 2 == 0 else "https"
    port = (":80" if d % 2 == 0 else ":443") if d % 4 == 0 else ""
    slash = "/" if d % 8 == 0 else ""
    q = {0: "?utm_source=feed&b=2&a=1&gclid=Z", 1: "?a=1&b=2", 2: ""}[d % 3]
    frag = "#frag" if d % 5 == 0 else ""
    return f"{scheme}://WWW.Example{d % 10}.COM{port}/p/{d % 30}{slash}{q}{frag}"


def _plant_pii_tail(d: int) -> str:
    tail = f" contact user{d}@example.com from 10.{d % 256}.0.{(d * 7) % 256}"
    if d % 3 == 0:
        tail += f" ssn 123-45-{d % 10000:04d}"
    return tail


def _plant_html(d: int, text: str) -> str:
    return (
        f"<html><head><title>T{d}</title></head><body>"
        f'<nav><a href="/">Home</a> <a href="/s{d % 7}">Section</a> '
        f'<a href="/about">About</a></nav>'
        f"<h1>Document {d} heading with enough words to pass the gate</h1>"
        f"<p>{text}{_plant_pii_tail(d)}</p>"
        f'<p>See also <a href="/d{d % 11}">related doc {d % 11}</a> plus '
        f"café résumé prose keeping the link density of this page low.</p>"
        f'<aside><a href="/x">Link one here</a> <a href="/y">Link two here</a> '
        f'<a href="/z">Link three here</a></aside>'
        f'<footer>&#39;24 <a href="/tos">Terms</a> <a href="/p">Privacy</a></footer>'
        f"</body></html>"
    )


def _warc_segment(rows: list[tuple[int, str]]) -> bytes:
    """One ``.warc.gz`` segment (per-record gzip members) serving the
    planted crawl: every 5th capture is ISO-8859-1 with an
    upper-cased charset'd Content-Type (exercises the charset leg —
    the café/résumé bytes differ from UTF-8), every 7th uses
    ``Transfer-Encoding: chunked`` (exercises the dechunker)."""
    members = []
    for d, text in rows:
        page = _plant_html(d, text)
        if d % 5 == 0:
            body = page.encode("iso-8859-1")
            ctype = "Text/HTML; charset=ISO-8859-1"
        else:
            body = page.encode("utf-8")
            ctype = "text/html; charset=utf-8"
        if d % 7 == 0:
            mid = len(body) // 2
            framed = (
                f"{mid:x}\r\n".encode() + body[:mid] + b"\r\n"
                + f"{len(body) - mid:x}\r\n".encode() + body[mid:] + b"\r\n"
                + b"0\r\n\r\n"
            )
            http = (
                f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
                f"Transfer-Encoding: chunked\r\n\r\n"
            ).encode() + framed
        else:
            http = (
                f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {_plant_url(d)}\r\n"
            f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        members.append(gzip.compress(head + http + b"\r\n\r\n"))
    return b"".join(members)


# --- the same plant, SQL side (drives the oracle) --------------------------

_BASE_SQL = f"""
SELECT doc_id,
       text || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@example.com from 10.' || CAST(doc_id % 256 AS VARCHAR)
            || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)
            || CASE WHEN doc_id % 3 = 0
                    THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END AS text,
       CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END
       || '://WWW.Example' || CAST(doc_id % 10 AS VARCHAR) || '.COM'
       || CASE WHEN doc_id % 4 = 0 THEN
               CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END
          ELSE '' END
       || '/p/' || CAST(doc_id % 30 AS VARCHAR)
       || CASE WHEN doc_id % 8 = 0 THEN '/' ELSE '' END
       || CASE doc_id % 3
            WHEN 0 THEN '?utm_source=feed&b=2&a=1&gclid=Z'
            WHEN 1 THEN '?a=1&b=2'
            ELSE '' END
       || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
FROM documents
WHERE doc_id < {N_DOCS}
"""

_WRAP_SQL = """
SELECT doc_id,
       '<html><head><title>T' || CAST(doc_id AS VARCHAR)
       || '</title></head><body><nav><a href="/">Home</a> <a href="/s'
       || CAST(doc_id % 7 AS VARCHAR)
       || '">Section</a> <a href="/about">About</a></nav>'
       || '<h1>Document ' || CAST(doc_id AS VARCHAR)
       || ' heading with enough words to pass the gate</h1><p>' || text
       || '</p><p>See also <a href="/d' || CAST(doc_id % 11 AS VARCHAR)
       || '">related doc ' || CAST(doc_id % 11 AS VARCHAR)
       || '</a> plus café résumé prose keeping the link density of this page low.</p>'
       || '<aside><a href="/x">Link one here</a> <a href="/y">Link two here</a>'
       || ' <a href="/z">Link three here</a></aside>'
       || '<footer>&#39;24 <a href="/tos">Terms</a> <a href="/p">Privacy</a></footer>'
       || '</body></html>' AS html
FROM base
"""


def _funnel_oracle() -> str:
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.text import (
        html_main_content_sql,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.pii import (
        PII_PATTERNS,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries.ingest_queries import (
        chunker_merge_oracle_sql,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries.text_queries import (
        _URL_CANON_SQL,
    )

    scrub, counts, cur = "text", [], "text"
    for _, pat, token in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    for _, pat, token in PII_PATTERNS:
        counts.append(f"len(regexp_extract_all({cur}, '{pat}'))")
        cur = f"regexp_replace({cur}, '{pat}', '{token}', 'g')"
    residual = " + ".join(counts)
    chunked = chunker_merge_oracle_sql("SELECT doc_id, text FROM scrubbed")
    return f"""
WITH base AS ({_BASE_SQL}),
planted AS (SELECT doc_id, url FROM base),
cu AS ({_URL_CANON_SQL} SELECT doc_id, curl FROM canon),
surv AS (SELECT min(doc_id) AS doc_id, curl FROM cu GROUP BY curl),
hosts AS (
  SELECT doc_id,
         regexp_replace(lower(regexp_extract(url,
           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), ':[0-9]+$', '') AS host
  FROM base
),
capped AS (
  SELECT doc_id FROM (
    SELECT s.doc_id,
           row_number() OVER (PARTITION BY h.host ORDER BY s.doc_id) AS rk
    FROM surv s JOIN hosts h ON s.doc_id = h.doc_id
  ) WHERE rk <= {HOST_CAP}
),
wrapped AS (
  SELECT w.doc_id, w.html FROM ({_WRAP_SQL}) w
  JOIN capped c ON w.doc_id = c.doc_id
),
extracted AS (
  SELECT doc_id, {html_main_content_sql("html")} AS text FROM wrapped
),
scrubbed AS (SELECT doc_id, {scrub} AS text FROM extracted)
SELECT DISTINCT
       'doc_' || local_index || '_' || substr(md5(text), 1, 8) AS id,
       CAST(local_index AS INT) AS chunk_index,
       md5(text) AS chunk_md5,
       CAST({residual} AS BIGINT) AS n_pii_residual
FROM ({chunked})
"""


@register("corpus_web_ingest_funnel", _funnel_oracle())
def corpus_web_ingest_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC → index, every stage live: real ``.warc.gz`` bytes (gzip
    members, a latin-1 charset leg, a chunked transfer-encoding leg)
    → container parse (``load_warc_records``) → link-density
    main-content extraction → canonical-URL dedup → per-host cap
    (``web_crawl_documents``) → PII scrub → 500/50 chunker → embed →
    ``VectorIndex`` LWW upsert → read back. Chunk ids are
    content-addressed over the scrubbed extracted text and
    ``n_pii_residual`` re-scans every indexed chunk (must be 0), so a
    defect in ANY stage — mis-decoded charset, chunk framing kept,
    boilerplate leaking into chunks, a dropped or duplicated survivor
    — changes the full-value hash. Collected at the fixture slice
    (60 captures → 20 indexed docs); the dataflow under test is the
    same declarative plan at any scale (plan contract:
    ``tests/test_plans.py`` pins the funnel shuffle-free up to the
    dedup groupBy)."""
    import tempfile

    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.embed.providers import (
        HashEmbedder,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.operators.pii import (
        pii_counts,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.index_table import (
        VectorIndex,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.warc import (
        load_warc_records,
        web_crawl_documents,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.ingest import (
        docs_to_records,
    )

    planted = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < N_DOCS)
        .select("doc_id", "text")
        .collect()
    )
    rows = sorted((r["doc_id"], r["text"]) for r in planted)
    with tempfile.TemporaryDirectory() as tmp:
        with open(f"{tmp}/crawl-00000.warc.gz", "wb") as f:
            f.write(_warc_segment(rows))
        docs = web_crawl_documents(
            load_warc_records(spark, tmp), main_content=True, host_cap=HOST_CAP
        )
        idx = VectorIndex(spark, f"{tmp}/idx", "web-funnel").create(dimension=64)
        idx.upsert(
            docs_to_records(
                docs.select("text", "source"), HashEmbedder(dimension=64), scrub=True
            ),
            batch=0,
        )
        back = idx.read().select("id", "chunk_index", "text")
        collected = back.collect()
    out = spark.createDataFrame(collected, back.schema)
    residual = sum(pii_counts(F.col("text")).values())
    return out.select(
        "id",
        F.col("chunk_index").cast("int").alias("chunk_index"),
        F.md5(F.col("text").cast("binary")).alias("chunk_md5"),
        residual.cast("long").alias("n_pii_residual"),
    ).distinct()
