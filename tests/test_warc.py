"""WARC source (sources/warc.py): ISO 28500 framing (plain +
per-record gzip), HTTP payload split, document extraction through the
codegen'd HTML strip, malformed-segment errors."""

import gzip

import pytest
from pyspark.sql import functions as F

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.warc import (
    load_warc_records,
    parse_warc_records,
    warc_documents,
)


def _record(warc_type: str, url: str, payload: bytes, extra: str = "") -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"WARC-Record-ID: <urn:uuid:{warc_type}-{len(payload)}>\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"{extra}"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


HTML_A = b"<html><body><h1>Title A</h1><p>alpha beta</p><script>x=1</script></body></html>"
HTML_B = b"<html><body><p>gamma &amp; delta</p></body></html>"


def _segment() -> bytes:
    return (
        _record("warcinfo", "urn:none", b"software: test\r\n")
        + _record("request", "http://a.example/", b"GET / HTTP/1.1\r\n\r\n")
        + _record("response", "http://a.example/", _http(HTML_A))
        + _record("response", "http://b.example/", _http(HTML_B))
        + _record("response", "http://c.example/", _http(b"{}", ctype="application/json"))
        + _record("response", "http://d.example/", _http(b"gone", status=404))
    )


def test_parse_plain_segment():
    recs = parse_warc_records(_segment())
    assert [r.warc_type for r in recs] == [
        "warcinfo", "request", "response", "response", "response", "response",
    ]
    resp = [r for r in recs if r.warc_type == "response"]
    assert resp[0].url == "http://a.example/"
    assert resp[0].http_status == 200
    assert resp[0].http_content_type == "text/html"
    assert resp[0].body == HTML_A
    assert resp[3].http_status == 404


def test_parse_gzip_members_segment():
    # per-record gzip members (the standard .warc.gz layout)
    seg = _segment()
    parts = [
        _record("warcinfo", "urn:none", b"software: test\r\n"),
        _record("request", "http://a.example/", b"GET / HTTP/1.1\r\n\r\n"),
        _record("response", "http://a.example/", _http(HTML_A)),
        _record("response", "http://b.example/", _http(HTML_B)),
    ]
    assert seg.startswith(b"".join(parts[:1]))
    gz = b"".join(gzip.compress(p) for p in parts)
    recs = parse_warc_records(gz)
    assert len(recs) == 4
    assert recs[2].body == HTML_A


def test_malformed_segment_raises():
    with pytest.raises(ValueError, match="malformed"):
        parse_warc_records(b"NOT A WARC")
    truncated = _record("response", "http://a/", _http(HTML_A))[:-20]
    with pytest.raises(ValueError, match="truncated|malformed"):
        parse_warc_records(truncated)


def test_truncated_gzip_member_raises():
    gz = gzip.compress(_record("response", "http://a/", _http(HTML_A)))
    with pytest.raises(ValueError, match="truncated gzip member"):
        parse_warc_records(gz[:-10])


def test_chunked_transfer_encoding_dechunked():
    # body split across three chunks (with a chunk extension) + trailer
    chunked = (
        b"19;ext=1\r\n<html><body><p>alpha beta\r\n"
        b"11\r\n gamma</p></body>\r\n"
        b"7\r\n</html>\r\n"
        b"0\r\nX-Trailer: t\r\n\r\n"
    )
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + chunked
    )
    recs = parse_warc_records(_record("response", "http://c.example/x", payload))
    assert recs[0].body == b"<html><body><p>alpha beta gamma</p></body></html>"
    # truncated mid-chunk fails loudly
    bad = payload[: payload.find(b"0\r\nX-Trailer") - 4]
    bad_rec = (
        f"WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: http://c/\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(bad)}\r\n\r\n"
    ).encode() + bad + b"\r\n\r\n"
    with pytest.raises(ValueError, match="chunked"):
        parse_warc_records(bad_rec)
    # a proxy that dechunked the body but kept the header: pass-through
    lied = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"<html>plain already</html>"
    )
    recs = parse_warc_records(_record("response", "http://d.example/", lied))
    assert recs[0].body == b"<html>plain already</html>"


def test_dechunk_long_extension_and_bad_sizes():
    """r12 review regressions: a first size line with a long chunk
    extension (streaming-signature style) must still be recognized as
    chunked; sign-prefixed sizes are malformed, not int()-accepted."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.warc import (
        _dechunk,
    )

    sig = b"chunk-signature=" + b"a" * 64
    chunked = (
        b"b;" + sig + b"\r\nhello world\r\n"
        b"0;" + sig + b"\r\n\r\n"
    )
    assert _dechunk(chunked) == b"hello world"
    with pytest.raises(ValueError, match="bad chunk size"):
        _dechunk(b"5\r\nhello\r\n-4\r\nxxxx\r\n0\r\n\r\n")
    # sign-prefixed FIRST line is not valid framing: pass-through
    assert _dechunk(b"-4\r\nxxxx") == b"-4\r\nxxxx"


def test_content_type_case_and_charset(spark, tmp_path):
    latin = "<p>café résumé</p>".encode("iso-8859-1")
    bad_utf8 = b"<p>ok " + bytes([0xE9]) + b" end</p>"  # invalid UTF-8 byte
    seg = (
        _record(
            "response",
            "http://u.example/",
            _http(b"<p>upper ctype</p>", ctype="Text/HTML; Charset=UTF-8"),
        )
        + _record(
            "response",
            "http://l.example/",
            _http(latin, ctype='text/html; charset="ISO-8859-1"'),
        )
        + _record("response", "http://m.example/", _http(bad_utf8))
    )
    (tmp_path / "seg.warc").write_bytes(seg)
    docs = warc_documents(load_warc_records(spark, str(tmp_path)))
    rows = {r["source"].split("#")[0]: r["text"] for r in docs.collect()}
    assert rows["http://u.example/"] == "upper ctype"  # Text/HTML not dropped
    assert rows["http://l.example/"] == "café résumé"
    assert rows["http://m.example/"] == "ok � end"  # lossy, never raises


def test_load_and_extract_documents(spark, tmp_path):
    (tmp_path / "seg1.warc").write_bytes(_segment())
    (tmp_path / "seg2.warc.gz").write_bytes(
        gzip.compress(_record("response", "http://e.example/", _http(HTML_B)))
    )
    recs = load_warc_records(spark, str(tmp_path))
    by_type = {
        r["warc_type"]: r["n"]
        for r in recs.groupBy("warc_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {"warcinfo": 1, "request": 1, "response": 5}

    docs = warc_documents(recs)
    rows = {r["source"]: r["text"] for r in docs.collect()}
    # only 2xx text/html responses survive: a, b (seg1) + e (seg2)
    assert set(rows) == {
        "http://a.example/#2",
        "http://b.example/#3",
        "http://e.example/#0",
    }
    assert rows["http://a.example/#2"] == "Title A alpha beta"
    assert rows["http://b.example/#3"] == "gamma & delta"
    # document shape plugs straight into the ingest funnel
    assert docs.columns == ["text", "source", "page"]



def test_warc_to_index_end_to_end(spark, tmp_path):
    """The full web-ingest funnel: WARC segments -> HTML extraction ->
    PII scrub -> chunk -> embed -> VectorIndex. Raw markup and PII
    never reach the index; ids are content-addressed over the
    scrubbed, extracted text."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.embed.providers import (
        HashEmbedder,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.index_table import (
        VectorIndex,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.streaming.ingest import (
        docs_to_records,
    )

    page = (
        b"<html><body><h1>Contact</h1><p>mail jane@example.com or call "
        b"415-555-0134; office net 10.0.0.7</p><p>"
        + b"useful words " * 120
        + b"</p></body></html>"
    )
    (tmp_path / "seg.warc").write_bytes(
        _record("response", "http://site.example/page", _http(page))
    )
    docs = warc_documents(load_warc_records(spark, str(tmp_path))).select(
        "text", "source"
    )
    idx = VectorIndex(spark, str(tmp_path / "idx"), "warc-idx").create(dimension=32)
    n = idx.upsert(
        docs_to_records(docs, HashEmbedder(dimension=32), scrub=True), batch=0
    )
    assert n > 1  # long page -> multiple chunks
    joined = " ".join(r["text"] for r in idx.read().select("text").collect())
    assert "<" not in joined and "jane@example.com" not in joined
    assert "415-555-0134" not in joined and "10.0.0.7" not in joined
    assert "[EMAIL]" in joined and "useful words" in joined
    srcs = {r["source"] for r in idx.read().select("source").collect()}
    assert srcs == {"http://site.example/page#0"}


def test_web_crawl_documents_dedup_and_host_cap(spark, tmp_path):
    """canonical-URL dedup keeps the FIRST capture; host cap bounds
    per-host contribution with first-captures winning."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.warc import (
        web_crawl_documents,
    )

    def page(marker):
        return _http(
            ("<p>body of capture " + marker + " with enough words</p>").encode()
        )

    seg = (
        # same page, three URL spellings -> one survivor (the first)
        _record("response", "HTTP://A.example/x?utm_source=f&k=1", page("first"))
        + _record("response", "http://a.example:80/x?k=1", page("second"))
        + _record("response", "http://a.example/x/?k=1", page("third"))
        # host b: three distinct pages, cap=2 keeps the first two
        + _record("response", "http://b.example/1", page("b1"))
        + _record("response", "http://b.example/2", page("b2"))
        + _record("response", "http://b.example/3", page("b3"))
    )
    (tmp_path / "seg.warc").write_bytes(seg)
    docs = web_crawl_documents(
        load_warc_records(spark, str(tmp_path)), main_content=False, host_cap=2
    )
    rows = {r["source"]: r["text"] for r in docs.collect()}
    assert set(rows) == {
        "HTTP://A.example/x?utm_source=f&k=1#0",  # survivor keeps its raw URL
        "http://b.example/1#3",
        "http://b.example/2#4",
    }
    assert rows["HTTP://A.example/x?utm_source=f&k=1#0"].startswith(
        "body of capture first"
    )


def test_web_crawl_documents_robots_gate(spark, tmp_path):
    """robots_rules gates dedup SURVIVORS before the host cap:
    disallowed pages are dropped and never consume host quota."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        parse_robots_rules,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.warc import (
        web_crawl_documents,
    )

    def page(marker):
        return _http(
            ("<p>body of capture " + marker + " with enough words</p>").encode()
        )

    seg = (
        _record("response", "http://a.example/blocked/1", page("x1"))
        + _record("response", "http://a.example/ok/1", page("x2"))
        + _record("response", "http://a.example/ok/2", page("x3"))
        + _record("response", "http://a.example/ok/3", page("x4"))
    )
    (tmp_path / "seg.warc").write_bytes(seg)
    rules = parse_robots_rules(
        spark.createDataFrame(
            [("a.example", "User-agent: *\nDisallow: /blocked/")],
            "host string, body string",
        )
    )
    docs = web_crawl_documents(
        load_warc_records(spark, str(tmp_path)),
        main_content=False,
        host_cap=2,
        robots_rules=rules,
    )
    # /blocked/1 is gated out and does NOT consume quota: the first
    # TWO allowed pages survive the cap
    assert {r["source"] for r in docs.collect()} == {
        "http://a.example/ok/1#1",
        "http://a.example/ok/2#2",
    }


def test_wet_documents(spark, tmp_path):
    """Common Crawl WET segments: conversion records carry the
    crawl's own extracted text — straight to document shape."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.warc import (
        wet_documents,
    )

    def _wet_record(url: str, text: bytes) -> bytes:
        head = (
            f"WARC/1.0\r\nWARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(text)}\r\n\r\n"
        ).encode()
        return head + text + b"\r\n\r\n"

    seg = (
        _record("warcinfo", "urn:none", b"software: wet\r\n")
        + _wet_record("http://a.example/", b"already extracted text a")
        + _wet_record("http://b.example/", b"pre \xe9 extracted")  # bad utf-8
    )
    (tmp_path / "seg.warc.wet").write_bytes(seg)
    docs = wet_documents(load_warc_records(spark, str(tmp_path), glob="*.wet"))
    rows = {r["source"]: r["text"] for r in docs.collect()}
    assert rows == {
        "http://a.example/#1": "already extracted text a",
        "http://b.example/#2": "pre � extracted",  # lossy, never raises
    }
    assert docs.columns == ["text", "source", "page"]


def test_wet_crawl_documents_dedup_robots_cap(spark, tmp_path):
    """The WET funnel twin shares the WARC funnel's curation stages:
    canonical-URL dedup (first capture wins), robots gate (no quota
    consumed by blocked pages), per-host cap."""
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.functions.robots import (
        parse_robots_rules,
    )
    from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.sources.warc import (
        wet_crawl_documents,
    )

    def _wet_record(url: str, text: bytes) -> bytes:
        head = (
            f"WARC/1.0\r\nWARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(text)}\r\n\r\n"
        ).encode()
        return head + text + b"\r\n\r\n"

    seg = (
        _wet_record("HTTP://A.example:80/dup?utm_source=x", b"first capture")
        + _wet_record("http://a.example/dup", b"recapture dropped")
        + _wet_record("http://a.example/blocked/1", b"gated out")
        + _wet_record("http://a.example/ok/1", b"kept one")
        + _wet_record("http://a.example/ok/2", b"over the cap")
        + _wet_record("http://b.example/solo", b"other host")
    )
    (tmp_path / "seg.warc.wet").write_bytes(seg)
    rules = parse_robots_rules(
        spark.createDataFrame(
            [("a.example", "User-agent: *\nDisallow: /blocked/")],
            "host string, body string",
        )
    )
    docs = wet_crawl_documents(
        load_warc_records(spark, str(tmp_path), glob="*.wet"),
        host_cap=2,
        robots_rules=rules,
    )
    got = {r["source"]: r["text"] for r in docs.collect()}
    # dedup keeps the FIRST capture (case/port/tracking-param variant),
    # the blocked page is gated without consuming quota, and the cap
    # admits two a.example pages; b.example is untouched
    assert got == {
        "HTTP://A.example:80/dup?utm_source=x#0": "first capture",
        "http://a.example/ok/1#3": "kept one",
        "http://b.example/solo#5": "other host",
    }
