"""End-to-end crawl -> corpus pipeline test (WARC files on disk through
web_corpus and on into curate_corpus)."""

from __future__ import annotations

import gzip

from quantms_utils_spark.pipelines.web_ingest import web_corpus


def _http(html: str) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + html.encode()
    )


def _record(rid: str, uri: str, body: bytes, rtype: str = "response") -> bytes:
    head = (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode() + body + b"\r\n\r\n"


PAGE = "<html><body><p>the quick brown fox jumps over the lazy dog</p></body></html>"
OTHER = "<html><script>var a=1;</script><body><h1>Totally different</h1><p>words are here</p></body></html>"


def _build_archives(tmp_path):
    a = (
        _record("a1", "https://Site.One:443/page?b=2&a=1", _http(PAGE))
        # same canonical URL, later record id -> URL dedup keeps a1
        + _record("a2", "https://site.one/page?a=1&b=2", _http(OTHER))
        # same CONTENT as a1 under a different URL -> content dedup
        + _record("a3", "https://site.one/copy", _http(PAGE))
        # non-200 and non-html and non-response records are filtered
        + _record(
            "a4",
            "https://site.one/miss",
            b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone",
        )
        + _record(
            "a5",
            "https://site.one/raw",
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nplain",
        )
        + _record("a6", "https://site.one/page", b"GET / HTTP/1.1\r\n", "request")
    )
    b = _record("b1", "https://site.two/unique", _http(OTHER))
    (tmp_path / "a.warc").write_bytes(a)
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(b))


def test_web_corpus_end_to_end(spark, tmp_path):
    _build_archives(tmp_path)
    rows = {
        r["doc_id"]: r.asDict()
        for r in web_corpus(spark, str(tmp_path) + "/*").collect()
    }
    # a1 survives (URL keeper), a3 dropped (same content), a2 dropped
    # (same canonical URL as a1), b1 survives (unique)
    assert set(rows) == {"<urn:uuid:a1>", "<urn:uuid:b1>"}
    a1 = rows["<urn:uuid:a1>"]
    assert a1["url"] == "https://site.one/page?a=1&b=2"
    assert a1["source"] == "site.one"
    assert a1["text"] == "the quick brown fox jumps over the lazy dog"
    assert a1["lang"] == "en"
    b1 = rows["<urn:uuid:b1>"]
    assert b1["source"] == "site.two"
    assert "var a=1" not in b1["text"]  # script content never leaks


def test_web_corpus_feeds_curation(spark, tmp_path):
    _build_archives(tmp_path)
    from quantms_utils_spark.pipelines.curation import curate_corpus

    docs = web_corpus(spark, str(tmp_path) + "/*").select(
        "doc_id", "text", "source"
    )
    curated = curate_corpus(docs, benchmark=docs.limit(0), token_budget=10**6)
    # the chain runs end-to-end on crawl output and keeps the survivors
    assert curated.count() >= 1
    assert {"doc_id", "source"}.issubset(set(curated.columns))


def test_continuous_crawl_classifies_across_dumps(spark, tmp_path):
    """Two crawl dumps landed in sequence: pages already in the standing
    corpus classify exact_dup on the second drain; new pages stay new."""
    from quantms_utils_spark.pipelines.web_ingest import start_continuous_crawl

    landing = tmp_path / "landing"
    landing.mkdir()
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = start_continuous_crawl(
            spark, str(landing), corpus_dir=corpus, out_dir=out,
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    (landing / "dump1.warc").write_bytes(
        _record("c1", "https://site.one/p1", _http(PAGE))
        + _record("c2", "https://site.one/p2", _http(OTHER))
    )
    drain()
    first = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(out + "/epoch=*").collect()
    }
    assert set(first.values()) == {"new"}

    (landing / "dump2.warc").write_bytes(
        # same PAGE content at a new URL -> exact_dup of the standing corpus
        _record("c3", "https://site.two/copy", _http(PAGE))
        + _record("c4", "https://site.two/fresh",
                  _http("<html><body><p>never seen before text</p></body></html>"))
    )
    drain()
    statuses = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(out + "/epoch=*").collect()
    }
    assert statuses["<urn:uuid:c3>"] == "exact_dup"
    assert statuses["<urn:uuid:c4>"] == "new"


def test_web_corpus_case_insensitive_content_type_and_aggregate_dedup(
    spark, tmp_path
):
    """Round-10 (review): 'TEXT/HTML' responses are kept (header values are
    case-insensitive in the wild), and both keeper reductions run as
    min_by aggregates (no keyed window in the plan — whale-page safety)."""
    from quantms_utils_spark.pipelines.web_ingest import web_corpus

    def rec(rid, uri, ctype, body):
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n" + body
        )
        return (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: <" + rid + b">\r\n"
            b"WARC-Target-URI: " + uri + b"\r\n"
            b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
            b"\r\n" + payload + b"\r\n\r\n"
        )

    html = b"<html><body>hello corpus page</body></html>"
    data = (
        rec(b"urn:1", b"http://a.example/x", b"text/html", html)
        + rec(b"urn:2", b"http://b.example/y", b"TEXT/HTML; charset=utf-8",
              html.replace(b"hello", b"other"))
        + rec(b"urn:3", b"http://c.example/z", b"image/png", b"\x89PNG")
    )
    f = tmp_path / "crawl.warc"
    f.write_bytes(data)
    out = web_corpus(spark, str(f))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan and "min_by" in plan
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {"<urn:1>", "<urn:2>"}  # PNG dropped, TEXT/HTML kept
