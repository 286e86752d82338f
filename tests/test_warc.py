"""WARC source + web text-extraction tests (pure-stdlib parser)."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from quantms_utils_spark.operators.web import html_strip_fast, html_text
from quantms_utils_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    split_http_payload,
)


def _record(
    rtype: str, uri: str | None, body: bytes, crlf: str = "\r\n"
) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {rtype}",
            f"WARC-Record-ID: <urn:uuid:{rtype}-1>",
            f"WARC-Date: 2024-01-01T00:00:00Z",
            f"Content-Length: {len(body)}"]
    if uri:
        head.insert(2, f"WARC-Target-URI: {uri}")
    return (crlf.join(head) + crlf + crlf).encode() + body + crlf.encode() * 2


HTTP_BODY = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    b"<html><body><p>hello crawl</p></body></html>"
)


def _archive(crlf: str = "\r\n") -> bytes:
    return (
        _record("warcinfo", None, b"software: test\r\n", crlf)
        + _record("request", "https://x.org/a", b"GET /a HTTP/1.1\r\n", crlf)
        + _record("response", "https://x.org/a", HTTP_BODY, crlf)
    )


def test_parse_multi_record_archive():
    recs = list(parse_warc_bytes(_archive()))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response"]
    assert recs[2]["target_uri"] == "https://x.org/a"
    assert recs[2]["content_length"] == len(HTTP_BODY)
    assert recs[2]["body"] == HTTP_BODY


def test_parse_tolerates_bare_newlines():
    recs = list(parse_warc_bytes(_archive(crlf="\n")))
    assert len(recs) == 3
    assert recs[2]["body"] == HTTP_BODY


def test_parse_gzip_member_per_record():
    gz = b"".join(
        gzip.compress(_record(t, u, b))
        for t, u, b in [
            ("warcinfo", None, b"software: test\r\n"),
            ("response", "https://x.org/a", HTTP_BODY),
        ]
    )
    recs = list(parse_warc_bytes(gz))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
    assert recs[1]["body"] == HTTP_BODY


def test_split_http_payload():
    status, ctype, entity = split_http_payload(HTTP_BODY)
    assert status == 200 and ctype == "text/html"
    assert entity == b"<html><body><p>hello crawl</p></body></html>"
    # non-HTTP passes through untouched
    assert split_http_payload(b"raw") == (None, None, b"raw")


def test_read_warc_dataframe(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_archive())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_archive()))
    df = read_warc(spark, str(tmp_path) + "/*")
    rows = df.collect()
    assert len(rows) == 6  # 3 records x 2 files
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert len(resp) == 2
    for r in resp:
        assert r["http_status"] == 200
        assert r["http_content_type"] == "text/html"
        assert bytes(r["body"]) == b"<html><body><p>hello crawl</p></body></html>"
        assert r["source_file"].endswith((".warc", ".warc.gz"))


HTML_CASE = (
    "<html><head><title>T</title><style>p{color:red}</style>"
    "<script>var x = '<p>no</p>';</script></head>"
    "<body><h1>Head</h1><p>A &amp; B</p><p>two</p></body></html>"
)


def test_html_text_exact_extraction(spark):
    df = spark.createDataFrame([(HTML_CASE,), (None,)], "h string")
    got = df.select(html_text(F.col("h")).alias("t")).collect()
    assert got[0]["t"] == "T Head A & B two"
    assert got[1]["t"] is None


def test_html_strip_fast_approximation(spark):
    df = spark.createDataFrame([(HTML_CASE,)], "h string")
    [r] = df.select(html_strip_fast(F.col("h")).alias("t")).collect()
    assert r["t"] == "T Head A & B two"


def test_normalize_url(spark):
    from quantms_utils_spark.operators.web import normalize_url

    cases = [
        ("HTTPS://Corpus.Example:443/doc/7?b=2&a=1#frag",
         "https://corpus.example/doc/7?a=1&b=2"),
        ("http://x.org/path", "http://x.org/path"),
        ("http://x.org", "http://x.org"),
        ("https://X.org/p?single=1", "https://x.org/p?single=1"),
        # round-10 review: NON-default ports are distinct origins and must
        # SURVIVE (parse_url HOST dropped every port, collapsing
        # :8080/:9090 into one crawl identity); default ports still drop
        ("http://X.org:8080/a", "http://x.org:8080/a"),
        ("http://x.org:80/a", "http://x.org/a"),
        ("https://x.org:8443/a", "https://x.org:8443/a"),
        ("http://u:pw@X.org:8080/a", "http://u:pw@x.org:8080/a"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(normalize_url(F.col("u"))).collect()]
    assert got == [want for _, want in cases]


def _register_warc(spark):
    from quantms_utils_spark.sources.warc_datasource import (
        register_warc_source,
    )

    register_warc_source(spark)


def test_warc_datasource_reads_files(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_archive())
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(_archive()))
    _register_warc(spark)
    df = spark.read.format("warc").load(str(tmp_path))
    rows = df.collect()
    assert len(rows) == 6
    resp = [r for r in rows if r["warc_type"] == "response"]
    assert len(resp) == 2
    for r in resp:
        assert r["http_status"] == 200
        assert bytes(r["body"]) == (
            b"<html><body><p>hello crawl</p></body></html>"
        )
    # parity with the mapInPandas reader on identical input
    legacy = read_warc(spark, str(tmp_path) + "/*")
    a = sorted((r["record_id"], r["warc_type"]) for r in rows)
    b = sorted((r["record_id"], r["warc_type"]) for r in legacy.collect())
    assert a == b


def test_warc_datasource_pushdown(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_archive())
    _register_warc(spark)
    from quantms_utils_spark.sources.warc_datasource import (
        EqualTo,
        WarcDataSourceReader,
    )

    # contract: both crawl filters are claimed, others returned
    reader = WarcDataSourceReader.__new__(WarcDataSourceReader)
    reader.http_status = None
    reader.warc_type = None
    remaining = list(
        reader.pushFilters(
            [
                EqualTo(("warc_type",), "response"),
                EqualTo(("http_status",), 200),
                EqualTo(("content_type",), "application/http"),
            ]
        )
    )
    assert reader.warc_type == "response" and reader.http_status == 200
    assert len(remaining) == 1

    # end-to-end: filtered scan returns only the qualifying record
    df = (
        spark.read.format("warc")
        .load(str(tmp_path))
        .filter("warc_type = 'response'")
        .filter("http_status = 200")
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["target_uri"] == "https://x.org/a"


def test_warc_datasource_no_files_errors(spark, tmp_path):
    _register_warc(spark)
    from quantms_utils_spark.sources.warc_datasource import (
        WarcDataSourceReader,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="resolved no files"):
        WarcDataSourceReader(None, {"path": str(tmp_path / "none*")})
    with _pytest.raises(ValueError, match="needs .load"):
        WarcDataSourceReader(None, {})


def test_warc_truncated_final_record_dropped_not_partial(spark):
    """Round-10 (review): a record whose Content-Length runs past the file
    end (cut-off download) is DROPPED, never yielded with a silently
    partial body."""
    from quantms_utils_spark.sources.warc import parse_warc_bytes

    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:1>\r\n"
        b"Content-Length: 10\r\n"
        b"\r\n"
        b"0123456789\r\n\r\n"
    )
    truncated = rec + (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:2>\r\n"
        b"Content-Length: 100\r\n"
        b"\r\n"
        b"short"
    )
    got = list(parse_warc_bytes(truncated))
    assert [r["record_id"] for r in got] == ["<urn:uuid:1>"]
    assert got[0]["body"] == b"0123456789"


def test_warc_corrupt_file_skip_or_error_with_path(spark, tmp_path):
    """Round-10 (review): a corrupt gzip container raises with the file
    path attached by default, or is logged-and-skipped with
    on_corrupt='skip' while good files still parse."""
    import gzip

    import pytest

    from quantms_utils_spark.sources.warc import read_warc

    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:ok>\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    (tmp_path / "good.warc.gz").write_bytes(gzip.compress(good))
    # gzip magic followed by garbage -> zlib.error inside the member walk
    (tmp_path / "bad.warc.gz").write_bytes(b"\x1f\x8b" + b"\xff" * 64)

    with pytest.raises(Exception, match="bad.warc.gz"):
        read_warc(spark, str(tmp_path) + "/*.warc.gz").collect()

    rows = read_warc(
        spark, str(tmp_path) + "/*.warc.gz", on_corrupt="skip"
    ).collect()
    assert [r["record_id"] for r in rows] == ["<urn:uuid:ok>"]

    with pytest.raises(ValueError, match="on_corrupt"):
        read_warc(spark, str(tmp_path), on_corrupt="maybe")


def test_warc_truncated_record_drop_is_logged(caplog):
    """Round-11 (ADVICE r10): the truncated-record drop emits a warning
    with the record offset/id — a mid-file corrupt Content-Length truncates
    the file's record stream, and that must be observable in BOTH
    on_corrupt modes, not just detectable by counting rows."""
    import logging

    from quantms_utils_spark.sources.warc import parse_warc_bytes

    truncated = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:trunc>\r\n"
        b"Content-Length: 100\r\n"
        b"\r\n"
        b"short"
    )
    with caplog.at_level(logging.WARNING, logger="quantms_utils_spark.sources.warc"):
        got = list(parse_warc_bytes(truncated))
    assert got == []
    msgs = [r.getMessage() for r in caplog.records]
    assert any(
        "truncated" in m and "<urn:uuid:trunc>" in m for m in msgs
    ), msgs
