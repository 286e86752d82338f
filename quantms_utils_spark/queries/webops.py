"""WARC / web-ingestion queries: prove the crawl parser on real WARC
framing using payloads BUILT FROM the documents table (the media-codec
pattern — construct bytes from table values in Catalyst, push them through
the real parser, and let the oracle recompute the expected fields from the
same values; `queries/media.py` does the identical trick for WAV/BMP/Y4M).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from quantms_utils_spark.tables import load

_CRLF = "\r\n"
_HTTP_HEAD = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"


def _warc_record_expr() -> F.Column:
    """One complete WARC/1.0 response record (string) per document row —
    HTML-escaped text wrapped in a minimal page, behind a real HTTP response
    header, behind real WARC headers with a correct Content-Length."""
    esc = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    html = F.concat(F.lit("<html><body><p>"), esc, F.lit("</p></body></html>"))
    http = F.concat(F.lit(_HTTP_HEAD), html)
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Record-ID: <urn:uuid:"), did, F.lit(">" + _CRLF),
        F.lit("WARC-Target-URI: https://corpus.example/doc/"),
        did,
        F.lit(_CRLF),
        F.lit("WARC-Date: 2024-01-01T00:00:00Z" + _CRLF),
        F.lit("Content-Type: application/http; msgtype=response" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length(http).cast("string"),
        F.lit(_CRLF + _CRLF),
        http,
    )


def warc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a WARC response record per document, push it through the real
    parser chain (sources.warc.parse_warc_bytes → split_http_payload →
    operators.web.html_text) and report the recovered fields; the oracle
    recomputes every value straight from the table, so a framing,
    HTTP-split, or HTML-extraction bug breaks the hash match."""
    import pandas as pd

    from quantms_utils_spark.operators.web import html_text
    from quantms_utils_spark.sources.warc import (
        parse_warc_bytes,
        split_http_payload,
    )

    d = load(spark, sf_dir, "documents")
    recs = d.select("doc_id", _warc_record_expr().alias("warc"))

    def parse(batches):
        for pdf in batches:
            rows = []
            for did, raw in zip(pdf["doc_id"], pdf["warc"]):
                rec = next(parse_warc_bytes(raw.encode("utf-8")))
                status, ctype, entity = split_http_payload(rec["body"])
                rows.append(
                    {
                        "doc_id": did,
                        "target_uri": rec["target_uri"],
                        "http_status": status,
                        "content_length": rec["content_length"],
                        "html": entity.decode("utf-8"),
                    }
                )
            yield pd.DataFrame(
                rows
                if rows
                else {
                    "doc_id": pd.Series([], dtype="int64"),
                    "target_uri": pd.Series([], dtype="object"),
                    "http_status": pd.Series([], dtype="int32"),
                    "content_length": pd.Series([], dtype="int64"),
                    "html": pd.Series([], dtype="object"),
                }
            )

    parsed = recs.mapInPandas(
        parse,
        schema="doc_id long, target_uri string, http_status int,"
        " content_length long, html string",
    )
    return parsed.select(
        "doc_id",
        "target_uri",
        "http_status",
        "content_length",
        F.md5(html_text(F.col("html"))).alias("text_md5"),
    )


WARC_ROUNDTRIP_SQL = r"""
SELECT doc_id,
       'https://corpus.example/doc/' || doc_id AS target_uri,
       200 AS http_status,
       CAST(strlen('HTTP/1.1 200 OK' || chr(13) || chr(10)
                   || 'Content-Type: text/html; charset=utf-8'
                   || chr(13) || chr(10) || chr(13) || chr(10)
                   || '<html><body><p>'
                   || replace(replace(replace(text, '&', '&amp;'),
                              '<', '&lt;'), '>', '&gt;')
                   || '</p></body></html>') AS BIGINT) AS content_length,
       md5(text) AS text_md5
FROM documents
"""


QUERIES = {
    "warc_roundtrip_stats": (warc_roundtrip_stats, WARC_ROUNDTRIP_SQL),
}


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization as the crawl-dedup key: every document gets a
    deliberately messy URL variant (upper-cased scheme/host, explicit
    default port, shuffled query order, fragment) and a clean one; both
    must normalize to the same canonical string (the oracle recomputes it
    from doc_id directly, so any canonicalization drift hash-mismatches)."""
    from quantms_utils_spark.operators.web import normalize_url

    d = load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    messy = F.concat(
        F.lit("HTTPS://Corpus.Example:443/doc/"), did, F.lit("?b=2&a=1#sect")
    )
    clean = F.concat(
        F.lit("https://corpus.example/doc/"), did, F.lit("?a=1&b=2")
    )
    return d.select(
        "doc_id",
        normalize_url(messy).alias("url_norm"),
        (normalize_url(messy) == normalize_url(clean)).alias(
            "variants_collapse"
        ),
    )


URL_CANONICAL_SQL = """
SELECT doc_id,
       'https://corpus.example/doc/' || doc_id || '?a=1&b=2' AS url_norm,
       TRUE AS variants_collapse
FROM documents
"""


QUERIES["web_url_canonical"] = (url_canonical_dedup, URL_CANONICAL_SQL)
