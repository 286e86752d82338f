"""WARC (Web ARChive, ISO 28500) ingestion — the Common Crawl container
format, i.e. THE at-scale source of web training text.

Pure-stdlib parser (no warcio dependency): WARC/1.0-1.1 framing is
``WARC/<ver>\\r\\n<headers>\\r\\n\\r\\n<Content-Length bytes>\\r\\n\\r\\n``.
Crawl archives are usually *member-per-record gzip* — each record its own
gzip member, so a byte range of the file decompresses independently; the
decoder walks members with zlib at gzip wbits.

Execution shape: one WARC file (typically ~1 GB in Common Crawl) is one
input partition — ``read_warc`` goes through Spark's ``binaryFile`` source
and explodes records with an Arrow-batched ``mapInPandas``, so a 100 TB
crawl parallelizes by file exactly like the mzML ingest
(`sources/mzml.py`); nothing is ever concatenated driver-side. HTTP
response records split header block from body; text extraction from HTML
lives in :mod:`quantms_utils_spark.operators.web`.
"""

from __future__ import annotations

import logging
import zlib
from collections.abc import Iterator

__all__ = [
    "parse_warc_bytes",
    "split_http_payload",
    "read_warc",
    "read_warc_stream",
    "WARC_SCHEMA",
]

WARC_SCHEMA = (
    "warc_type string, record_id string, target_uri string, warc_date string,"
    " content_type string, content_length long, http_status int,"
    " http_content_type string, body binary, source_file string"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the member-per-record layout
    crawl archives use). Plain (non-gzip) input passes through."""
    if len(data) < 2 or data[:2] != b"\x1f\x8b":
        return data
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out.append(d.decompress(data[pos:]))
        out.append(d.flush())
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # trailing garbage — stop rather than spin
            break
        pos += consumed
    return b"".join(out)


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record: the WARC header fields (lower-cased
    keys) plus ``body`` (the raw record block of Content-Length bytes).

    Tolerant of the two line-ending styles in the wild (\\r\\n per spec,
    bare \\n from naive writers) and of arbitrary inter-record padding.
    """
    data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0 or start >= n:
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        sep_len = 4
        alt = data.find(b"\n\n", start)
        if hdr_end < 0 or (0 <= alt < hdr_end):
            hdr_end, sep_len = alt, 2
        if hdr_end < 0:
            return
        header_block = data[start:hdr_end].decode("utf-8", "replace")
        lines = header_block.splitlines()
        fields: dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", "0"))
        except ValueError:
            length = 0
        if length < 0:
            # r13 audit: a negative Content-Length previously yielded a
            # bogus empty-body record AND moved the scan position
            # BACKWARD (pos = body_start + length), re-scanning header
            # bytes. Treat it like the unparseable case: empty body,
            # forward scan resumes after the header.
            logging.getLogger(__name__).warning(
                "parse_warc_bytes: negative content-length %d at byte "
                "offset %d (record_id=%s) — treating as 0",
                length,
                start,
                fields.get("warc-record-id"),
            )
            length = 0
        body_start = hdr_end + sep_len
        if body_start + length > n:
            # truncated final record (cut-off upload/download): the slice
            # would silently yield a PARTIAL body — drop the incomplete
            # record instead, the tar-style tolerant-tail convention
            # (round 10 review). Round 11 (ADVICE r10): the drop is logged
            # with the record offset/id so truncation is observable in
            # BOTH on_corrupt modes — a mid-file corrupt Content-Length
            # otherwise silently swallowed the rest of the file's records.
            logging.getLogger(__name__).warning(
                "parse_warc_bytes: dropping truncated record at byte "
                "offset %d (record_id=%s, declared content-length %d, "
                "%d bytes remain) and the stream tail after it",
                start,
                fields.get("warc-record-id"),
                length,
                n - body_start,
            )
            return
        body = data[body_start : body_start + length]
        yield {
            "warc_type": fields.get("warc-type"),
            "record_id": fields.get("warc-record-id"),
            "target_uri": fields.get("warc-target-uri"),
            "warc_date": fields.get("warc-date"),
            "content_type": fields.get("content-type"),
            "content_length": length,
            "body": body,
        }
        pos = body_start + length


def split_http_payload(body: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an ``application/http`` record body into (status, content-type,
    entity body). Non-HTTP payloads come back as (None, None, body)."""
    if not body.startswith(b"HTTP/"):
        return None, None, body
    # EARLIEST terminator wins (r13 audit, same rule as parse_warc_bytes):
    # trying \r\n\r\n first split bare-\n-header records at the first
    # \r\n\r\n INSIDE the entity body — wrong rest, and a body
    # "content-type:" line could override the real header's.
    crlf = body.find(b"\r\n\r\n")
    lf = body.find(b"\n\n")
    if crlf < 0 and lf < 0:
        return None, None, body
    if crlf >= 0 and (lf < 0 or crlf < lf):
        idx, sep_len = crlf, 4
    else:
        idx, sep_len = lf, 2
    head = body[:idx].decode("utf-8", "replace")
    rest = body[idx + sep_len :]
    lines = head.splitlines()
    status = None
    ctype = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            if k.strip().lower() == "content-type":
                ctype = v.strip()
    return status, ctype, rest


def _explode_records(batches, on_corrupt: str = "error"):
    """mapInPandas transform: (path, content) file rows → WARC_SCHEMA record
    rows (shared by the batch and streaming readers).

    ``on_corrupt`` (round 10 review): a corrupt container (bad gzip member,
    undecodable framing) raises with the FILE PATH attached
    (``'error'``, default — one opaque zlib.error used to abort the job
    with no clue which of 100k crawl files was bad), or skips the file and
    keeps the job alive (``'skip'`` — the crawl-ingest production setting,
    where a handful of corrupt segments per 100 TB is normal)."""
    import logging

    import pandas as pd

    for pdf in batches:
        rows = []
        for path, blob in zip(pdf["path"], pdf["content"]):
            try:
                records = list(parse_warc_bytes(bytes(blob)))
            except Exception as exc:
                if on_corrupt == "skip":
                    logging.getLogger(__name__).warning(
                        "skipping corrupt WARC file %s (%s: %s)",
                        path, type(exc).__name__, exc,
                    )
                    continue
                raise ValueError(
                    f"corrupt WARC file {path!r}: {exc}"
                ) from exc
            for rec in records:
                status, ctype, entity = split_http_payload(rec["body"])
                rows.append(
                    {
                        "warc_type": rec["warc_type"],
                        "record_id": rec["record_id"],
                        "target_uri": rec["target_uri"],
                        "warc_date": rec["warc_date"],
                        "content_type": rec["content_type"],
                        "content_length": rec["content_length"],
                        "http_status": status,
                        "http_content_type": ctype,
                        "body": entity,
                        "source_file": path,
                    }
                )
        if rows:
            yield pd.DataFrame(rows)
        else:
            yield pd.DataFrame(
                {
                    c.split()[0]: pd.Series([], dtype="object")
                    for c in WARC_SCHEMA.split(",")
                }
            )


def read_warc(spark, path_glob: str, *, on_corrupt: str = "error"):
    """Read .warc / .warc.gz files into one DataFrame row per record
    (schema ``WARC_SCHEMA``). One file = one ``binaryFile`` row = one
    parse task; HTTP response records get status/content-type/body split
    out. Filters on warc_type/target_uri prune AFTER the parse — at crawl
    scale, pre-filter by file path (Common Crawl segments sort by date).
    ``on_corrupt='skip'`` logs-and-skips corrupt container files instead
    of failing the job (see :func:`_explode_records`)."""
    if on_corrupt not in ("error", "skip"):
        raise ValueError("on_corrupt must be 'error' or 'skip'")
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )
    return files.mapInPandas(
        lambda it: _explode_records(it, on_corrupt=on_corrupt),
        schema=WARC_SCHEMA,
    )


def read_warc_stream(spark, landing_dir: str, *, on_corrupt: str = "error"):
    """Streaming twin of :func:`read_warc`: a ``binaryFile`` file-stream
    source over a landing directory — each newly landed crawl file becomes
    one micro-batch input (exactly-once via the stream's checkpointed file
    log), exploded through the same parse transform. ``on_corrupt`` as in
    :func:`read_warc` (r13: previously unexposed here, so one corrupt
    landed file killed the continuous ingest with no skip option)."""
    if on_corrupt not in ("error", "skip"):
        raise ValueError("on_corrupt must be 'error' or 'skip'")
    files = (
        spark.readStream.format("binaryFile")
        # file-stream sources require an explicit schema; binaryFile's is
        # fixed
        .schema(
            "path string, modificationTime timestamp,"
            " length long, content binary"
        )
        .load(landing_dir)
        .select("path", "content")
    )
    return files.mapInPandas(
        lambda it: _explode_records(it, on_corrupt=on_corrupt),
        schema=WARC_SCHEMA,
    )
