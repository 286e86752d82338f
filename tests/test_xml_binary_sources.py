"""Spark 4 built-in `xml` and `binaryFile` sources, applied to this
repo's real formats:

- the generic XML scan (rowTag) over the committed idXML fixture must
  agree with the domain parser on what it can see (hit counts,
  sequences, charges) — the escape hatch when a one-off XML format has
  no dedicated source;
- `binaryFile` is the ingestion path for opaque multimodal payloads
  (bytes + path/length metadata arrive as columns, decode happens in
  the Arrow-batched kernels of operators/multimodal.py).
"""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

FIXTURE = Path(__file__).parent / "fixtures" / "tiny.idXML"


def test_generic_xml_scan_agrees_with_domain_parser(spark):
    from quantms_utils_spark.sources.idxml import read_identifications

    hits = (
        spark.read.format("xml")
        .option("rowTag", "PeptideHit")
        .load(str(FIXTURE))
    )
    generic = sorted(
        (r["_sequence"], int(r["_charge"]), float(r["_score"]))
        for r in hits.select("_sequence", "_charge", "_score").collect()
    )
    domain = read_identifications(spark, [str(FIXTURE)], parser="xml")
    parsed = sorted(
        (h["peptidoform"], h["charge"], h["score"])
        for r in domain.collect()
        for h in r["hits"]
    )
    assert len(generic) == len(parsed) > 0
    assert generic == parsed


def test_binaryfile_source_carries_payload_and_metadata(spark):
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.idXML")
        .load(str(FIXTURE.parent))
    )
    rows = df.select("path", "length", "content").collect()
    assert len(rows) == 1
    (r,) = rows
    raw = FIXTURE.read_bytes()
    assert r["length"] == len(raw)
    assert bytes(r["content"]) == raw
    # the payload column feeds the multimodal kernels unchanged: bytes in,
    # typed features out (sniff fails on XML → metadata-only stub row)
    from quantms_utils_spark.operators.multimodal import extract_image_features

    feats = extract_image_features(
        df.select(
            F.monotonically_increasing_id().alias("media_id"),
            F.col("content").alias("payload"),
        ),
        decode_stub=True,
    ).collect()
    assert len(feats) == 1 and feats[0]["width"] is not None
