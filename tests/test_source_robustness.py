"""Source-robustness engine pins: schema evolution and corrupt-record
handling — the two ingestion behaviors a long-lived 100 TB lake hits
constantly (columns get added over months of producers; a crawler emits
malformed JSON lines) and that silently change semantics if a default
flips between Spark versions.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """mergeSchema=true unions the schemas of old and new files; the old
    files' missing column reads as NULL, not an error — additive
    evolution needs no rewrite. Without the option the scan keys off one
    footer (whichever file is touched first), so the pin also documents
    WHY the option matters."""
    path = str(tmp_path / "evolving")
    spark.range(0, 5).select(F.col("id"), F.lit("old").alias("src")).write.parquet(
        path + "/batch=1"
    )
    spark.range(5, 10).select(
        F.col("id"), F.lit("new").alias("src"), (F.col("id") * 2).alias("extra")
    ).write.parquet(path + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "src", "extra", "batch"}
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert all(rows[i] is None for i in range(5))
    assert all(rows[i] == 2 * i for i in range(5, 10))


def test_json_corrupt_records_permissive_and_dropmalformed(spark, tmp_path):
    """PERMISSIVE mode lands malformed lines in _corrupt_record with all
    data columns NULL (nothing is silently dropped); DROPMALFORMED
    drops them. A crawler pipeline picks one knowingly — the pin keeps
    both contracts explicit."""
    p = tmp_path / "lines.json"
    p.write_text(
        "\n".join(
            [
                json.dumps({"a": 1, "b": "x"}),
                "{not valid json",
                json.dumps({"a": 2, "b": "y"}),
                '{"a": "three", "b": 3}',  # type-mismatched but valid JSON
            ]
        )
    )
    schema = "a INT, b STRING, _corrupt_record STRING"
    perm = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = perm.collect()
    assert len(rows) == 4
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    # the syntactically-broken line is corrupt; the type-mismatched line
    # keeps its parseable fields (b="3") and nulls the bad one
    assert any("not valid" in r["_corrupt_record"] for r in bad)
    good = {r["a"] for r in rows if r["a"] is not None}
    assert good == {1, 2}

    dropped = (
        spark.read.schema("a INT, b STRING")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert dropped.count() < 4
    assert {r["a"] for r in dropped.collect() if r["a"] is not None} == {1, 2}


def test_readers_reject_empty_path_list(spark):
    """Round-10 (review): an empty run list raises a caller-bug ValueError
    instead of repartition(0)'s cryptic engine error."""
    import pytest

    from quantms_utils_spark.sources.idxml import read_identifications
    from quantms_utils_spark.sources.mzml import read_spectra

    with pytest.raises(ValueError, match="non-empty"):
        read_spectra(spark, [])
    with pytest.raises(ValueError, match="non-empty"):
        read_identifications(spark, [])


def test_mzml_iterparse_drops_processed_husks(tmp_path):
    """Round-10 (review): the streaming mzML parser clears processed
    spectra out of the spectrumList child list — the retained-husk count
    must not grow with spectrum count (memory bounded by ONE spectrum)."""
    import numpy as np
    import pandas as pd

    from quantms_utils_spark.sources.mzml_xml import parse_mzml_xml, write_mzml

    n = 400
    spectra = pd.DataFrame(
        {
            "reference_file_name": ["run"] * n,
            "spectrum_index": range(n),
            "scan": [str(1000 + i) for i in range(n)],
            "ms_level": [1 if i % 4 == 0 else 2 for i in range(n)],
            "rt": [float(i) for i in range(n)],
            "mz_array": [np.linspace(100, 200, 5).tolist()] * n,
            "intensity_array": [np.linspace(1, 9, 5).tolist()] * n,
            "precursor_charge": [None] * n,
            "precursor_mz": [None] * n,
            "precursor_intensity": [None] * n,
            "acquisition_datetime": [None] * n,
        }
    )
    path = str(tmp_path / "run.mzML")
    write_mzml(path, spectra)

    # spy on spectrumList growth via the module's own iterparse path
    import xml.etree.ElementTree as ET

    from quantms_utils_spark.sources import mzml_xml as M

    max_children = 0
    orig_iterparse = ET.iterparse

    def spy_iterparse(fh, events=()):
        nonlocal max_children
        slist = [None]
        for event, elem in orig_iterparse(fh, events=events):
            if event == "start" and M._local(elem.tag) == "spectrumList":
                slist[0] = elem
            if slist[0] is not None:
                max_children = max(max_children, len(slist[0]))
            yield event, elem

    M.iterparse = spy_iterparse
    try:
        out = M.parse_mzml_xml(path)
    finally:
        M.iterparse = orig_iterparse
    assert len(out) == n
    # iterparse builds a ~16 KB read-buffer of elements ahead of the event
    # drain, so the bound is per-chunk, NOT 1 — but it must not scale with
    # the run: before the fix every processed husk stayed in the child
    # list and this reached n (400); with it, the lookahead stays ~a dozen.
    assert max_children < 50
