"""Gold-case unit tests for the scalar expression library (SURVEY §2.8).

mods_position cases mirror the reference's unit suite
(tests/test_commands.py:277-300)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quantms_utils_spark.functions import (
    extract_scan_id,
    file_stem,
    label_code,
    mods_position,
    sanitize_sequence,
)

MODS_GOLD = [
    ("PEPTM(Oxidation)IDE", ["5-Oxidation"]),
    ("PEC(Carbamidomethyl)PTMC(Carbamidomethyl)IDE", ["3-Carbamidomethyl", "7-Carbamidomethyl"]),
    ("PEPTIDE", None),
    (".PEPTM(Oxidation)IDE", ["5-Oxidation"]),
    ("(Acetyl)PEPTIDE", ["0-Acetyl"]),
]


def _eval(spark, col, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(col.alias("out")).collect()]


def test_mods_position_gold_cases(spark):
    results = _eval(spark, mods_position(F.col("v")), [c[0] for c in MODS_GOLD])
    for (inp, expected), got in zip(MODS_GOLD, results):
        assert got == expected, f"{inp}: {got} != {expected}"


def test_extract_scan_id(spark):
    vals = [
        "controllerType=0 controllerNumber=1 scan=43920",
        "spectrum=123",
        "no-match-id",
    ]
    assert _eval(spark, extract_scan_id(F.col("v")), vals) == [
        "43920",
        "123",
        "no-match-id",
    ]


def test_file_stem(spark):
    vals = [
        "https://host/path/BSA1_F1.mzML",
        "dir/run7.d.zip",
        "plain.raw",
        "noext",
    ]
    assert _eval(spark, file_stem(F.col("v")), vals) == [
        "BSA1_F1",
        "run7",
        "plain",
        "noext",
    ]


def test_sanitize_and_label(spark):
    assert _eval(spark, sanitize_sequence(F.col("v")), ["PEP(SILAC)TIDE"]) == ["PEPTIDE"]
    assert _eval(spark, label_code(F.col("v")), [
        "SILAC light", "SILAC medium", "SILAC heavy", "other"
    ]) == ["L", "M", "H", "L"]


def test_normalize_peptidoform_pure_python():
    from quantms_utils_spark.functions.peptidoform import normalize_peptidoform

    # accession -> canonical Unimod title
    assert normalize_peptidoform("PEPC(UniMod:4)TIDE") == "PEPC(Carbamidomethyl)TIDE"
    assert normalize_peptidoform("M(UniMod:35)KVR") == "M(Oxidation)KVR"
    # case-insensitive accession match (DIA-NN emits both spellings)
    assert normalize_peptidoform("M(unimod:35)K") == "M(Oxidation)K"
    # leading group = N-terminal mod -> OpenMS dot notation
    assert normalize_peptidoform("(UniMod:1)MKV") == ".(Acetyl)MKV"
    # multiple mods in one sequence
    assert (
        normalize_peptidoform("(UniMod:737)KC(UniMod:4)M(UniMod:35)R")
        == ".(TMT6plex)KC(Carbamidomethyl)M(Oxidation)R"
    )
    # unknown accession passes through unchanged (best-effort, not lossy)
    assert normalize_peptidoform("PEC(UniMod:99999)K") == "PEC(UniMod:99999)K"
    # unmodified sequences and None are identity
    assert normalize_peptidoform("PEPTIDE") == "PEPTIDE"
    assert normalize_peptidoform(None) is None
    # caret marker held aside and re-attached (reference :78-80 parity)
    assert normalize_peptidoform("^(UniMod:1)MK") == "^.(Acetyl)MK"
    # already-dotted N-term stays single-dotted
    assert normalize_peptidoform(".(UniMod:1)MK") == ".(Acetyl)MK"
