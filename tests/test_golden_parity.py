"""Native-format numeric parity against committed golden parquet.

Mirrors the reference's static-golden pattern
(/root/reference/tests/test_commands.py:167-185, where a pre-built
ms2_info parquet committed to the repo gates psmconvert): the goldens under
tests/fixtures/golden/ were produced ONCE by tools/make_goldens.py from the
committed mzML/idXML fixture bytes, and every test run re-parses those same
bytes and asserts column-level equality. Any drift in XML parsing, binary
decoding (zlib AND numpress), rt-unit conversion, precursor-purity math, or
the PSM spectrum join shows up as a golden mismatch — no pyopenms needed at
test time.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from quantms_utils_spark.pipelines.mzml_stats import (
    compute_ms2_info,
    compute_ms_info,
)
from quantms_utils_spark.pipelines.psm import convert_psms
from quantms_utils_spark.sources.idxml import read_identifications
from quantms_utils_spark.sources.mzml import read_spectra

FIXTURES = Path(__file__).parent / "fixtures"
GOLDEN = FIXTURES / "golden"


def canon(pdf: pd.DataFrame, sort_cols: list[str]) -> pd.DataFrame:
    pdf = pdf.sort_values(sort_cols).reset_index(drop=True)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: list(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return pdf


def assert_frames_match(got: pd.DataFrame, want: pd.DataFrame) -> None:
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in want.columns:
        for i in range(len(want)):
            g, w = got[c].iloc[i], want[c].iloc[i]
            if isinstance(w, list):
                assert g == pytest.approx(w, rel=1e-9, abs=1e-12), (c, i)
            elif pd.isna(w):
                assert pd.isna(g), (c, i)
            elif isinstance(w, float):
                assert g == pytest.approx(w, rel=1e-9, abs=1e-12), (c, i)
            else:
                assert g == w, (c, i)


@pytest.fixture(scope="module")
def golden_env(spark):
    spectra = read_spectra(spark, [str(FIXTURES / "tiny.mzML")], parser="xml")
    ids = read_identifications(
        spark, [str(FIXTURES / "tiny.idXML")], parser="xml"
    )
    return spectra, ids


def test_ms_info_matches_golden(spark, golden_env):
    spectra, _ = golden_env
    got = canon(compute_ms_info(spectra).toPandas(), ["scan"])
    want = canon(pd.read_parquet(GOLDEN / "ms_info.parquet"), ["scan"])
    assert_frames_match(got, want)


def test_ms2_info_matches_golden(spark, golden_env):
    spectra, _ = golden_env
    got = canon(compute_ms2_info(spectra).toPandas(), ["scan"])
    want = canon(pd.read_parquet(GOLDEN / "ms2_info.parquet"), ["scan"])
    assert_frames_match(got, want)


def test_psm_matches_golden(spark, golden_env):
    spectra, ids = golden_env
    got = canon(
        convert_psms(ids, compute_ms2_info(spectra)).toPandas(),
        ["scan_number", "sequence"],
    )
    want = canon(pd.read_parquet(GOLDEN / "psm.parquet"), ["scan_number", "sequence"])
    assert_frames_match(got, want)


def test_rich_ms_info_matches_golden(spark):
    """24-spectrum zlib fixture: purity ratios, empty arrays, MS2 with no
    prior MS1, missing charge/intensity — all pinned byte-for-byte."""
    spectra = read_spectra(spark, [str(FIXTURES / "rich.mzML")], parser="xml")
    got = canon(compute_ms_info(spectra).toPandas(), ["scan"])
    want = canon(pd.read_parquet(GOLDEN / "rich_ms_info.parquet"), ["scan"])
    assert_frames_match(got, want)
    # sanity: the fixture genuinely exercises the interesting branches
    assert (want["precursor_purity"].dropna() > 0).any()
    assert want["num_peaks"].min() == 0
    assert want["precursor_rt"].isna()[want["ms_level"] == 2].any()


def test_rich_numpress_ms_info_matches_golden(spark):
    """Same pipeline over committed numpress-compressed bytes (linear m/z,
    slof intensity) — pins the numpress decoders against a real file."""
    spectra = read_spectra(
        spark, [str(FIXTURES / "rich_numpress.mzML")], parser="xml"
    )
    got = canon(compute_ms_info(spectra).toPandas(), ["scan"])
    want = canon(pd.read_parquet(GOLDEN / "rich_numpress_ms_info.parquet"), ["scan"])
    assert_frames_match(got, want)
