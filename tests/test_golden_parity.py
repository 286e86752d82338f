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


PYOPENMS_GOLDEN = GOLDEN / "pyopenms"


@pytest.mark.skipif(
    not PYOPENMS_GOLDEN.exists(),
    reason=(
        "producer goldens absent: run tools/make_pyopenms_goldens.py in a "
        "pyopenms-capable environment and commit "
        "tests/fixtures/golden/pyopenms/ to activate engine-vs-OpenMS "
        "numeric parity"
    ),
)
class TestPyopenmsParity:
    """Engine vs OpenMS C++ numeric parity, auto-activated the moment the
    producer-generated goldens land (tools/make_pyopenms_goldens.py).
    Compares per-spectrum parse results by file order (spectrum_index is
    file order in both producers), not by engine-side re-derivation."""

    @pytest.mark.parametrize(
        "stem", ["tiny", "rich", "rich_numpress"]
    )
    def test_spectra_match_openms(self, stem):
        from quantms_utils_spark.sources.mzml_xml import parse_mzml_xml

        want = pd.read_parquet(PYOPENMS_GOLDEN / f"{stem}_spectra.parquet")
        got = parse_mzml_xml(str(FIXTURES / f"{stem}.mzML"))
        got = got.sort_values("spectrum_index").reset_index(drop=True)
        want = want.sort_values("spectrum_index").reset_index(drop=True)
        assert len(got) == len(want)
        for i in range(len(want)):
            g, w = got.iloc[i], want.iloc[i]
            assert int(g["ms_level"]) == int(w["ms_level"]), i
            assert g["rt"] == pytest.approx(w["rt"], rel=1e-9), i
            assert len(g["mz_array"]) == int(w["num_peaks"]), i
            assert list(g["mz_array"]) == pytest.approx(
                list(w["mz_array"]), rel=1e-7
            ), i
            assert list(g["intensity_array"]) == pytest.approx(
                list(w["intensity_array"]), rel=1e-5
            ), i
            # engine extracts the scan number; OpenMS keeps the native id
            assert str(g["scan"]) in str(w["scan"]), i
            for col, rel in (
                ("precursor_mz", 1e-9),
                ("precursor_intensity", 1e-5),
            ):
                if pd.isna(w[col]):
                    assert pd.isna(g[col]), (col, i)
                else:
                    assert g[col] == pytest.approx(w[col], rel=rel), (col, i)

    def test_psms_match_openms(self):
        from quantms_utils_spark.sources.idxml import _parse_xml_idxml

        want = pd.read_parquet(PYOPENMS_GOLDEN / "tiny_psms.parquet")
        got = _parse_xml_idxml(str(FIXTURES / "tiny.idXML"))
        assert len(got) > 0 and len(want) > 0
        # compare the comparable surface: sequence/charge/score sets
        # (engine hits are nested per spectrum; flatten first)
        gset = {
            (h["peptidoform"], int(h["charge"]), round(float(h["score"]), 9))
            for _, r in got.iterrows()
            for h in r["hits"]
        }
        wset = {
            (r["sequence"], int(r["charge"]), round(float(r["score"]), 9))
            for _, r in want.iterrows()
        }
        assert gset == wset
