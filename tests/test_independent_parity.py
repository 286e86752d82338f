"""Producer-independent numeric parity for the mzML → ms_info pipeline.

The reference proves numeric behavior by committing PRODUCER-generated
fixtures (/root/reference/tests/test_commands.py:167-185: a pyopenms-built
ms2_info parquet gates psmconvert). That exact pattern is blocked here
twice over: pyopenms is not installed, and the reference snapshot's large
fixture blobs (.MISSING_LARGE_BLOBS) are absent. tests/test_golden_parity.py
therefore pins regressions against goldens this engine produced itself —
which cannot catch a bug both the golden and the engine share.

This module breaks that circularity with a SECOND, INDEPENDENT
implementation written directly from the mzML 1.1 spec inside the test:
a full-DOM ElementTree parse (the engine streams with iterparse), manual
base64 + zlib + struct little-endian float decode (the engine goes through
numpy frombuffer), its own rt-unit conversion, scan-id digit extraction,
as-of prior-MS1 tracking via a plain Python loop (the engine uses a window
function), and the PrecursorPurity window/isotope math re-derived from the
documented contract (isolation ±0.7, 100 ppm, 3 isotopes, charge→1
default; reference mzml_statistics.py:264-268). The two implementations
share no code; agreement on the committed fixture bytes is evidence about
the FORMAT SEMANTICS, not about one implementation's quirks.
"""

from __future__ import annotations

import base64
import struct
import xml.etree.ElementTree as ET
import zlib
from pathlib import Path

import pytest

FIXTURES = Path(__file__).parent / "fixtures"

NS = "{http://psi.hupo.org/ms/mzml}"


def _cv_map(elem):
    out = {}
    for cv in elem.findall(f"{NS}cvParam"):
        out[cv.get("accession")] = (cv.get("value"), cv.get("unitAccession"))
    return out


def _decode_array(bda):
    cvs = _cv_map(bda)
    raw = base64.b64decode(bda.find(f"{NS}binary").text.strip())
    if "MS:1000574" in cvs:  # zlib
        raw = zlib.decompress(raw)
    if "MS:1000523" in cvs:  # 64-bit float
        vals = struct.unpack("<" + "d" * (len(raw) // 8), raw)
    elif "MS:1000521" in cvs:  # 32-bit float
        vals = struct.unpack("<" + "f" * (len(raw) // 4), raw)
    else:
        raise AssertionError("unknown precision")
    kind = "mz" if "MS:1000514" in cvs else (
        "intensity" if "MS:1000515" in cvs else "?"
    )
    return kind, list(vals)


def _scan_of(native_id: str) -> str:
    for part in native_id.split():
        for key in ("scan=", "spectrum="):
            if part.startswith(key):
                return part[len(key):]
    return native_id


def independent_parse(path: Path):
    """Spec-derived reimplementation: list of per-spectrum dicts."""
    root = ET.fromstring(path.read_bytes())
    run = root.find(f"{NS}run") if root.find(f"{NS}run") is not None else root
    spectra = []
    for spec in run.iter(f"{NS}spectrum"):
        cvs = _cv_map(spec)
        ms_level = int(cvs["MS:1000511"][0])
        scan_elem = spec.find(f"{NS}scanList/{NS}scan")
        rt = None
        if scan_elem is not None:
            scvs = _cv_map(scan_elem)
            if "MS:1000016" in scvs:
                v, unit = scvs["MS:1000016"]
                rt = float(v) * (60.0 if unit == "UO:0000031" else 1.0)
        arrays = {}
        for bda in spec.iter(f"{NS}binaryDataArray"):
            kind, vals = _decode_array(bda)
            arrays[kind] = vals
        prec_mz = prec_charge = prec_int = None
        ion = spec.find(
            f"{NS}precursorList/{NS}precursor/{NS}selectedIonList/{NS}selectedIon"
        )
        if ion is not None:
            icvs = _cv_map(ion)
            if "MS:1000744" in icvs:
                prec_mz = float(icvs["MS:1000744"][0])
            if "MS:1000041" in icvs:
                prec_charge = int(icvs["MS:1000041"][0])
            if "MS:1000042" in icvs:
                prec_int = float(icvs["MS:1000042"][0])
        spectra.append(
            {
                "scan": _scan_of(spec.get("id")),
                "index": int(spec.get("index")),
                "ms_level": ms_level,
                "mz": arrays.get("mz", []),
                "intensity": arrays.get("intensity", []),
                "rt": rt,
                "prec_mz": prec_mz,
                "prec_charge": prec_charge,
                "prec_int": prec_int,
            }
        )
    spectra.sort(key=lambda s: s["index"])
    return spectra


def independent_ms_info(spectra):
    """Per-spectrum stats + purity, plain Python (no numpy, no Spark)."""
    rows = []
    prev_ms1 = None
    for s in spectra:
        if s["ms_level"] not in (1, 2):
            continue
        n = len(s["mz"])
        base = max(s["intensity"]) if n else None
        summed = 0.0
        for v in s["intensity"]:
            summed += v
        row = {
            "scan": s["scan"],
            "ms_level": s["ms_level"],
            "num_peaks": n,
            "base_peak_intensity": base,
            "summed_peak_intensities": summed if n else None,
            "rt": s["rt"],
            "precursor_charge": None,
            "precursor_mz": None,
            "precursor_rt": None,
            "precursor_purity": None,
        }
        if s["ms_level"] == 1:
            prev_ms1 = s
        elif s["ms_level"] == 2:
            row["precursor_charge"] = s["prec_charge"]
            row["precursor_mz"] = s["prec_mz"]
            if prev_ms1 is not None and s["prec_mz"] is not None:
                row["precursor_rt"] = prev_ms1["rt"]
                pmz = s["prec_mz"]
                charge = s["prec_charge"] or 1
                tol = pmz * 100e-6
                iso = 1.003355 / charge
                total = target = 0.0
                for m, i in zip(prev_ms1["mz"], prev_ms1["intensity"]):
                    if pmz - 0.7 <= m <= pmz + 0.7:
                        total += i
                        if any(
                            abs(m - (pmz + k * iso)) <= tol for k in range(4)
                        ):
                            target += i
                row["precursor_purity"] = (
                    target / total if total > 0 else None
                )
        rows.append(row)
    return rows


@pytest.mark.parametrize("fixture", ["tiny.mzML", "rich.mzML"])
def test_engine_matches_independent_implementation(spark, fixture):
    from quantms_utils_spark.pipelines.mzml_stats import compute_ms_info
    from quantms_utils_spark.sources.mzml import read_spectra

    path = FIXTURES / fixture
    want = independent_ms_info(independent_parse(path))

    got_df = (
        compute_ms_info(read_spectra(spark, [str(path)], parser="xml"))
        .orderBy("spectrum_index")
        .toPandas()
    )
    assert len(got_df) == len(want)
    for i, w in enumerate(want):
        g = got_df.iloc[i]
        assert g["scan"] == w["scan"], i
        assert int(g["ms_level"]) == w["ms_level"]
        assert int(g["num_peaks"]) == w["num_peaks"]
        for col in (
            "base_peak_intensity",
            "summed_peak_intensities",
            "rt",
            "precursor_mz",
            "precursor_rt",
            "precursor_purity",
        ):
            if w[col] is None:
                assert g[col] is None or g[col] != g[col], (i, col)
            else:
                assert g[col] == pytest.approx(w[col], rel=1e-12), (i, col)
        if w["precursor_charge"] is None:
            assert g["precursor_charge"] is None or g[
                "precursor_charge"
            ] != g["precursor_charge"], i
        else:
            assert int(g["precursor_charge"]) == w["precursor_charge"]


@pytest.mark.parametrize("fixture", ["tiny.mzML", "rich.mzML"])
def test_independent_arrays_match_engine_arrays(spark, fixture):
    """Raw decoded peak arrays agree element-for-element — pins the binary
    layer (base64, zlib, little-endian doubles) with zero shared code."""
    from quantms_utils_spark.sources.mzml import read_spectra

    path = FIXTURES / fixture
    want = {s["scan"]: s for s in independent_parse(path)}
    got = (
        read_spectra(spark, [str(path)], parser="xml")
        .select("scan", "mz_array", "intensity_array")
        .toPandas()
    )
    assert len(got) == len(want)
    for _, g in got.iterrows():
        w = want[g["scan"]]
        assert list(g["mz_array"]) == pytest.approx(w["mz"], rel=1e-15)
        assert list(g["intensity_array"]) == pytest.approx(
            w["intensity"], rel=1e-15
        )
