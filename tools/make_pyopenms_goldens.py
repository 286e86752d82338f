"""Generate PRODUCER-side golden parquet from pyopenms (OpenMS C++) for the
committed fixtures — the missing half of the golden-parity story.

`tools/make_goldens.py` pins THIS engine's outputs (drift detection);
it cannot prove C++ parity because this container has no pyopenms. This
script is the other half: run it in ANY environment where pyopenms
imports (``pip install pyopenms``), and it parses the same committed
fixture bytes (tests/fixtures/{tiny,rich,rich_numpress}.mzML,
tiny.idXML) with the C++ readers and writes canonical parquet under
tests/fixtures/golden/pyopenms/. Commit that directory and
tests/test_golden_parity.py::TestPyopenmsParity activates automatically
(it skips with an explicit reason while the directory is absent), giving
column-level engine-vs-OpenMS numeric parity on every subsequent run —
the reference's own producer-fixture pattern
(/root/reference/tests/test_commands.py:167-185).

Usage (in a pyopenms-capable environment):
    python tools/make_pyopenms_goldens.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURES = REPO / "tests" / "fixtures"
OUT = FIXTURES / "golden" / "pyopenms"


def spectra_frame(path: Path):
    """Per-spectrum frame from pyopenms matching sources/mzml.py column
    contract: scan id, ms_level, rt (seconds), peak arrays, precursor
    fields — the comparable surface of the reference's mzmlstats
    (/root/reference/quantmsutils/mzml/mzml_statistics.py:36-65)."""
    import pandas as pd
    from pyopenms import MSExperiment, MzMLFile

    exp = MSExperiment()
    MzMLFile().load(str(path), exp)
    rows = []
    for i, sp in enumerate(exp.getSpectra()):
        mz, inten = sp.get_peaks()
        prec = sp.getPrecursors()
        p = prec[0] if prec else None
        rows.append(
            {
                "spectrum_index": i,
                "scan": sp.getNativeID(),
                "ms_level": int(sp.getMSLevel()),
                "rt": float(sp.getRT()),  # OpenMS normalizes to seconds
                "num_peaks": int(len(mz)),
                "mz_array": [float(v) for v in mz],
                "intensity_array": [float(v) for v in inten],
                "precursor_mz": float(p.getMZ()) if p else None,
                "precursor_charge": int(p.getCharge()) if p and p.getCharge() else None,
                "precursor_intensity": float(p.getIntensity())
                if p and p.getIntensity()
                else None,
            }
        )
    return pd.DataFrame(rows)


def psm_frame(path: Path):
    """Peptide-hit frame from pyopenms IdXMLFile matching the comparable
    columns of sources/idxml.py (reference:
    /root/reference/quantmsutils/psm/psm_conversion.py:59-194)."""
    import pandas as pd
    from pyopenms import IdXMLFile

    prots, peps = [], []
    IdXMLFile().load(str(path), prots, peps)
    rows = []
    for pep in peps:
        for hit in pep.getHits():
            rows.append(
                {
                    "spectrum_ref": pep.getMetaValue("spectrum_reference"),
                    "sequence": hit.getSequence().toString(),
                    "charge": int(hit.getCharge()),
                    "score": float(hit.getScore()),
                    "rank": int(hit.getRank()),
                    "protein_accessions": sorted(
                        str(ev.getProteinAccession())
                        for ev in hit.getPeptideEvidences()
                    ),
                }
            )
    return pd.DataFrame(rows)


def main() -> None:
    try:
        import pyopenms  # noqa: F401
    except ImportError:
        sys.exit(
            "pyopenms is not importable here. Run this script in an "
            "environment with `pip install pyopenms`, then commit "
            f"{OUT.relative_to(REPO)}/."
        )
    OUT.mkdir(parents=True, exist_ok=True)
    for name in ("tiny.mzML", "rich.mzML", "rich_numpress.mzML"):
        fx = FIXTURES / name
        pdf = spectra_frame(fx).sort_values("spectrum_index").reset_index(drop=True)
        dest = OUT / f"{fx.stem}_spectra.parquet"
        pdf.to_parquet(dest, index=False)
        print(f"wrote {dest} ({len(pdf)} spectra)")
    pdf = psm_frame(FIXTURES / "tiny.idXML")
    pdf = pdf.sort_values(["spectrum_ref", "sequence", "charge"]).reset_index(
        drop=True
    )
    dest = OUT / "tiny_psms.parquet"
    pdf.to_parquet(dest, index=False)
    print(f"wrote {dest} ({len(pdf)} hits)")


if __name__ == "__main__":
    main()
