"""Generate the committed golden parquet fixtures for native-format parity.

Mirrors the reference's static-golden pattern
(/root/reference/tests/test_commands.py:167-185: a pre-built ms2_info
parquet pinned in the repo gates psmconvert): we run the XML backend over
the tiny mzML/idXML fixtures ONCE, canonicalize, and commit the outputs.
`tests/test_golden_parity.py` then recomputes them on every run and asserts
column-level equality — any drift in parsing, purity math, or the PSM join
breaks the build.

Regenerate (only when an intentional semantic change is made):
    python tools/make_goldens.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FIXTURES = REPO / "tests" / "fixtures"
GOLDEN = FIXTURES / "golden"


def canonicalize(pdf, sort_cols):
    """Deterministic row/column order; array cells to lists (parquet
    round-trips them as numpy arrays)."""
    import numpy as np

    pdf = pdf.sort_values(sort_cols).reset_index(drop=True)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: list(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return pdf


def build_rich_run(run: str):
    """A deterministic 24-spectrum run with the parser's edge cases: MS2
    before any MS1 (null precursor_rt), missing precursor charge (isotope
    spacing defaults to z=1), missing precursor intensity, an empty peak
    array, and interleaved MS1/MS2 cycles with peaks inside and outside the
    isolation window (non-trivial purity ratios)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(42)
    rows = []
    for i in range(24):
        if i == 0:
            level, prec = 2, (400.2, 2, 1500.0)  # MS2 with no prior MS1
        elif i % 3 == 0:
            level, prec = 1, None
        else:
            base = 300.0 + 50.0 * (i % 7)
            charge = None if i % 5 == 0 else (2 if i % 2 else 3)
            inten = None if i % 7 == 0 else float(rng.uniform(1e3, 1e5))
            level, prec = 2, (base + rng.uniform(-0.2, 0.2), charge, inten)
        if i == 9:
            mz, it = [], []  # empty MS1 spectrum
        else:
            n = int(rng.randint(30, 80))
            mz = np.sort(rng.uniform(150.0, 1200.0, n))
            if level == 1 and i + 1 < 24 and prec is None:
                # plant peaks near the NEXT spectrum's likely window so
                # purity sees both target and contaminant intensity
                mz = np.sort(
                    np.concatenate([mz, 300.0 + 50.0 * ((i + 1) % 7)
                                    + np.array([-0.3, 0.0, 0.5, 1.003355])])
                )
            it = rng.uniform(10.0, 1e4, len(mz))
        rows.append({
            "reference_file_name": run,
            "spectrum_index": i,
            "scan": str(100 + i),
            "ms_level": level,
            "rt": 3.0 * i + 0.25,
            "mz_array": list(map(float, mz)),
            "intensity_array": list(map(float, it)),
            "precursor_charge": prec[1] if prec else None,
            "precursor_mz": prec[0] if prec else None,
            "precursor_intensity": prec[2] if prec else None,
            "acquisition_datetime": "2024-06-01T08:00:00Z",
        })
    return pd.DataFrame(rows)


def main() -> None:
    from pyspark.sql import SparkSession

    from quantms_utils_spark.pipelines.mzml_stats import (
        compute_ms2_info,
        compute_ms_info,
    )
    from quantms_utils_spark.pipelines.psm import convert_psms
    from quantms_utils_spark.sources.idxml import read_identifications
    from quantms_utils_spark.sources.mzml import read_spectra
    from quantms_utils_spark.sources.mzml_xml import write_mzml

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("make-goldens")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    GOLDEN.mkdir(parents=True, exist_ok=True)

    # write the rich fixtures only if absent: once committed, their BYTES
    # are the contract (the parity test parses the committed files, never
    # regenerates them)
    rich = FIXTURES / "rich.mzML"
    rich_np = FIXTURES / "rich_numpress.mzML"
    if not rich.exists():
        write_mzml(str(rich), build_rich_run("rich"), compress=True, dtype="f8",
                   start_time_stamp="2024-06-01T08:00:00Z")
        print(f"wrote fixture {rich}")
    if not rich_np.exists():
        write_mzml(str(rich_np), build_rich_run("rich_numpress"),
                   compress=False, dtype="f8",
                   numpress_mz="linear", numpress_intensity="slof",
                   start_time_stamp="2024-06-01T08:00:00Z")
        print(f"wrote fixture {rich_np}")

    spectra = read_spectra(spark, [str(FIXTURES / "tiny.mzML")], parser="xml")
    ids = read_identifications(
        spark, [str(FIXTURES / "tiny.idXML")], parser="xml"
    )

    ms_info = canonicalize(compute_ms_info(spectra).toPandas(), ["scan"])
    ms2_info = canonicalize(compute_ms2_info(spectra).toPandas(), ["scan"])
    psm = canonicalize(
        convert_psms(ids, compute_ms2_info(spectra)).toPandas(),
        ["scan_number", "sequence"],
    )
    rich_spectra = read_spectra(spark, [str(rich)], parser="xml")
    rich_ms_info = canonicalize(compute_ms_info(rich_spectra).toPandas(), ["scan"])
    np_spectra = read_spectra(spark, [str(rich_np)], parser="xml")
    np_ms_info = canonicalize(compute_ms_info(np_spectra).toPandas(), ["scan"])

    for name, pdf in (
        ("ms_info", ms_info),
        ("ms2_info", ms2_info),
        ("psm", psm),
        ("rich_ms_info", rich_ms_info),
        ("rich_numpress_ms_info", np_ms_info),
    ):
        out = GOLDEN / f"{name}.parquet"
        pdf.to_parquet(out, index=False)
        print(f"wrote {out} rows={len(pdf)} cols={list(pdf.columns)}")

    spark.stop()


if __name__ == "__main__":
    main()
