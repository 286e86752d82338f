"""DIA-NN report source (SURVEY §2.1 S4/S5/S7): TSV or parquet by suffix,
explicit column projection, q-value predicate.

Reference: quantmsutils/diann/diann2msstats.py:243-264. The reference
hand-rolls column projection (``usecols``/``columns=``); in Spark the
``select`` + ``filter`` below reach the scan via Catalyst (ReadSchema shows
only the projected columns; the Q.Value range predicate lands in
PushedFilters and prunes parquet row groups at 100 TB).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

REPORT_BASE_COLUMNS = (
    "Run",
    "Protein.Names",
    "Modified.Sequence",
    "Precursor.Charge",
    "Precursor.Quantity",
    "Q.Value",
)
REPORT_OPTIONAL_COLUMNS = ("Decoy", "Channel")


def read_diann_report(
    spark: SparkSession, path: str, qvalue_threshold: float = 0.01
) -> DataFrame:
    suffix = Path(path).suffix
    if suffix == ".parquet":
        raw = spark.read.parquet(path)
        optional = [c for c in REPORT_OPTIONAL_COLUMNS if c in raw.columns]
    else:
        raw = spark.read.csv(path, sep="\t", header=True, inferSchema=True)
        # TSV branch keeps only Decoy among optionals (reference :259-261).
        optional = [c for c in ("Decoy",) if c in raw.columns]
    cols = [F.col(f"`{c}`") for c in (*REPORT_BASE_COLUMNS, *optional)]
    return raw.select(*cols).filter(F.col("`Q.Value`") < F.lit(qvalue_threshold))
