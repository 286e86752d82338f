"""checksamplesheet: SDRF / experimental-design validation.

Spark-first reimplementation of quantmsutils/sdrf/check_samplesheet.py. The
minimal mode (reference :64-99) checks pipeline-required columns
case-insensitively; full-schema OLS ontology validation depends on the
sdrf-pipelines package, which is environment-gated.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

logger = logging.getLogger(__name__)

MINIMAL_REQUIRED_COLUMNS = (
    "source name",
    "assay name",
    "comment[data file]",
    "comment[label]",
    "comment[cleavage agent details]",
    "comment[instrument]",
    "comment[proteomics data acquisition method]",
    "technology type",
)

MINIMAL_RECOMMENDED_COLUMNS = (
    "comment[precursor mass tolerance]",
    "comment[fragment mass tolerance]",
    "comment[dissociation method]",
    "comment[technical replicate]",
    "comment[fraction identifier]",
)

try:  # pragma: no cover - environment-dependent
    from sdrf_pipelines.sdrf.sdrf import read_sdrf  # noqa: F401

    HAVE_SDRF_PIPELINES = True
except Exception:  # pragma: no cover
    HAVE_SDRF_PIPELINES = False


def check_samplesheet(
    spark: SparkSession,
    path: str,
    template: str = "ms-proteomics",
    minimal: bool = True,
    use_ols_cache_only: bool = False,
) -> list[str]:
    """Validate an SDRF sample sheet; returns a list of error strings
    (empty = valid). Mirrors the reference's messages exactly — its tests
    assert on them."""
    if not minimal:
        if not HAVE_SDRF_PIPELINES:  # pragma: no cover
            raise NotImplementedError(
                "Full SDRF schema validation requires the sdrf-pipelines "
                "package (OLS ontology checks); run with minimal=True here."
            )
        df = read_sdrf(path)  # pragma: no cover
        return df.validate_sdrf(
            template=template, use_ols_cache_only=use_ols_cache_only
        )  # pragma: no cover
    return _validate_minimal(spark, path)


def _validate_minimal(spark: SparkSession, path: str) -> list[str]:
    df = spark.read.csv(path, sep="\t", header=True, inferSchema=False)
    columns_lower = [c.lower() for c in df.columns]
    errors: list[str] = []

    if df.limit(1).count() == 0:
        errors.append("ERROR: SDRF file contains a header but no data rows.")
        return errors

    for col in MINIMAL_REQUIRED_COLUMNS:
        if col not in columns_lower:
            errors.append(
                f"ERROR: Required column '{col}' is missing from the SDRF file."
            )

    if not any(
        c.startswith("comment[modification parameters") for c in columns_lower
    ):
        errors.append(
            "ERROR: At least one 'comment[modification parameters]' column is required."
        )

    for col in MINIMAL_RECOMMENDED_COLUMNS:
        if col not in columns_lower:
            logger.warning(
                "Recommended column '%s' is missing. Pipeline will use default "
                "parameters.",
                col,
            )
    return errors
