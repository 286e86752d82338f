"""psmconvert: idXML identifications × MS2 peak table → 21-column PSM table.

Spark-first reimplementation of quantmsutils/psm/psm_conversion.py:59-201.
The reference's nested per-row loop (for each peptide_id → per-row pandas
scan filter → for each hit) becomes:

    identifications (nested)                  [sources/idxml.py]
      → scan regex extraction (F2) + skip-on-miss filter
      → explode(hits) (U4)
      → decoy filter (P4), score selection (F13), mods_position (F3)
      ⟕ ms2_info on (run, scan)               [J4 — a real equi-join, not the
                                               reference's O(n·m) per-row scan]
      → 21-column projection

The join key includes the run stem so multi-run corpora co-partition; at
100 TB both sides bucket by run and the join is shuffle-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from quantms_utils_spark.functions import mods_position

PSM_COLUMNS = [
    "sequence",
    "protein_accessions",
    "protein_start_positions",
    "protein_end_positions",
    "modifications",
    "retention_time",
    "charge",
    "exp_mass_to_charge",
    "reference_file_name",
    "scan_number",
    "peptidoform",
    "posterior_error_probability",
    "global_qvalue",
    "is_decoy",
    "consensus_support",
    "mz_array",
    "intensity_array",
    "num_peaks",
    "search_engines",
    "id_scores",
    "hit_rank",
]


def convert_psms(
    identifications: DataFrame,
    ms2_info: DataFrame | None = None,
    export_decoy_psm: bool = False,
) -> DataFrame:
    """Explode identifications into the reference's 21-column PSM table."""
    scan = F.regexp_extract(F.col("spectrum_reference"), r"(?:spectrum|scan)=(\d+)", 1)
    ids = identifications.withColumn("scan_number", F.nullif(scan, F.lit("")))
    # skip-with-warning on unextractable scans (reference :123-129);
    # try_cast so a pathological digit run becomes a null (dropped) rather
    # than an ANSI runtime CAST error killing the job.
    ids = ids.withColumn(
        "scan_number", F.col("scan_number").try_cast("int")
    ).filter(F.col("scan_number").isNotNull())

    exploded = ids.select(
        "reference_file_name",
        "retention_time",
        "exp_mass_to_charge",
        "search_engines",
        "score_type",
        "scan_number",
        F.explode("hits").alias("hit"),
    )
    if not export_decoy_psm:
        exploded = exploded.filter(F.col("hit.is_decoy") == 0)

    multi_engine = F.size("search_engines") > 1
    engine = F.element_at("search_engines", 1)
    # per-engine score naming + CV-accession q-value preference (F13,
    # reference :143-158)
    id_scores = F.when(
        multi_engine, F.array().cast("array<string>")
    ).otherwise(
        F.array(
            F.concat(
                F.when(engine == "Comet", F.lit("Comet:Expectation value: "))
                .when(engine == "MS-GF+", F.lit("MS-GF:SpecEValue: "))
                .when(engine == "Sage", F.lit("Sage:hyperscore: "))
                .otherwise(F.concat(engine, F.lit(":score: "))),
                F.col("hit.score").cast("string"),
            )
        )
    )
    # hit.score only stands in for the q-value when the run is multi-engine
    # AND the peptide id's score type actually is a q-value (reference
    # psm_conversion.py:144-146); CV-accession/meta q-values always win.
    global_qvalue = F.coalesce(
        F.col("hit.qvalue_meta"),
        F.when(
            multi_engine & F.col("score_type").contains("q-value"),
            F.col("hit.score"),
        ),
    )

    peptidoform = F.col("hit.peptidoform")
    psms = exploded.select(
        F.regexp_replace(
            F.regexp_replace(peptidoform, r"\([^)]*\)", ""), r"^\.", ""
        ).alias("sequence"),
        F.col("hit.protein_accessions").alias("protein_accessions"),
        F.col("hit.protein_start_positions").alias("protein_start_positions"),
        F.col("hit.protein_end_positions").alias("protein_end_positions"),
        mods_position(peptidoform).alias("modifications"),
        "retention_time",
        F.col("hit.charge").alias("charge"),
        "exp_mass_to_charge",
        "reference_file_name",
        "scan_number",
        peptidoform.alias("peptidoform"),
        F.col("hit.posterior_error_probability").alias(
            "posterior_error_probability"
        ),
        global_qvalue.alias("global_qvalue"),
        F.col("hit.is_decoy").alias("is_decoy"),
        F.when(multi_engine, F.col("hit.consensus_support")).alias(
            "consensus_support"
        ),
        "search_engines",
        id_scores.alias("id_scores"),
        F.col("hit.hit_rank").alias("hit_rank"),
    )

    if ms2_info is not None:
        peaks = ms2_info.select(
            F.col("reference_file_name"),
            # _scan_from_native_id falls back to the raw nativeID string when
            # no scan=/spectrum= token exists; try_cast turns that into a null
            # join miss (reference behavior: string compare never matches)
            # instead of an ANSI CAST error.
            F.col("scan").try_cast("int").alias("scan_number"),
            "mz_array",
            "intensity_array",
        )
        psms = psms.join(peaks, ["reference_file_name", "scan_number"], "left")
        psms = psms.withColumn("num_peaks", F.size("mz_array"))
    else:
        psms = (
            psms.withColumn("mz_array", F.lit(None).cast("array<double>"))
            .withColumn("intensity_array", F.lit(None).cast("array<double>"))
            .withColumn("num_peaks", F.lit(None).cast("int"))
        )
    return psms.select(*PSM_COLUMNS)
