"""checksamplesheet: SDRF / experimental-design validation.

Spark-first reimplementation of quantmsutils/sdrf/check_samplesheet.py. The
minimal mode (reference :64-99) checks pipeline-required columns
case-insensitively. Full mode uses the sdrf-pipelines package when
importable (reference :52-56); otherwise it degrades to a NATIVE template
tier implementing the structural rules of the public SDRF-Proteomics
specification (required template columns, column ordering, empty cells,
label whitelist, numeric fraction/replicate, duplicate run definitions) —
everything except live OLS ontology lookups, which need the external
service. All cell-level rules run as ONE Spark aggregate over the sheet, so
the same code validates a 10-row design and a 10-million-row corpus sheet.
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession, functions as F

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


# Template tier: required columns per schema template (public SDRF-Proteomics
# spec). Every template includes the minimal pipeline columns EXCEPT
# comment[proteomics data acquisition method]: that column is a
# quantms-pipeline requirement enforced by MINIMAL mode (the reference's
# own test drives PXD000001 through --minimal and asserts exactly that
# failure), while the official SDRF-Proteomics template predates it —
# full sdrf-pipelines validation passes legacy sheets without it. The
# full tier logs its absence as a warning instead (round-6 parity fix).
_TEMPLATE_BASE_COLUMNS = tuple(
    c
    for c in MINIMAL_REQUIRED_COLUMNS
    if c != "comment[proteomics data acquisition method]"
)
TEMPLATE_REQUIRED_COLUMNS: dict[str, tuple[str, ...]] = {
    "ms-proteomics": _TEMPLATE_BASE_COLUMNS
    + (
        "characteristics[organism]",
        "characteristics[organism part]",
        "characteristics[disease]",
        "characteristics[cell type]",
        "comment[technical replicate]",
        "comment[fraction identifier]",
    ),
    "dia-acquisition": _TEMPLATE_BASE_COLUMNS
    + (
        "characteristics[organism]",
        "comment[technical replicate]",
        "comment[fraction identifier]",
    ),
}

# comment[label] whitelist (SDRF-Proteomics accepted label values).
VALID_LABELS = frozenset(
    {"label free sample", "unlabeled sample"}
    # TMT 6/10/11-plex channels plus TMTpro 16/18-plex extensions
    | {f"TMT{n}" for n in range(126, 132)}
    | {f"TMT{n}{suffix}" for n in range(127, 135) for suffix in ("N", "C")}
    | {"TMT135N"}
    | {f"iTRAQ{n}" for n in range(113, 122)}
    | {"SILAC light", "SILAC medium", "SILAC heavy"}
)

# placeholder cell values the SDRF spec allows in any column
_PLACEHOLDERS = ("not available", "not applicable")

# --- column-format rules (sdrf-pipelines parity, sans live OLS) -------------
# Ontology-term columns carry structured values like
# ``NT=Trypsin;AC=MS:1001251`` (NT = name, AC = accession, TA/CS/PP/MT/TS =
# scheme-specific keys). Structural checks: a cell containing '=' must parse
# as a ';'-separated KEY=value list, must name the term (NT=), and an AC=
# value must be accession-shaped (PREFIX:LOCALID, e.g. MS:1001251,
# UNIMOD:4, NCIT:C16358). Free-text cells (no '=') need the OLS service to
# validate and pass the structural tier.
ONTOLOGY_TERM_COLUMNS = (
    "comment[cleavage agent details]",
    "comment[instrument]",
    "comment[dissociation method]",
    "comment[proteomics data acquisition method]",
)
ONTOLOGY_TERM_PREFIXES = ("comment[modification parameters",)

_TERM_LIST_RE = r"^[A-Za-z]{1,3}=[^;=]*(\s*;\s*[A-Za-z]{1,3}=[^;=]*)*;?\s*$"
_NT_PRESENT_RE = r"(?i)(^|;)\s*NT="
_AC_PRESENT_RE = r"(?i)(^|;)\s*AC="
_AC_EXTRACT_RE = r"(?i)(?:^|;)\s*AC=\s*([^;]*)"
_NT_EXTRACT_RE = r"(?i)(?:^|;)\s*NT=\s*([^;]*)"
_AC_VALUE_RE = r"^[A-Za-z][A-Za-z0-9_]*:[A-Za-z0-9:_.-]+\s*$"

# controlled vocabularies (SDRF-Proteomics spec)
TECHNOLOGY_TYPES = frozenset(
    {
        "proteomic profiling by mass spectrometry",
        "metabolomic profiling by mass spectrometry",
    }
)
ACQUISITION_METHODS = frozenset(
    {
        "data-dependent acquisition",
        "data-independent acquisition",
    }
)


def check_samplesheet(
    spark: SparkSession,
    path: str,
    template: str = "ms-proteomics",
    minimal: bool = True,
    use_ols_cache_only: bool = False,
) -> list[str]:
    """Validate an SDRF sample sheet; returns a list of error strings
    (empty = valid). Minimal-mode messages mirror the reference exactly —
    its tests assert on them."""
    if not minimal:
        if HAVE_SDRF_PIPELINES:  # pragma: no cover - needs sdrf-pipelines
            df = read_sdrf(path)
            return df.validate_sdrf(
                template=template, use_ols_cache_only=use_ols_cache_only
            )
        logger.warning(
            "sdrf-pipelines is not importable: falling back to the native "
            "template tier (structural + value checks%s).",
            "; cached-ontology accession tier active"
            if use_ols_cache_only
            else "; OLS ontology lookups skipped",
        )
        return _validate_template(
            spark, path, template, use_ols_cache_only=use_ols_cache_only
        )
    return _validate_minimal(spark, path)


def _validate_template(
    spark: SparkSession,
    path: str,
    template: str,
    *,
    use_ols_cache_only: bool = False,
) -> list[str]:
    """Native full-template tier: structural SDRF-Proteomics rules.

    Header rules run driver-side (a header is tiny); every cell-level rule is
    folded into ONE Spark aggregate so the sheet is scanned exactly once no
    matter how many rules apply.

    ``use_ols_cache_only`` mirrors the reference knob
    (/root/reference/quantmsutils/sdrf/check_samplesheet.py:52-56): when
    set, ``AC=`` accessions whose ontology prefix is covered by the
    embedded public snapshot (``pipelines.ols_cache`` — PSI-MS, Unimod)
    must EXIST in that snapshot; accessions under uncached prefixes (EFO,
    NCBITaxon, …) are structurally checked only — a subset cache must
    never claim a term it cannot see is invalid.
    """
    if template not in TEMPLATE_REQUIRED_COLUMNS:
        return [
            f"ERROR: Unknown template '{template}'. Known templates: "
            + ", ".join(sorted(TEMPLATE_REQUIRED_COLUMNS))
        ]

    errors = _validate_minimal(spark, path)
    if errors and errors[0].endswith("no data rows."):
        return errors
    # the acquisition-method column is a quantms MINIMAL-mode requirement,
    # not an SDRF-Proteomics template one (see _TEMPLATE_BASE_COLUMNS note):
    # the full tier accepts legacy sheets without it (warning logged below)
    errors = [
        e
        for e in errors
        if "'comment[proteomics data acquisition method]' is missing" not in e
    ]

    df = spark.read.csv(path, sep="\t", header=True, inferSchema=False)
    cols = df.columns
    lower = [c.lower() for c in cols]

    for col in TEMPLATE_REQUIRED_COLUMNS[template]:
        if col not in lower and not any(
            c.startswith(col) for c in lower
        ):
            msg = f"ERROR: Required column '{col}' is missing from the SDRF file."
            if msg not in errors:
                errors.append(msg)
    if "comment[proteomics data acquisition method]" not in lower:
        logger.warning(
            "Column 'comment[proteomics data acquisition method]' is absent "
            "(legacy SDRF): accepted by the full template, required by the "
            "quantms pipeline's minimal check."
        )

    # --- header ordering (SDRF spec: source name, characteristics...,
    # assay name, comment..., factor value... last) -------------------------
    if lower and lower[0] != "source name":
        errors.append("ERROR: 'source name' must be the first SDRF column.")
    if "assay name" in lower:
        assay_at = lower.index("assay name")
        late_char = [
            cols[i]
            for i in range(assay_at + 1, len(lower))
            if lower[i].startswith("characteristics[")
        ]
        if late_char:
            errors.append(
                "ERROR: characteristics columns must appear before 'assay "
                f"name': {late_char}"
            )
        early_comment = [
            cols[i] for i in range(assay_at) if lower[i].startswith("comment[")
        ]
        if early_comment:
            errors.append(
                "ERROR: comment columns must appear after 'assay name': "
                f"{early_comment}"
            )
    factor_positions = [
        i for i, c in enumerate(lower) if c.startswith("factor value[")
    ]
    if factor_positions and factor_positions[-1] != len(lower) - 1:
        errors.append("ERROR: factor value columns must be the last SDRF columns.")
    non_factor_after = [
        cols[i]
        for i in range(min(factor_positions), len(lower))
        if not lower[i].startswith("factor value[")
    ] if factor_positions else []
    if non_factor_after:
        errors.append(
            f"ERROR: non-factor columns after factor value columns: {non_factor_after}"
        )

    # --- cell-level rules: one aggregate pass ------------------------------
    def _col(name: str):
        for c in cols:
            if c.lower() == name:
                return F.col(f"`{c}`")
        return None

    aggs: list = []
    agg_err: list[str] = []

    present_required = [
        name for name in TEMPLATE_REQUIRED_COLUMNS[template] if _col(name) is not None
    ]
    for name in present_required:
        c = _col(name)
        empty = F.sum(
            (c.isNull() | (F.trim(c) == "")).cast("long")
        )
        aggs.append(empty.alias(f"empty_{len(aggs)}"))
        agg_err.append(
            f"ERROR: Column '{name}' contains {{n}} empty cell(s); use "
            "'not available' / 'not applicable' instead."
        )

    label = _col("comment[label]")
    if label is not None:
        bad = F.sum(
            (
                ~F.lower(label).isin(
                    *[v.lower() for v in VALID_LABELS | set(_PLACEHOLDERS)]
                )
            ).cast("long")
        )
        aggs.append(bad.alias(f"label_{len(aggs)}"))
        agg_err.append(
            "ERROR: comment[label] contains {n} value(s) outside the SDRF "
            "label vocabulary (TMT/iTRAQ/SILAC channels or 'label free sample')."
        )

    for name in ("comment[fraction identifier]", "comment[technical replicate]"):
        c = _col(name)
        if c is not None:
            nonpos = F.sum(
                (
                    c.try_cast("int").isNull() | (c.try_cast("int") < 1)
                ).cast("long")
            )
            aggs.append(nonpos.alias(f"num_{len(aggs)}"))
            agg_err.append(
                f"ERROR: Column '{name}' must contain positive integers "
                "({n} invalid value(s))."
            )

    # --- ontology-term column format (NT=...;AC=... syntax) ----------------
    term_cols = [
        orig
        for orig in cols
        if orig.lower() in ONTOLOGY_TERM_COLUMNS
        or any(orig.lower().startswith(p) for p in ONTOLOGY_TERM_PREFIXES)
    ]
    for orig in term_cols:
        cell = F.trim(F.col(f"`{orig}`"))
        filled = cell.isNotNull() & (cell != "") & (
            ~F.lower(cell).isin(*_PLACEHOLDERS)
        )
        structured = filled & cell.contains("=")
        aggs.append(
            F.sum((structured & ~cell.rlike(_TERM_LIST_RE)).cast("long")).alias(
                f"syn_{len(aggs)}"
            )
        )
        agg_err.append(
            f"ERROR: Column '{orig.lower()}' contains {{n}} cell(s) that are "
            "not a valid 'KEY=value;KEY=value' ontology-term list."
        )
        aggs.append(
            F.sum(
                (structured & ~cell.rlike(_NT_PRESENT_RE)).cast("long")
            ).alias(f"nt_{len(aggs)}")
        )
        agg_err.append(
            f"ERROR: Column '{orig.lower()}' contains {{n}} structured "
            "cell(s) without the required NT= (term name) key."
        )
        ac_value = F.regexp_extract(cell, _AC_EXTRACT_RE, 1)
        aggs.append(
            F.sum(
                (
                    structured
                    & cell.rlike(_AC_PRESENT_RE)
                    & ~ac_value.rlike(_AC_VALUE_RE)
                ).cast("long")
            ).alias(f"ac_{len(aggs)}")
        )
        agg_err.append(
            f"ERROR: Column '{orig.lower()}' contains {{n}} AC= value(s) "
            "that are not ontology accessions (expected PREFIX:ID, e.g. "
            "MS:1001251, UNIMOD:4)."
        )
        if use_ols_cache_only:
            from quantms_utils_spark.pipelines import ols_cache

            acc_norm = F.upper(F.trim(ac_value))
            prefix = F.upper(F.split(F.trim(ac_value), ":").getItem(0))
            aggs.append(
                F.sum(
                    (
                        structured
                        & cell.rlike(_AC_PRESENT_RE)
                        & ac_value.rlike(_AC_VALUE_RE)
                        & prefix.isin(*ols_cache.CACHED_PREFIXES)
                        & ~acc_norm.isin(*ols_cache.CACHED_TERMS)
                    ).cast("long")
                ).alias(f"ols_{len(aggs)}")
            )
            agg_err.append(
                f"ERROR: Column '{orig.lower()}' contains {{n}} AC= "
                "accession(s) not found in the cached ontology subset "
                "(use_ols_cache_only)."
            )
            # NT=/AC= CONSISTENCY for every accession the cache knows
            # (full tier AND partial tier — e.g. NCBITaxon model
            # organisms): the declared term name must match the
            # ontology's canonical name for that accession, the check
            # sdrf-pipelines' OLS client performs online. Unknown
            # accessions under partial prefixes stay unvalidatable —
            # absence from a subset proves nothing.
            # accepted set per accession = canonical name + any
            # ecosystem-accepted alias (e.g. NT=Trypsin for MS:1001313 in
            # the public PXD000001 sheet — sdrf-pipelines' name-keyed
            # lookup accepts it); encoded as a joined map value so the
            # membership test stays one map lookup + array_contains. The
            # separator is the ASCII unit separator (impossible in OBO
            # names, unlike '|' which appears in some OBO synonyms —
            # ADVICE r6); the guard below makes the assumption loud.
            accepted = ols_cache.accepted_name_sets()
            sep = "\x1f"
            if any(sep in n for names in accepted.values() for n in names):
                raise ValueError(
                    "ontology name contains the reserved \\x1f separator; "
                    "accepted_name_sets() encoding is no longer unambiguous"
                )
            canon_map = F.create_map(
                *[
                    F.lit(x)
                    for acc, names in accepted.items()
                    for x in (acc, sep.join(sorted(names)))
                ]
            )
            nt_value = F.regexp_extract(cell, _NT_EXTRACT_RE, 1)
            canon = F.try_element_at(canon_map, acc_norm)
            aggs.append(
                F.sum(
                    (
                        structured
                        & canon.isNotNull()
                        & (F.trim(nt_value) != "")
                        & ~F.array_contains(
                            F.split(canon, sep),
                            F.lower(F.trim(nt_value)),
                        )
                    ).cast("long")
                ).alias(f"olsnt_{len(aggs)}")
            )
            agg_err.append(
                f"ERROR: Column '{orig.lower()}' contains {{n}} NT= term "
                "name(s) that do not match the cached canonical name for "
                "their AC= accession (use_ols_cache_only)."
            )

    # --- controlled vocabularies -------------------------------------------
    tech = _col("technology type")
    if tech is not None:
        cell = F.lower(F.trim(tech))
        bad = F.sum(
            (
                cell.isNotNull()
                & (cell != "")
                & ~cell.isin(*(TECHNOLOGY_TYPES | set(_PLACEHOLDERS)))
            ).cast("long")
        )
        aggs.append(bad.alias(f"tech_{len(aggs)}"))
        agg_err.append(
            "ERROR: 'technology type' contains {n} value(s) outside the SDRF "
            "vocabulary (e.g. 'proteomic profiling by mass spectrometry')."
        )

    acq = _col("comment[proteomics data acquisition method]")
    if acq is not None:
        cell = F.trim(acq)
        # the method name: NT= value when structured, the cell itself when
        # free text
        name_val = F.lower(
            F.trim(
                F.when(
                    cell.rlike(_NT_PRESENT_RE),
                    F.regexp_extract(cell, r"(?i)(?:^|;)\s*NT=\s*([^;]*)", 1),
                ).otherwise(cell)
            )
        )
        bad = F.sum(
            (
                cell.isNotNull()
                & (cell != "")
                & ~name_val.isin(*(ACQUISITION_METHODS | set(_PLACEHOLDERS)))
            ).cast("long")
        )
        aggs.append(bad.alias(f"acq_{len(aggs)}"))
        agg_err.append(
            "ERROR: comment[proteomics data acquisition method] contains {n} "
            "method(s) outside the SDRF vocabulary (data-dependent / "
            "data-independent acquisition)."
        )

    if aggs:
        counts = df.agg(*aggs).first()
        for n_bad, msg in zip(counts, agg_err):
            if n_bad and n_bad > 0:
                errors.append(msg.format(n=n_bad))

    # duplicate run definitions: the same raw file must not map to the same
    # (fraction, label, technical replicate) twice
    run_cols = [
        _col(n)
        for n in (
            "comment[data file]",
            "comment[fraction identifier]",
            "comment[label]",
            "comment[technical replicate]",
        )
    ]
    if all(c is not None for c in run_cols):
        dups = (
            df.groupBy(*run_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .count()
        )
        if dups:
            errors.append(
                "ERROR: Duplicate run definition: the same (data file, "
                "fraction, label, technical replicate) combination appears "
                "more than once."
            )
    return errors


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
