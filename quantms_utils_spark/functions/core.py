"""Scalar expression library (SURVEY §2.8, F1-F13).

Every function here returns a Catalyst ``Column`` built from built-in
``pyspark.sql.functions`` — no Python UDFs — so they stay inside whole-stage
codegen and vectorized execution on the hot path. Reference citations are
file:line into /root/reference.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SCAN_PATTERN = r"(?:spectrum|scan)=(\d+)"


def extract_scan_id(col: Column | str) -> Column:
    """F1/F2 — scan number from a nativeID-style string.

    Reference: quantmsutils/openms.py:4-24 (regex with fallback to the full
    id) and quantmsutils/psm/psm_conversion.py:123-129. ``regexp_extract``
    returns '' on miss, so wrap with ``nullif``-style coalesce back to the
    original string.
    """
    c = F.col(col) if isinstance(col, str) else col
    extracted = F.regexp_extract(c, SCAN_PATTERN, 1)
    return F.coalesce(F.nullif(extracted, F.lit("")), c)


def mods_position(col: Column | str) -> Column:
    """F3 — parse ``"PEC(Carbamidomethyl)PTM..."`` into ``["3-Carbamidomethyl",
    ...]``; NULL when unmodified.

    Reference: quantmsutils/psm/psm_conversion.py:41-56. Position is the count
    of residue letters before the modification's '(' (leading '.' stripped;
    N-term mods get position 0). Gold cases:
    reference tests/test_commands.py:277-300.

    Implemented as a pure Catalyst fold: split on '(', then aggregate over the
    tail keeping a running residue count — no UDF, fully codegen-able.
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"^\.", "")
    parts = F.split(stripped, r"\(")
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - F.lit(1), F.lit(0)))
    init = F.struct(
        F.length(F.element_at(parts, 1)).cast("int").alias("cum"),
        F.array().cast("array<string>").alias("out"),
    )

    def step(acc: Column, p: Column) -> Column:
        residues_after = F.length(F.regexp_replace(p, r"^[^)]*\)", ""))
        mod_name = F.regexp_extract(p, r"^([^)]*)\)", 1)
        entry = F.concat(acc["cum"].cast("string"), F.lit("-"), mod_name)
        return F.struct(
            (acc["cum"] + residues_after).cast("int").alias("cum"),
            F.array_append(acc["out"], entry).alias("out"),
        )

    agg = F.aggregate(tail, init, step, lambda acc: acc["out"])
    return F.when(stripped.rlike(r"\("), agg).otherwise(
        F.lit(None).cast("array<string>")
    )


def sanitize_sequence(col: Column | str) -> Column:
    """F5 — drop the literal ``(SILAC)`` substring.

    Reference: quantmsutils/diann/diann2msstats.py:267-269.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(c, F.lit("(SILAC)"), F.lit(""))


def file_stem(col: Column | str) -> Column:
    """F6 — filename stem with the ``.d.zip`` double-extension special case.

    Reference: quantmsutils/diann/diann2msstats.py:133-138 (``_true_stem``).
    """
    c = F.col(col) if isinstance(col, str) else col
    basename = F.element_at(F.split(c, "/"), -1)
    return F.regexp_replace(basename, r"(\.d\.zip|\.[^.]+)$", "")


def label_code(col: Column | str) -> Column:
    """F7 — SILAC label value mapping light/medium/heavy → L/M/H.

    Reference: quantmsutils/diann/diann2msstats.py:182-199.
    """
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    return (
        F.when(lowered.contains("light"), F.lit("L"))
        .when(lowered.contains("medium"), F.lit("M"))
        .when(lowered.contains("heavy"), F.lit("H"))
        .otherwise(F.lit("L"))
    )


def normalize_ws(col: Column | str) -> Column:
    """Collapse runs of whitespace to single spaces and trim — the
    canonicalization step shared by fingerprinting and dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def let_once(value: Column, body) -> Column:
    """Bind ``value`` to a lambda variable so ``body``'s references evaluate
    it exactly once per row: ``transform(array(value), body)[1]``.

    Catalyst inlines sub-expressions into higher-order-function lambda bodies
    (CollapseProject has no lambda barrier), where they are re-evaluated PER
    ARRAY ELEMENT — and HOFs run interpreted (CodegenFallback), with no
    common-subexpression elimination. A lambda that references an expensive
    expression (a regex split, an array build, an aggregate) therefore goes
    quadratic: the expression is recomputed for every element. Passing it as
    the one-element *argument* array of a ``transform`` forces one evaluation
    per row; the lambda variable is a cheap bound reference thereafter.
    """
    return F.element_at(F.transform(F.array(value), body), 1)
