"""Python UDTFs (PySpark 4 table functions).

SURVEY §2.10 U3/U4 maps the reference's row-multiplying parses (one spectrum
→ rows, one peptide id → hit rows) to ``mapInPandas`` *or a Python UDTF*;
this module provides the UDTF form for the surface where SQL users need a
LATERAL-joinable table function:

    spark.udtf.register("parse_mods", ParseMods)
    SELECT p.*, m.* FROM peptides p, LATERAL parse_mods(p.peptidoform) m

``ParseMods`` explodes a peptidoform string into one row per modification
with the same position arithmetic as ``functions.core.mods_position``
(reference psm_conversion.py:41-56): position = count of residue letters
before the '(', leading '.' stripped, N-term mods at 0.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, mod_name string")
class ParseMods:
    """One output row per ``(modification)`` group; zero rows when
    unmodified (so a plain LATERAL join drops unmodified peptides and
    LATERAL ... OUTER keeps them with NULLs)."""

    def eval(self, peptidoform: str | None):  # noqa: D102
        if not peptidoform:
            return
        stripped = re.sub(r"^\.", "", peptidoform)
        cum = 0
        for m in re.finditer(r"([^()]*)\(([^)]+)\)", stripped):
            cum += len(m.group(1))
            yield cum, m.group(2)


def register_udtfs(spark) -> None:
    spark.udtf.register("parse_mods", ParseMods)
