"""Registry-wide hygiene pins — schema-only (no query execution), so the
whole 200-query surface is audited in seconds.

1. No DECIMAL or FLOAT output columns anywhere: the round-3 correctness
   reds (`snapshot_merge_apply`, `weighted_median_price`) were exactly
   this — raw Spark Decimal vs DuckDB float64 render differently under a
   CSV-hash canonicalizer even when values are identical. House rule:
   round while DECIMAL, then cast to DOUBLE, on BOTH engine and oracle
   sides.
2. `_FRONT` stays consistent with the registry: every front name exists,
   no duplicates (a stale rename here silently reorders the driver's
   sample).
"""

from __future__ import annotations

from pyspark.sql.types import DecimalType, FloatType

from quantms_utils_spark.queries import _FRONT, REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_no_decimal_or_float_output_columns(spark):
    offenders = {}
    for name, (fn, _) in REGISTRY.items():
        df = fn(spark, SF_DIR)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (DecimalType, FloatType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "queries returning DECIMAL/FLOAT columns (cast to DOUBLE after a "
        f"decimal-side round — see module docstring): {offenders}"
    )


def test_front_order_names_are_registered_and_unique():
    assert len(_FRONT) == len(set(_FRONT)), "duplicate names in _FRONT"
    missing = [n for n in _FRONT if n not in REGISTRY]
    assert not missing, f"_FRONT references unregistered queries: {missing}"
