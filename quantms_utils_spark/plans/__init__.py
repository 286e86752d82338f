from quantms_utils_spark.plans.inspect import (
    explain_str,
    physical_plan,
    plan_has,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "explain_str",
    "physical_plan",
    "plan_has",
    "pushed_filters",
    "read_schema_columns",
]
