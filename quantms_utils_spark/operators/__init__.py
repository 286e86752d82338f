from quantms_utils_spark.operators.windows import (
    asof_lookup,
    exclusive_prefix_sum,
    interpolate_at,
)
from quantms_utils_spark.operators.joins import (
    join_many_to_one,
    range_join_binned,
    unmatched_keys,
)

__all__ = [
    "asof_lookup",
    "exclusive_prefix_sum",
    "interpolate_at",
    "join_many_to_one",
    "range_join_binned",
    "unmatched_keys",
]
