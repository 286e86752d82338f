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
from quantms_utils_spark.operators.skew import hot_keys, salted_join

__all__ = [
    "asof_lookup",
    "exclusive_prefix_sum",
    "hot_keys",
    "interpolate_at",
    "join_many_to_one",
    "range_join_binned",
    "salted_join",
    "unmatched_keys",
]
