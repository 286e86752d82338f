from quantms_utils_spark.sources.design import read_experimental_design
from quantms_utils_spark.sources.report import read_diann_report

__all__ = ["read_experimental_design", "read_diann_report"]
