from quantms_utils_spark.sources.design import read_experimental_design
from quantms_utils_spark.sources.mzml_datasource import (
    MzmlDataSource,
    register_mzml_source,
)
from quantms_utils_spark.sources.report import read_diann_report

__all__ = [
    "MzmlDataSource",
    "read_experimental_design",
    "read_diann_report",
    "register_mzml_source",
]
