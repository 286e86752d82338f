from quantms_utils_spark.pipelines.diann2msstats import diann_to_msstats
from quantms_utils_spark.pipelines.extract_sample import extract_sample
from quantms_utils_spark.pipelines.check_samplesheet import check_samplesheet

__all__ = ["diann_to_msstats", "extract_sample", "check_samplesheet"]
