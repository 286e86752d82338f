"""quantms-utils-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of bigbio/quantms-utils, rebuilt Spark-first.

The reference (/root/reference, v0.0.25) is a single-process pandas/pyarrow
ETL package for mass-spectrometry proteomics. This package re-expresses its
operator surface (SURVEY.md §2) as Catalyst-optimizable DataFrame plans
designed for 100 TB cloud-storage scale, and adds large-scale training-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis).
"""

__version__ = "0.1.0"
