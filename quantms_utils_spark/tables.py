"""Loaders for the synthetic star-schema test tables (TESTDATA.md).

Every query callable in ``__spark_entry__.queries()`` goes through ``load`` so
column pruning / predicate pushdown reach the parquet scan untouched (the scan
is declared lazily; Catalyst prunes through it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # Some generations of events.parquet store TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects; with nanosAsLong the column then
        # surfaces as a long of nanoseconds that we truncate to microseconds
        # (integer div — double division would lose precision at 1e18 ns).
        # Newer generations store TIMESTAMP(MICROS) directly, which Spark
        # surfaces as TIMESTAMP_NTZ; normalize to TIMESTAMP_LTZ under the
        # session's UTC zone so downstream numeric treatment (cast to
        # double = epoch seconds) stays legal and matches DuckDB's
        # naive-as-UTC `epoch()`. DuckDB performs the same ns→µs truncation
        # on read, so both engines see identical instants either way.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            df = df.withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
