"""Loaders for the synthetic star-schema test tables (TESTDATA.md).

Every query callable in ``__spark_entry__.queries()`` goes through ``load`` so
column pruning / predicate pushdown reach the parquet scan untouched (the scan
is declared lazily; Catalyst prunes through it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read nanos as long and truncate to microseconds
        # (integer div — double division would lose precision at 1e18 ns).
        # DuckDB performs the same ns→µs truncation on read, so both engines
        # see identical instants.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
