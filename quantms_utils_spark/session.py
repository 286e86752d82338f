"""SparkSession factory with scale-oriented defaults.

The reference engine is single-threaded (quantmsutils/mzml/mzml_statistics.py:399-400
has no parallelism at all); here every default is chosen for a multi-executor
cluster reading cloud storage:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting, and
  dynamic broadcast-join demotion/promotion replace hand-tuned partition counts.
- Arrow on: every pandas_udf / mapInPandas boundary is Arrow-batched, never
  row-at-a-time pickling.
- shuffle.partitions default scales with parallelism but AQE coalesces down,
  so over-provisioning is cheap.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "quantms-utils-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard configs.

    When an active session already exists (e.g. the driver harness created
    one), the builder returns it; configs below then act as no-ops, which is
    the desired behavior for embedding in a host application.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Cloud-storage parquet scans: bigger read units, vectorized reader.
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        # Let Python DataSources (sources/mzml_datasource.py) receive pushed
        # filters via pushFilters().
        "spark.sql.python.filterPushdown.enabled": "true",
        # Dimension tables in this domain (designs, Unimod, enzyme maps) are
        # tiny; keep auto-broadcast generous.
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.sql.session.timeZone": "UTC",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
