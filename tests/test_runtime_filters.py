"""Runtime-filtering engine pins — the two Catalyst features that decide
whether a 100 TB fact scan reads 100 TB or the slice a selective dimension
actually needs:

- DYNAMIC PARTITION PRUNING (DPP): a partitioned fact joined to a
  filtered dimension on the partition column must scan only the
  partitions the dimension's filter survives — the partition filter is a
  runtime subquery, visible as ``dynamicpruning`` in the scan's
  PartitionFilters.
- BLOOM runtime filters: for a shuffle join with a selective creation
  side, Spark injects a ``bloom_filter_agg`` on the small side and a
  ``might_contain`` probe onto the big side's scan, dropping
  non-qualifying rows BEFORE the shuffle.

Both are pinned behaviorally (correct rows) AND structurally (the plan
contains the runtime filter), so a conf regression that silently turns
them off fails the build. Thresholds are test-tuned: the defaults key off
multi-GB scan sizes that a fixture can't reach.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def parted_fact(spark, tmp_path):
    path = str(tmp_path / "fact")
    (
        spark.range(0, 10_000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("part_key"),
            (F.col("id") * 3 % 100).alias("v"),
        )
        .write.partitionBy("part_key")
        .mode("overwrite")
        .parquet(path)
    )
    return path


def test_dynamic_partition_pruning_in_plan_and_rows(spark, parted_fact):
    fact = spark.read.parquet(parted_fact)
    dim = (
        spark.range(0, 7)
        .select(F.col("id").alias("d_key"), (F.col("id") % 2 == 0).alias("keep"))
    )
    joined = fact.join(dim, fact.part_key == dim.d_key).filter("keep")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:2000]
    # behavior: only even part_keys (0,2,4,6) survive
    got = {r["part_key"] for r in joined.select("part_key").distinct().collect()}
    assert got == {0, 2, 4, 6}
    n = joined.count()
    want = spark.read.parquet(parted_fact).filter(
        F.col("part_key").isin(0, 2, 4, 6)
    ).count()
    assert n == want


def test_bloom_runtime_filter_injected_on_shuffle_join(spark, tmp_path):
    big_p = str(tmp_path / "big")
    small_p = str(tmp_path / "small")
    spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("v")
    ).write.mode("overwrite").parquet(big_p)
    spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("tag")
    ).write.mode("overwrite").parquet(small_p)

    confs = {
        # force a shuffle join (no broadcast) so the bloom filter has a
        # shuffle to save, and drop the size gates to fixture scale
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.read.parquet(big_p)
        small = spark.read.parquet(small_p).filter(F.col("tag") == 3)
        joined = big.join(small, "k")
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan or "bloom_filter" in plan, plan[:2000]
        # behavior: join result matches the filter-free computation
        assert joined.count() == 5_000 // 13 + (1 if 3 < 5_000 % 13 else 0)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
