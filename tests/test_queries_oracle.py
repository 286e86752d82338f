"""Oracle-parity harness: runs every registered query on Spark AND its DuckDB
oracle SQL on the same parquet tables, then compares row count, column names,
and (column-name-sorted, row-sorted) values — a local replica of the driver's
CORRECTNESS gate, so mismatches surface before a round ends.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from quantms_utils_spark.queries import REGISTRY
from quantms_utils_spark.tables import TABLE_NAMES

import os

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLE_CASES = sorted(name for name, (_, sql) in REGISTRY.items() if sql is not None)
ROWS_ONLY_CASES = sorted(name for name, (_, sql) in REGISTRY.items() if sql is None)


def _duckdb_con():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(value):
    if value is None:
        return ("\0null",)
    if isinstance(value, float):
        if math.isnan(value):
            return ("\0nan",)
        # collapse -0.0 / 0.0 and format to kill representation noise
        if value == 0:
            value = 0.0
        return ("f", f"{value:.9g}")
    if isinstance(value, bool):
        return ("b", value)
    return ("v", str(value))


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon_rows = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return sorted_cols, canon_rows


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    con = _duckdb_con()
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    s_cols, s_rows = _normalize(spark_cols, spark_rows)
    d_cols, d_rows = _normalize(duck_cols, duck_rows)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_query_runs(spark, name):
    fn, _ = REGISTRY[name]
    sdf = fn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0
