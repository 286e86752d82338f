"""Source-robustness engine pins: schema evolution and corrupt-record
handling — the two ingestion behaviors a long-lived 100 TB lake hits
constantly (columns get added over months of producers; a crawler emits
malformed JSON lines) and that silently change semantics if a default
flips between Spark versions.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """mergeSchema=true unions the schemas of old and new files; the old
    files' missing column reads as NULL, not an error — additive
    evolution needs no rewrite. Without the option the scan keys off one
    footer (whichever file is touched first), so the pin also documents
    WHY the option matters."""
    path = str(tmp_path / "evolving")
    spark.range(0, 5).select(F.col("id"), F.lit("old").alias("src")).write.parquet(
        path + "/batch=1"
    )
    spark.range(5, 10).select(
        F.col("id"), F.lit("new").alias("src"), (F.col("id") * 2).alias("extra")
    ).write.parquet(path + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "src", "extra", "batch"}
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert all(rows[i] is None for i in range(5))
    assert all(rows[i] == 2 * i for i in range(5, 10))


def test_json_corrupt_records_permissive_and_dropmalformed(spark, tmp_path):
    """PERMISSIVE mode lands malformed lines in _corrupt_record with all
    data columns NULL (nothing is silently dropped); DROPMALFORMED
    drops them. A crawler pipeline picks one knowingly — the pin keeps
    both contracts explicit."""
    p = tmp_path / "lines.json"
    p.write_text(
        "\n".join(
            [
                json.dumps({"a": 1, "b": "x"}),
                "{not valid json",
                json.dumps({"a": 2, "b": "y"}),
                '{"a": "three", "b": 3}',  # type-mismatched but valid JSON
            ]
        )
    )
    schema = "a INT, b STRING, _corrupt_record STRING"
    perm = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = perm.collect()
    assert len(rows) == 4
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    # the syntactically-broken line is corrupt; the type-mismatched line
    # keeps its parseable fields (b="3") and nulls the bad one
    assert any("not valid" in r["_corrupt_record"] for r in bad)
    good = {r["a"] for r in rows if r["a"] is not None}
    assert good == {1, 2}

    dropped = (
        spark.read.schema("a INT, b STRING")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert dropped.count() < 4
    assert {r["a"] for r in dropped.collect() if r["a"] is not None} == {1, 2}
