"""Local clone of the driver's correctness check.

Runs every registry query at sf0.01 against its DuckDB oracle and reports
rows/schema/hash match plus wall-clock per query, so we can reproduce the
driver's CORRECTNESS_r{N}.json locally (including its rows-only canonicalizer
quirks, e.g. list-valued columns crashing pandas sort).
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os
SF_DIR = os.environ.get("DRIVER_CLONE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def _hash(pdf: pd.DataFrame) -> str:
    # round floats for tolerance, then hash the CSV repr
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def main() -> None:
    only = set(sys.argv[1:])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-clone")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    from quantms_utils_spark.queries import REGISTRY

    out: dict[str, dict] = {}
    t_total = time.time()
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        row: dict = dict.fromkeys(
            ("rows_match", "schema_match", "hash_match", "spark_rows", "oracle_rows", "err")
        )
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spdf = _canon(sdf.toPandas())
            row["spark_rows"] = len(spdf)
            if sql is None:
                row["err"] = "no_oracle"
            else:
                odf = _canon(con.execute(sql).fetchdf())
                row["oracle_rows"] = len(odf)
                row["rows_match"] = len(spdf) == len(odf)
                row["schema_match"] = list(spdf.columns) == list(odf.columns)
                row["hash_match"] = _hash(spdf) == _hash(odf)
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"[:300]
        row["sec"] = round(time.time() - t0, 2)
        out[name] = row
        ok = row["hash_match"]
        flag = "OK " if ok else ("--- " if row["err"] == "no_oracle" else "FAIL")
        print(f"{flag} {name:32s} {row['sec']:6.2f}s rows={row['spark_rows']} err={row['err'] if not ok else ''}")
        sys.stdout.flush()

    print(f"TOTAL {time.time() - t_total:.1f}s")
    Path(REPO / "tools" / "driver_clone_out.json").write_text(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
