"""Round-10 skew rehearsals (VERDICT r9 item 4): measured adversarial-scale
evidence for the two round-9 scale fixes that had unit tests but no
committed measurement.

(a) inverted_postings max_df whale guard — a corpus where one term appears
    in EVERY document. Without the guard, the df window funnels O(corpus)
    postings through one task's buffer; with it, whale terms are stripped
    by a salted pre-pass before the window. We measure wall time and the
    maximum rows any single window partition ingests (== max per-term
    posting count entering the window — the task-skew driver).

(b) streaming CDC O(changes) state — a polling source re-delivering the
    FULL snapshot every epoch with only a few changed rows. Round 9 made
    the state delta per epoch proportional to the CHANGES; we replay 10
    epochs and record the state rows written per epoch.

Usage: python tools/skew_rehearsal_r10.py  → one JSON line on stdout
(also written to tools/SKEW_REHEARSAL_r10.json).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, Window, functions as F

N_DOCS = 200_000
MAX_DF = 100
CDC_KEYS = 50_000
CDC_CHANGES = 100
CDC_EPOCHS = 10


def rehearse_inverted(spark) -> dict:
    from quantms_utils_spark.operators.retrieval import inverted_postings

    # every doc contains the stopword 'the' + 2 unique tokens
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the unique"),
            F.col("id").cast("string"),
            F.lit(" token"),
            F.col("id").cast("string"),
        ).alias("text"),
    ).localCheckpoint()  # isolate generation cost from the measurement

    def max_window_partition_rows(tf):
        # rows per term entering the window == the window partition size
        return (
            tf.groupBy("term").count().agg(F.max("count")).collect()[0][0]
        )

    # guarded (round-9 production shape)
    t0 = time.perf_counter()
    guarded = inverted_postings(docs, max_df=MAX_DF)
    n_guarded = guarded.count()
    t_guarded = round(time.perf_counter() - t0, 3)

    # unguarded twin: the pre-round-9 shape — whale term reaches the window
    from quantms_utils_spark.operators.text import normalized_tokens

    toks = docs.select(
        "doc_id",
        F.posexplode(normalized_tokens(F.col("text"))).alias("__pos", "term"),
    )
    tf = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"), (F.min("__pos") + 1).alias("first_pos")
    )
    t0 = time.perf_counter()
    w = Window.partitionBy("term")
    unguarded = (
        tf.withColumn("df", F.count(F.lit(1)).over(w))
        .filter((F.col("df") >= 1) & (F.col("df") <= MAX_DF))
    )
    n_unguarded = unguarded.count()
    t_unguarded = round(time.perf_counter() - t0, 3)

    # the skew driver: max rows one window partition ingests
    guarded_tf = tf.join(
        F.broadcast(
            tf.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > MAX_DF).select("term")
        ),
        "term",
        "left_anti",
    )
    return {
        "n_docs": N_DOCS,
        "max_df": MAX_DF,
        "rows_out_guarded": n_guarded,
        "rows_out_unguarded": n_unguarded,
        "results_equal": n_guarded == n_unguarded,
        "wall_s_guarded": t_guarded,
        "wall_s_unguarded": t_unguarded,
        "max_window_partition_rows_unguarded": max_window_partition_rows(tf),
        "max_window_partition_rows_guarded": max_window_partition_rows(
            guarded_tf
        ),
    }


def rehearse_cdc(spark) -> dict:
    from quantms_utils_spark.streaming.diff import diff_and_apply

    tmp = tempfile.mkdtemp(prefix="cdc_rehearsal_")
    state_dir, out_dir = f"{tmp}/state", f"{tmp}/out"
    per_epoch = []
    try:
        for epoch in range(CDC_EPOCHS):
            # full snapshot re-delivered; CDC_CHANGES rows differ per epoch
            snap = spark.range(CDC_KEYS).select(
                F.col("id").alias("k"),
                F.when(
                    F.col("id") < CDC_CHANGES * epoch + CDC_CHANGES,
                    F.concat(F.lit(f"v{epoch}:"), F.col("id").cast("string")),
                ).otherwise(F.concat(F.lit("v0:"), F.col("id").cast("string")))
                .alias("payload"),
            )
            t0 = time.perf_counter()
            diff_and_apply(
                snap, epoch, keys=["k"], state_dir=state_dir, out_dir=out_dir
            )
            wall = round(time.perf_counter() - t0, 3)
            state_rows = spark.read.parquet(
                f"{state_dir}/epoch={epoch}"
            ).count()
            per_epoch.append({"epoch": epoch, "state_rows": state_rows,
                              "wall_s": wall})
        total_state = spark.read.parquet(f"{state_dir}/epoch=*").count()
        return {
            "keys": CDC_KEYS,
            "changes_per_epoch": CDC_CHANGES,
            "epochs": CDC_EPOCHS,
            "per_epoch": per_epoch,
            "total_state_rows": total_state,
            "o_keys_would_be": CDC_KEYS * CDC_EPOCHS,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    result = {
        "round": 10,
        "inverted_postings_whale": rehearse_inverted(spark),
        "cdc_state_redelivery": rehearse_cdc(spark),
    }
    line = json.dumps(result)
    Path("tools/SKEW_REHEARSAL_r10.json").write_text(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
