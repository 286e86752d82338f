"""Single-file sinks.

Spark's CSV writer always produces a *directory* of part files; the
reference's MSstats / sample outputs are single CSV **files** at an exact
path (diann2msstats.py:129, extract_sample.py:58) that downstream R tooling
opens directly. ``write_single_csv`` keeps the write distributed-correct
(coalesce(1) still streams through one task, no driver materialization) and
then promotes the lone part file to the target path.

At 100 TB these artifacts stay small — they are end-of-pipeline summary
tables, not data-plane outputs — so a single-file sink is the right contract;
the data-plane sinks (parquet, hive-partitioned) live in the pipelines.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame


def write_single_csv(
    df: DataFrame, target: str | Path, sep: str = ",", header: bool = True
) -> str:
    """Write ``df`` as ONE csv file at exactly ``target`` (not a directory).

    Local-filesystem only (the part-file promotion uses os-level moves):
    URI-scheme targets are rejected loudly — ``Path("s3://bucket/x")``
    collapses the ``//`` and the write would land at a mangled local path
    instead of the object store (round 11 review)."""
    if "://" in str(target):
        raise ValueError(
            f"write_single_csv writes to the LOCAL filesystem only, got "
            f"URI {target!r}; write a parquet/csv directory via df.write "
            "for object-store targets and promote with that store's API"
        )
    target = Path(target)
    tmp = target.with_name(target.name + ".__spark_tmp__")
    df.coalesce(1).write.mode("overwrite").csv(str(tmp), header=header, sep=sep)
    parts = sorted(tmp.glob("part-*"))
    if len(parts) != 1:  # pragma: no cover - coalesce(1) guarantees one part
        raise RuntimeError(f"expected exactly one part file in {tmp}, got {len(parts)}")
    if target.exists():
        if target.is_dir():
            shutil.rmtree(target)
        else:
            target.unlink()
    shutil.move(str(parts[0]), str(target))
    shutil.rmtree(tmp)
    return str(target)


def write_parquet_observed(
    df: DataFrame,
    target: str | Path,
    metrics: dict[str, "object"],
    *,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> dict[str, object]:
    """Parquet sink with IN-FLIGHT data-quality metrics via
    ``DataFrame.observe`` — the named-Observation API that accumulates
    aggregate expressions on the rows as they stream through the writer,
    so row counts / null counts / domain checks cost ZERO extra passes.
    At 100 TB the alternative (write, then re-scan to validate) doubles
    the pipeline's I/O; this is the Spark-native form of the reference's
    post-write assertions.

    ``metrics`` maps metric name → aggregate Column (e.g.
    ``{"rows": F.count(F.lit(1)), "null_ids": F.count_if(F.col("id").isNull())}``).
    Returns the observed values once the write action finishes. Metrics
    must be aggregate expressions (Observation rejects non-aggregates);
    exactly-once semantics hold because a batch write runs the action
    once."""
    from pyspark.sql import Observation

    if not metrics:
        raise ValueError(
            "write_parquet_observed needs at least one metric expression; "
            "use a plain df.write for an unobserved sink"
        )
    obs = Observation("write_metrics")
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    observed.write.mode(mode).option("compression", compression).parquet(
        str(target)
    )
    return dict(obs.get)
