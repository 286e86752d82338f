"""Data-layout operators: Z-order (Morton) interleaving for multi-dimensional
clustering.

At 100 TB the dominant cost of a selective multi-predicate scan is how the
data is LAID OUT: a table range-partitioned and sorted by a Z-order key over
its hot filter columns gives every parquet file a tight min/max envelope in
ALL of those dimensions at once, so format-level zone maps (and Spark's
partition/row-group pruning) skip most files for predicates on any subset of
the dims — the same idea behind Delta/Iceberg Z-ORDER clustering, built here
from first principles as a pure Catalyst expression.

The key computation is map-only bit arithmetic (shift/and/or per bit — stays
in whole-stage codegen); the one shuffle in ``zorder_layout`` is the range
repartition that physically clusters the data, which is precisely the shuffle
a rewrite job exists to perform.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "zorder_layout", "compact_partitions"]


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of each column.

    Bit ``i`` of dimension ``d`` lands at position ``i * ndims + d``, so the
    key orders points along the Z space-filling curve — ranges of the key are
    small hyper-rectangles in dimension space. Inputs must be non-negative
    integers (normalize/rank-encode first for floats or skewed domains);
    values are masked to ``bits`` bits. Pure bit arithmetic, no UDF.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError("bits * len(cols) must fit in a signed 64-bit key")
    ndims = len(cols)
    terms = []
    for d, c in enumerate(cols):
        masked = c.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(masked, i).bitwiseAND(F.lit(1)),
                    i * ndims + d,
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    n_buckets: int,
    bits: int = 16,
) -> DataFrame:
    """Physically cluster ``df`` along the Z-curve of ``cols``: compute the
    Morton key and range-repartition + sort within partitions by it, so each
    output file covers a tight envelope in every clustered dimension. This is
    the write-side rewrite job; downstream scans get multi-dimensional
    pruning for free from parquet zone maps.
    """
    keyed = df.withColumn("_z", zorder_key([F.col(c) for c in cols], bits))
    return (
        keyed.repartitionByRange(n_buckets, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def compact_partitions(
    df: DataFrame,
    partition_col: str,
    out_dir: str,
    *,
    target_bytes: int,
    size_col: Column | None = None,
) -> DataFrame:
    """Execute the small-files compaction the planner
    (`queries/sketchops.py:compaction_plan`) prices: rewrite ``df`` to
    ``out_dir`` hive-partitioned by ``partition_col`` with each partition
    packed into ``ceil(partition_bytes / target_bytes)`` roughly even
    files — the OPTIMIZE-style maintenance job.

    Distributed shape: one aggregate prices each partition (``size_col``
    defaults to the row's total octet length over string columns — a
    cheap in-row proxy; storage-level accounting would come from the
    table format's file manifest); the tiny plan broadcasts back; every
    row picks a deterministic file slot (``xxhash64 % n_files`` — no RNG,
    stable under repartitioning) and ONE shuffle on (partition, slot)
    co-locates each output file's rows. A slot-hash collision inside a
    task merges two slots into one larger file (never loses rows, never
    splits a slot) — file counts are upper-bounded by the plan, sizes
    approximate the target, which is the industry contract for
    bin-packing OPTIMIZE.

    Returns the plan (partition, n_rows, est_bytes, n_files) so callers
    can audit what was executed.

    NULL partition values are preserved (r13 audit fix): the plan→data
    join is NULL-SAFE, so rows with a NULL ``partition_col`` land in the
    writer's default partition (``__HIVE_DEFAULT_PARTITION__``) instead
    of being silently dropped by a plain equi-join while the returned
    plan still claimed them compacted.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    reserved = {"__slot", "__cp_part", "n_files"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"compact_partitions: input carries reserved column(s) "
            f"{sorted(reserved)} used internally for slot assignment — "
            "rename them first"
        )
    if size_col is None:
        str_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() == "string"
        ]
        size_col = sum(
            (F.coalesce(F.octet_length(F.col(c)), F.lit(0)) for c in str_cols),
            F.lit(8) * len(df.columns),
        )
    plan = (
        df.groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(size_col).cast("long").alias("est_bytes"),
        )
        .select(
            partition_col,
            "n_rows",
            "est_bytes",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("est_bytes") / F.lit(target_bytes)),
            )
            .cast("int")
            .alias("n_files"),
        )
    )
    slot = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.col("n_files")
    ).alias("__slot")
    plan_b = plan.select(
        F.col(partition_col).alias("__cp_part"), "n_files"
    )
    (
        df.join(
            F.broadcast(plan_b),
            F.col(partition_col).eqNullSafe(F.col("__cp_part")),
        )
        .withColumn("__slot", slot)
        .repartition(partition_col, "__slot")
        .drop("n_files", "__slot", "__cp_part")
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(out_dir)
    )
    return plan


def _list_parquet_files(spark, path: str) -> list[str]:
    """Recursive parquet data-file listing, paths only — thin wrapper over
    :func:`_list_parquet_statuses` for callers that need no identity."""
    return [f for f, _, _ in _list_parquet_statuses(spark, path)]


def _glob_escape(path: str) -> str:
    """Backslash-escape Hadoop glob metacharacters in a LITERAL path.
    ``DataFrameReader.load`` glob-interprets its path: a directory whose
    literal name contains ``[`` / ``{`` / ``*`` / ``?`` would silently
    list a DIFFERENT file set (e.g. ``run[12]`` expanding to siblings
    ``run1``/``run2``) — verified on Spark 4.1.2. The Hadoop Path/
    FileSystem APIs used everywhere else here are literal and need no
    escaping."""
    import re

    return re.sub(r"([*?\[\]{}\\])", r"\\\1", path)


def _hidden_below_root(full: str, root: str) -> bool:
    """True when any path segment BELOW the listing root (including the
    leaf file name) starts with ``_`` or ``.``. Deliberately STRICTER
    than the recursive file lookup's own rule, which keeps ``_``-names
    containing ``=``: the pruned reads' full-scan branches go through
    ``spark.read.parquet``, whose partition-inferring index ignores such
    names (verified empirically on Spark 4.1.2 — ``_year=2020/b.parquet``
    and ``_x=1.parquet`` list under ``recursiveFileLookup`` but
    contribute no rows to the parquet scan), and the manifest's domain
    must equal the scan's or a partially-pruned read would return rows a
    full scan never sees. Filtering is RELATIVE to the root (a dataset
    under a hidden ANCESTOR like ~/.local/share/tbl lists normally,
    ADVICE r6), computed on the URI path portion when the full-URI
    prefix misses (ViewFileSystem target resolution, ADVICE r8); when
    neither nests the file we FAIL LOUDLY (mirroring the gateway
    listing's guard, ADVICE r9) — keeping the file would silently
    disable hidden filtering and let the manifest domain include files
    ``spark.read.parquet`` ignores, so a partially-pruned read could
    return rows a full scan never sees."""
    from urllib.parse import urlparse

    prefix = root if root.endswith("/") else root + "/"
    if full.startswith(prefix):
        rel = full[len(prefix):]
    else:
        fp = urlparse(full).path or full
        rp = urlparse(root).path or root
        rp = rp if rp.endswith("/") else rp + "/"
        if not fp.startswith(rp):
            raise RuntimeError(
                f"_hidden_below_root: listed path {full!r} is not under "
                f"the listing root {root!r} (nor its URI path portion) — "
                "qualification mismatch between the listing root and the "
                "scan's file index; cannot apply relative hidden "
                "filtering safely"
            )
        rel = fp[len(rp):]
    return any(seg.startswith(("_", ".")) for seg in rel.split("/") if seg)


def _list_parquet_statuses(spark, path: str) -> list[tuple[str, int, int]]:
    """RECURSIVE parquet data-file listing, returning ``(path, size,
    mtime_ms)`` FILE IDENTITY triples — nested/hive layouts fully covered
    (a top-level-only listing would silently omit nested files and the
    pruned reads would drop their rows, violating the superset contract),
    hidden files/dirs (``_``/``.`` prefixes, e.g. ``_SUCCESS``) excluded
    below the root via :func:`_hidden_below_root` so the manifest domain
    matches what ``spark.read.parquet`` scans.

    Round 9: the listing runs through Spark's OWN file index — a
    ``binaryFile`` scan with ``recursiveFileLookup`` + ``*.parquet`` glob
    (root glob-escaped, :func:`_glob_escape`), reading only
    (path, length, modificationTime), so the content column is pruned
    and no file bytes move. Rationale at 100 TB: the previous shape
    drained a Hadoop ``listFiles`` RemoteIterator through the py4j
    gateway at ~7 driver round trips PER FILE (~6 ms/file measured —
    minutes of pure driver stall at 100k files), while the engine path
    parallelizes discovery across the cluster (driver thread pool below,
    a distributed job above ``parallelPartitionDiscovery.threshold``) and
    only the O(files) status rows collect. Bit-identical to the gateway
    drain (equality pinned in tests, incl. the strict-vs-``=`` hidden
    cases). Paths/sizes/mtimes come from the same ``FileStatus`` Spark's
    scans qualify, so set algebra against scan-derived manifests
    (``_metadata.file_path`` / ``file_size`` /
    ``unix_millis(file_modification_time)``) stays exact — which is what
    lets :func:`manifest_reconcile` detect a delete-and-recreate under
    the SAME name. The gateway drain survives as
    :func:`_list_parquet_statuses_gateway`, the logged fallback for
    stores where the ``binaryFile`` scan itself fails."""
    root_status = _root_file_status(spark, path)
    if root_status.isFile():
        return [_status_triple(root_status)]
    try:
        rows = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .load(_glob_escape(path))
            .select(
                "path",
                "length",
                F.unix_millis("modificationTime").alias("mtime"),
            )
            .collect()
        )
    except Exception as exc:  # pragma: no cover - exotic-store fallback
        import logging

        logging.getLogger(__name__).warning(
            "engine-side listing of %s failed (%s: %s); falling back to "
            "the gateway drain — correct but O(files) driver round trips",
            path, type(exc).__name__, exc,
        )
        return _list_parquet_statuses_gateway(
            spark, path, root_status=root_status
        )
    root = root_status.getPath().toString()
    try:
        return sorted(
            (r["path"], r["length"], r["mtime"])
            for r in rows
            if not _hidden_below_root(r["path"], root)
        )
    except RuntimeError:
        # qualification drift (e.g. a ViewFileSystem mount REMAPPING the
        # path portion): the engine scan returned paths the root cannot
        # relativize. The gateway drain resolves the target root via
        # fs.resolvePath and filters correctly — fall back rather than
        # keep files with hidden filtering silently disabled (ADVICE r9).
        import logging

        logging.getLogger(__name__).warning(
            "engine-side listing of %s hit root-qualification drift; "
            "falling back to the gateway drain (resolvePath-aware)", path,
        )
        return _list_parquet_statuses_gateway(
            spark, path, root_status=root_status
        )


def _root_file_status(spark, path: str):
    """The Hadoop ``FileStatus`` of the listing root (one gateway round
    trip) — shared by both listing implementations so the root-is-file
    short-circuit cannot diverge between them."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getFileStatus(p)


def _status_triple(status) -> tuple[str, int, int]:
    return (
        status.getPath().toString(),
        status.getLen(),
        status.getModificationTime(),
    )


def _list_parquet_statuses_gateway(
    spark, path: str, *, root_status=None
) -> list[tuple[str, int, int]]:
    """Driver-side fallback listing: drain Hadoop ``listFiles(path, true)``
    through the py4j gateway. Semantics identical to
    :func:`_list_parquet_statuses` (equality pinned in tests); cost is
    O(files) gateway round trips on the driver, which is why the engine
    path is the default — this exists only for stores where the
    ``binaryFile`` scan fails outright."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if root_status is None:
        root_status = fs.getFileStatus(p)
    if root_status.isFile():
        return [_status_triple(root_status)]
    # Hidden-segment filtering must be RELATIVE to the listing root — a
    # dataset legitimately living under a '.'/'_'-prefixed ANCESTOR
    # (~/.local/share/..., /data/_warehouse/tbl) would otherwise list as
    # empty and the pruned read would silently return 0 rows.
    root = root_status.getPath().toString()
    prefix = root if root.endswith("/") else root + "/"
    # Prefix candidates beyond the qualified root, tried in order:
    # (a) the mount-RESOLVED root — ViewFileSystem/mounted namespaces
    # return target-resolved paths from listFiles (possibly remapping the
    # path portion too, e.g. viewfs://c/data/tbl -> hdfs://ns/warehouse/
    # data/tbl) while getFileStatus reports the view path (ADVICE r8);
    # resolvePath surfaces the exact target prefix. (b) the scheme/
    # authority-free path portion, for mounts that resolve scheme and
    # authority but keep the path.
    try:
        resolved = fs.resolvePath(p).toString()
        resolved_prefix = (
            resolved if resolved.endswith("/") else resolved + "/"
        )
    except Exception:  # store without resolvePath support
        resolved_prefix = None
    root_path = root_status.getPath().toUri().getPath() or "/"
    path_prefix = root_path if root_path.endswith("/") else root_path + "/"
    out: list[tuple[str, int, int]] = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        fp = st.getPath()
        name = fp.getName()
        if not name.endswith(".parquet") or name.startswith(("_", ".")):
            continue
        # skip files under hidden intermediate dirs (_tmp/, .staging/ ...)
        full = fp.toString()
        if full.startswith(prefix):
            rel = full[len(prefix):]
        elif resolved_prefix and full.startswith(resolved_prefix):
            rel = full[len(resolved_prefix):]
        else:
            full_path = fp.toUri().getPath()
            if not full_path.startswith(path_prefix):
                # no candidate prefix nests the listed path; guessing
                # would silently re-enable ABSOLUTE-path hidden filtering
                # and reintroduce the empty-listing bug the relative
                # filter fixed (ADVICE r7) — fail loudly instead.
                raise RuntimeError(
                    f"_list_parquet_statuses: listed path {full!r} is not "
                    f"under the qualified listing root {prefix!r} (nor its "
                    f"resolved/path-portion prefixes) — qualification "
                    "mismatch between getFileStatus and listFiles"
                )
            rel = full_path[len(path_prefix):]
        if any(seg.startswith(("_", ".")) for seg in rel.split("/")[:-1] if seg):
            continue
        out.append((full, st.getLen(), st.getModificationTime()))
    return sorted(out)


def _zone_map_for_files(
    spark, statuses: list[tuple[str, int, int]], cols: list[str]
) -> DataFrame:
    """Footer-read zone-map rows for an EXPLICIT file list — the shared
    kernel of :func:`file_zone_map` (whole directory) and
    :func:`zone_map_update` (new files only, keeping updates O(new)).
    ``statuses`` are ``(file, size, mtime_ms)`` identity triples from
    :func:`_list_parquet_statuses`; size/mtime ride through as the
    ``file_size``/``file_mtime`` manifest columns that let
    :func:`manifest_reconcile` drop rows for files REWRITTEN under the
    same name (stale-stats churn, round 8) — they never influence the
    pruning predicate itself."""
    import pandas as pd

    # Footer-read fan-out scales with the CLUSTER, not a fixed constant:
    # a hard 64-partition cap is fine on local[32] but serializes 100k
    # remote footer GETs into 64 tasks on a 1000-executor cluster
    # (~1.5k sequential round trips per task). Cap at 2x default
    # parallelism (floor 64 keeps small clusters busy), never more than
    # one file per task.
    fanout = max(64, spark.sparkContext.defaultParallelism * 2)
    files_df = spark.createDataFrame(
        statuses, schema="file string, file_size long, file_mtime long"
    ).repartition(max(1, min(len(statuses), fanout)))

    out_schema = (
        "file string, file_size long, file_mtime long, n_rows long, "
        + ", ".join(f"{c}_min double, {c}_max double" for c in cols)
    )
    want = list(cols)

    def read_footers(batches):
        import pyarrow.parquet as pq
        from pyarrow import fs as pafs

        # Store-agnostic footer opens (round 9): resolve the qualified URI
        # through pyarrow's filesystem registry (file:/hdfs:/s3: — whatever
        # scheme the listing qualified) instead of the previous local-only
        # `replace("file:", "")` hack. The filesystem is memoized by URI
        # prefix — from_uri constructs a NEW filesystem per call (for
        # object stores that's credential-chain/region resolution), which
        # would dominate the microsecond footer GET if paid per file.
        fs_by_prefix: list[tuple[str, object]] = []

        def open_footer(uri: str):
            if uri.startswith("file:"):
                # Hadoop-qualified local path: strip the scheme directly.
                # from_uri would require a VALID URI, and Hadoop emits the
                # DECODED form — a filename with brackets/spaces is not
                # URI-parseable but is a perfectly good local path.
                local = uri[5:]
                while local.startswith("//"):
                    local = local[1:]
                return pq.ParquetFile(local)
            for pre, fsys in fs_by_prefix:
                if uri.startswith(pre):
                    return pq.ParquetFile(fsys.open_input_file(uri[len(pre):]))
            try:
                fsys, rel = pafs.FileSystem.from_uri(uri)
            except Exception:  # scheme pyarrow can't resolve
                return pq.ParquetFile(uri)
            if rel and uri.endswith(rel):
                fs_by_prefix.append((uri[: len(uri) - len(rel)], fsys))
            return pq.ParquetFile(fsys.open_input_file(rel))

        for pdf in batches:
            rows = []
            for f, fsz, fmt in zip(
                pdf["file"], pdf["file_size"], pdf["file_mtime"]
            ):
                md = open_footer(f).metadata
                mins = {c: None for c in want}
                maxs = {c: None for c in want}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        cc = g.column(ci)
                        name = cc.path_in_schema
                        # has_min_max guard (r13 audit): a chunk whose
                        # statistics exist but carry no min/max — an
                        # all-NULL column chunk is the common producer —
                        # raises from pyarrow's .min accessor; such a
                        # chunk proves nothing and must simply not
                        # tighten the envelope (NULL stats rows are
                        # always KEPT by zone_pruned_read).
                        if (
                            name in mins
                            and cc.statistics is not None
                            and cc.statistics.has_min_max
                        ):
                            lo = float(cc.statistics.min)
                            hi = float(cc.statistics.max)
                            mins[name] = (
                                lo if mins[name] is None else min(mins[name], lo)
                            )
                            maxs[name] = (
                                hi if maxs[name] is None else max(maxs[name], hi)
                            )
                row = {
                    "file": f,
                    "file_size": fsz,
                    "file_mtime": fmt,
                    "n_rows": md.num_rows,
                }
                for c in want:
                    row[f"{c}_min"] = mins[c]
                    row[f"{c}_max"] = maxs[c]
                rows.append(row)
            yield pd.DataFrame(rows)

    return files_df.mapInPandas(read_footers, schema=out_schema)


def file_zone_map(spark, path: str, cols: list[str]) -> DataFrame:
    """FILE-level zone-map manifest: one row per parquet data file with
    per-column min/max aggregated over its row groups, read from the
    parquet FOOTERS only (pyarrow metadata — no data pages touched).

    This is the manifest half of the lakehouse data-skipping design
    (Delta/Iceberg file statistics, built from first principles): format
    zone maps prune ROW GROUPS only after a task has opened the file,
    while a manifest prunes the FILE LIST on the driver side — at 100 TB
    the difference is scheduling thousands of no-op tasks vs none, and
    the manifest itself is a tiny table you persist next to the data and
    maintain incrementally per written file.

    Footer reads are distributed (one task per file batch via
    mapInPandas over the file list — the driver never opens a file);
    listing is RECURSIVE (nested/hive-partitioned layouts included);
    output: (file, file_size, file_mtime, n_rows, <col>_min, <col>_max
    ...) — the size/mtime identity columns exist solely so
    :func:`manifest_reconcile` can detect same-name rewrites.
    """
    return _zone_map_for_files(spark, _list_parquet_statuses(spark, path), cols)


def _pruned_paths(
    manifest: DataFrame, keep_cond: Column, max_list: int
) -> list[str] | None:
    """Directory-compacted read-path plan for a pruned scan (Delta-style
    log compaction shape): group the manifest's kept files by parent
    directory; a directory whose files are ALL kept contributes ONE dir
    path, while partially-kept directories — and fully-kept dirs that are
    strict ancestors of other manifest dirs (mixed-depth layouts, where a
    whole-dir read could double-cover descendants) — contribute individual
    file paths. The whole plan runs as engine aggregates over the manifest
    table — the driver materializes only the final path list, and only
    up to ``max_list + 1`` rows (a ``limit`` bounds the collect).
    Returns None when the plan exceeds ``max_list`` — callers fall back
    to scanning the unpruned directory, which is a valid superset."""
    m = manifest.select(
        F.col("file"),
        keep_cond.alias("_keep"),
        F.regexp_replace("file", "/[^/]+$", "").alias("_dir"),
    )
    dir_stats = m.groupBy("_dir").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("_keep"), 1)).alias("n_keep"),
    )
    # Mixed-depth guard: a dir that is a strict ANCESTOR of a dir that
    # will itself emit paths (n_keep > 0) must never be emitted whole —
    # a recursive/partition-discovering read of that dir would cover
    # descendant files the plan also emits (double-read → duplicate
    # rows, worse than the superset contract). Ancestors of dirs with
    # NO kept files stay emit-whole-eligible: their descendants appear
    # nowhere else in the plan, so the whole-dir read only adds superset
    # rows, which the contract allows — demoting them too would explode
    # whale dirs into per-file paths for nothing. Each kept-emitting dir
    # explodes to its '/'-boundary strict prefixes (O(dirs × depth)
    # rows, engine-side); kept-full dirs in that set demote to files.
    anc = dir_stats.filter("n_keep > 0").select(
        F.explode(
            F.expr(
                "CASE WHEN size(split(_dir, '/')) > 1 THEN"
                " transform(sequence(1, size(split(_dir, '/')) - 1),"
                " i -> array_join(slice(split(_dir, '/'), 1, i), '/'))"
                " ELSE array() END"
            )
        ).alias("_dir")
    ).distinct()
    dirs = dir_stats.join(
        anc.withColumn("_has_desc", F.lit(True)), "_dir", "left"
    )
    full_dirs = dirs.filter(
        (F.col("n_keep") == F.col("n")) & F.col("_has_desc").isNull()
    ).select(F.col("_dir").alias("p"))
    partial_files = (
        m.join(
            dirs.filter(
                (F.col("n_keep") > 0)
                & (
                    (F.col("n_keep") < F.col("n"))
                    | F.col("_has_desc").isNotNull()
                )
            ).select("_dir"),
            "_dir",
            "left_semi",
        )
        .filter("_keep")
        .select(F.col("file").alias("p"))
    )
    rows = full_dirs.unionByName(partial_files).limit(max_list + 1).collect()
    if len(rows) > max_list:
        return None
    return sorted(r["p"] for r in rows)


def _read_pruned(
    spark,
    path: str,
    manifest: DataFrame,
    keep_cond: Column,
    *,
    max_list: int = 100_000,
) -> DataFrame:
    """Shared pruned-scan executor for zone-map / Bloom manifests.

    Scale shape (round-6 de-collect): the keep decision runs as ONE tiny
    aggregate over the manifest table; `kept == total` short-circuits to
    the plain directory scan (no file list at all, Spark's own file
    index does the listing); otherwise the path plan is
    directory-compacted (:func:`_pruned_paths`) and bounded by
    ``max_list`` — beyond that the scan falls back to the unpruned
    directory (superset contract: pruning may only ever ADD files back,
    never drop provable-relevant ones). ``basePath`` is pinned so
    partition-column inference survives leaf-dir / file-level reads on
    hive-partitioned layouts."""
    stats = manifest.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(keep_cond, 1)).alias("kept"),
    ).collect()[0]
    # Every spark.read.parquet argument below is a LITERAL path (the
    # table root, or manifest file paths in Hadoop's decoded form), so
    # glob metacharacters must be escaped (_glob_escape) or a bracketed
    # dir name silently reads a DIFFERENT file set. basePath stays RAW:
    # it's a literal prefix compared against the scanned file paths, and
    # escaping it would break that match.
    if stats["total"] == 0:
        # An empty manifest proves nothing about the data — a stale or
        # mis-built manifest (e.g. a listing bug) must degrade to the
        # unpruned scan (superset contract), never to silent 0 rows.
        return spark.read.parquet(_glob_escape(path))
    if stats["kept"] == 0:
        return spark.read.parquet(_glob_escape(path)).limit(0)
    if stats["kept"] == stats["total"]:
        return spark.read.parquet(_glob_escape(path))
    paths = _pruned_paths(manifest, keep_cond, max_list)
    if paths is None:
        return spark.read.parquet(_glob_escape(path))
    return spark.read.option("basePath", path).parquet(
        *[_glob_escape(p) for p in paths]
    )


def zone_pruned_read(
    spark,
    path: str,
    zone_map: DataFrame,
    col: str,
    lo: float,
    hi: float,
    *,
    max_list: int = 100_000,
) -> DataFrame:
    """Read only the files whose [min,max] envelope for ``col`` overlaps
    [lo, hi], per the zone-map manifest — the pruned-scan half. Files
    with no statistics for the column are kept (a manifest must never
    silently drop data it cannot prove irrelevant). Returns the pruned
    DataFrame; apply the row-level filter on top — pruning is a superset
    guarantee, not a filter. The keep decision and path planning run as
    engine aggregates (:func:`_read_pruned`), bounded by ``max_list``."""
    keep_cond = (F.col(f"{col}_min").isNull()) | (
        (F.col(f"{col}_max") >= lo) & (F.col(f"{col}_min") <= hi)
    )
    return _read_pruned(spark, path, zone_map, keep_cond, max_list=max_list)


__all__ += ["file_zone_map", "zone_pruned_read"]


def zone_map_update(
    spark,
    path: str,
    cols: list[str],
    existing: DataFrame,
    *,
    listed: list[tuple[str, int, int]] | None = None,
) -> DataFrame:
    """Incremental manifest maintenance: footer-read ONLY the data files
    not yet in ``existing`` and union their rows in — the per-written-file
    upkeep that keeps the manifest O(new files) per batch instead of a
    full re-listing scan (same incremental discipline as the repo's CDC /
    incremental-MV / incremental-dedup family). Result is bit-identical
    to a fresh ``file_zone_map`` over the whole directory.

    Round-6 fix (ADVICE): the footer reader is scoped to the NEW file
    list directly (``_zone_map_for_files(new)``), so each batch reads
    O(new) footers — the previous shape built the full manifest and
    semi-joined after the UDF, re-reading every footer per update.
    Listing is recursive (nested layouts included); the known-file set
    never materializes in Python — the listing anti-joins the standing
    manifest engine-side and only the NEW names collect. ``listed``
    reuses a caller-held status listing (one LIST per reconcile→update
    batch). Newness is NAME-ONLY (see :func:`_new_files`): update-alone
    is idempotent and never touches an already-manifested file. A file
    rewritten under the same name is handled by the documented
    ``reconcile → update`` contract — :func:`manifest_reconcile` drops
    the stale row on its identity semi-join, making the name new again
    to this union, which then reflects the fresh footer stats (round 9,
    reverting the round-8 triple-keyed newness that re-read clobbered
    old files and duplicated rows on update-alone)."""
    new = _new_files(spark, path, existing, listed=listed)
    if not new:
        return existing
    fresh = _zone_map_for_files(spark, new, cols)
    missing = [c for c in _IDENTITY_COLS if c not in existing.columns]
    if missing:
        # pre-/partial-identity manifest (round-7 schema, or one identity
        # column swapped out, e.g. mtime->etag): drop exactly the columns
        # the existing manifest lacks so the union stays well-typed; such
        # a manifest reconciles by name only (_has_identity needs both).
        fresh = fresh.drop(*missing)
    return existing.unionByName(fresh)


_IDENTITY_COLS = ("file_size", "file_mtime")


def _has_identity(manifest: DataFrame) -> bool:
    return all(c in manifest.columns for c in _IDENTITY_COLS)


def _new_files(
    spark,
    path: str,
    existing: DataFrame,
    *,
    listed: list[tuple[str, int, int]] | None = None,
) -> list[tuple[str, int, int]]:
    """Recursive status listing minus the manifest's known files, computed
    as an engine-side anti-join: the driver holds the directory listing
    (the same cost Spark's own file index pays on any scan of ``path``)
    but never a second full-size known-file list — only the new entries
    come back, and those are O(batch) by definition.

    The anti-join is NAME-ONLY, deliberately (round 9): keying it on the
    full (file, file_size, file_mtime) identity triple (the round-8
    mistake) makes any already-manifested file whose bytes changed count
    as "new" — update-alone then footer-reads a possibly-clobbered old
    file (destroying the O(new)/never-touch-old-files contract) and
    unions a DUPLICATE row next to the stale one. Same-name-rewrite
    detection lives solely in :func:`manifest_reconcile`'s identity
    semi-join: under the documented ``reconcile → update`` maintenance
    contract the reconcile drops the stale row first, so the rewritten
    name is genuinely absent from the manifest this function sees and
    re-enters here as a fresh footer read."""
    if listed is None:
        listed = _list_parquet_statuses(spark, path)
    if not listed:
        return []
    files_df = spark.createDataFrame(
        listed, "file string, file_size long, file_mtime long"
    )
    return sorted(
        (r["file"], r["file_size"], r["file_mtime"])
        for r in files_df.join(
            existing.select("file"), ["file"], "left_anti"
        ).collect()
    )


__all__.append("zone_map_update")


def manifest_reconcile(
    spark,
    path: str,
    existing: DataFrame,
    *,
    listed: list[tuple[str, int, int]] | None = None,
) -> DataFrame:
    """Drop manifest rows whose data files no longer exist on disk — the
    DELETE half of manifest maintenance (round 7). ``zone_map_update`` /
    ``bloom_manifest_update`` only ever ADD rows, so a compaction,
    VACUUM, or manual delete leaves stale rows that keep vanished files
    in the pruned path plan and fail the scan on a missing file.

    Works for any manifest carrying a ``file`` column (zone-map and
    Bloom manifests alike). The recursive listing is the same list
    Spark's own file index holds for any scan of ``path``; it broadcasts
    (file identity triples, tiny) and the manifest left-semi-joins it
    engine-side. When the manifest carries the (file_size, file_mtime)
    identity columns the semi-join runs on the FULL triple, so a file
    deleted AND re-created under the same name with different content
    (the stale-stats churn an object store can produce between a LIST
    and a rewrite batch, round 8) drops its stale row here and re-enters
    through the update as a fresh footer read; a pre-identity manifest
    reconciles by name alone. Same-millisecond-same-size rewrites are
    the one blind spot — the same limit any mtime+size identity has; on
    stores exposing etags, swap the mtime column for the etag. After a
    rewrite batch the full maintenance step is ``reconcile → update``;
    pass the same ``listed`` to both so an object-store path pays ONE
    recursive LIST per batch (at ~100k files the listing dominates
    maintenance cost). Bit-identical to a fresh build.

    NULL identity values degrade to name-only membership for that ROW
    (round 9, ADVICE r8): a manifest assembled from mixed-era slices —
    e.g. pre-round-8 epochs read alongside newer ones, where the merged
    schema has the columns but old rows read as NULL — must not have its
    live files dropped by a null-rejecting equality, or pruned reads
    would silently omit those files' rows until the next update
    (superset-contract violation)."""
    if listed is None:
        listed = _list_parquet_statuses(spark, path)
    files_df = spark.createDataFrame(
        listed, schema="file string, file_size long, file_mtime long"
    )
    if not _has_identity(existing):
        return existing.join(
            F.broadcast(files_df.select("file")), ["file"], "left_semi"
        )
    man = existing.alias("_man")
    lst = F.broadcast(files_df).alias("_lst")
    cond = (F.col("_man.file") == F.col("_lst.file")) & (
        F.col("_man.file_size").isNull()
        | F.col("_man.file_mtime").isNull()
        | (
            (F.col("_man.file_size") == F.col("_lst.file_size"))
            & (F.col("_man.file_mtime") == F.col("_lst.file_mtime"))
        )
    )
    return man.join(lst, cond, "left_semi")


__all__.append("manifest_reconcile")


def file_bloom_manifest(
    spark,
    path: str,
    col: str,
    *,
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """FILE-level BLOOM manifest: one row per parquet data file with an
    m-bit Bloom filter over ``col``'s values, packed as a sparse
    ``map<int, long>`` of 64-bit words. The equality-predicate complement
    to :func:`file_zone_map` — min/max envelopes cannot prune a point
    predicate on a high-cardinality/unsorted string column (every file's
    [min, max] spans the dictionary), while a per-file Bloom filter
    prunes exactly those scans (Delta/Iceberg ship the same idea as
    file-level bloom stats; Parquet's own bloom filters sit below the
    file list, inside already-scheduled tasks).

    Distributed build — ONE scan of the column, never through the
    driver: each row contributes ``k`` bit positions
    (``pmod(xxhash64(value, seed_i), m_bits)``, all engine-native), the
    positions explode to (word_idx, one-hot mask) pairs, and two
    map-side-combining aggregates (bit_or per (file, word), then
    map_from_entries per file) pack the bitmap. Output:
    (file, file_size, file_mtime, n_values, bloom) — size/mtime come
    from ``_metadata`` and exist solely so :func:`manifest_reconcile`
    can detect same-name rewrites. Nulls contribute nothing (an equality
    predicate never matches NULL).

    Unlike the footer zone map — where a missing statistic means "cannot
    prove, must keep" — this manifest is built from the data itself, so
    an UNSET bit is hard proof of absence: membership says maybe-present
    (false positives shrink with m_bits/k), absence is exact. Mergeable:
    bitmaps OR across files/shards, so incremental maintenance unions
    per-new-file rows (:func:`bloom_manifest_update`).
    """
    if m_bits <= 0 or m_bits % 64:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k <= 0:
        raise ValueError("k must be positive")
    return _bloom_manifest_from_scan(
        spark.read.parquet(_glob_escape(path)), col, m_bits=m_bits, k=k
    )


def _bloom_manifest_from_scan(
    scan: DataFrame, col: str, *, m_bits: int, k: int
) -> DataFrame:
    """Bloom-manifest kernel over an EXPLICIT parquet scan — shared by
    :func:`file_bloom_manifest` (whole directory) and
    :func:`bloom_manifest_update` (new files only, keeping updates
    O(new data) instead of a full-table re-scan per batch)."""
    meta = scan.select(
        F.col("_metadata.file_path").alias("file"),
        F.col("_metadata.file_size").alias("file_size"),
        F.unix_millis(
            F.col("_metadata.file_modification_time")
        ).alias("file_mtime"),
        F.col(col).alias("_v"),
    )
    vals = meta.filter(F.col("_v").isNotNull())
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col("_v"), F.lit(i)), F.lit(m_bits)).cast(
                    "int"
                )
                for i in range(k)
            ]
        )
    ).alias("pos")
    words = (
        vals.select("file", pos)
        .select(
            "file",
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            # shiftleft with a COLUMN shift count needs the SQL form; the
            # Python helper's signature only takes a literal int
            F.expr("shiftleft(1L, pos % 64)").alias("mask"),
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    # (file_size, file_mtime) are functionally dependent on file — they
    # ride the per-file count aggregate as min()s (zero extra shuffle;
    # they stay OUT of the wide (file, word_idx) aggregate's keys). The
    # identity values equal the Hadoop listing's getLen/getModificationTime
    # bit-for-bit (same FileStatus), so manifest_reconcile's triple
    # semi-join against _list_parquet_statuses is exact for Bloom
    # manifests too (stale-stats churn, round 8).
    # Counts aggregate over the UNFILTERED scan (r13 audit): a file whose
    # indexed column is entirely NULL contributes no bits, but it must
    # still get a manifest row (n_values=0, empty bitmap) — absent, it is
    # "new" to _new_files on EVERY bloom_manifest_update and gets
    # re-scanned per batch, breaking the O(new) maintenance contract.
    # Pruning stays exact: an empty bitmap never has all k bits set, and
    # an equality predicate never matches the file's NULL-only values.
    counts = meta.groupBy("file").agg(
        F.count("_v").alias("n_values"),
        F.min("file_size").alias("file_size"),
        F.min("file_mtime").alias("file_mtime"),
    )
    return (
        counts.join(
            words.groupBy("file").agg(
                F.map_from_entries(
                    F.sort_array(F.collect_list(F.struct("word_idx", "word")))
                ).alias("bloom")
            ),
            "file",
            "left",
        )
        .select(
            "file",
            "file_size",
            "file_mtime",
            "n_values",
            F.coalesce(
                F.col("bloom"), F.expr("CAST(map() AS MAP<INT, BIGINT>)")
            ).alias("bloom"),
        )
    )


def bloom_value_positions(spark, value, *, m_bits: int = 4096, k: int = 3) -> list[int]:
    """The ``k`` manifest bit positions for a probe ``value`` — computed
    by the ENGINE (a 1-row projection through the same
    ``pmod(xxhash64(value, seed_i), m_bits)`` expressions the build side
    uses), never re-implemented in Python, so build and probe can only
    agree. The probe value must carry the same Spark type as the indexed
    column (xxhash64 is type-sensitive)."""
    row = (
        spark.range(1)
        .select(
            *[
                F.pmod(F.xxhash64(F.lit(value), F.lit(i)), F.lit(m_bits))
                .cast("int")
                .alias(f"p{i}")
                for i in range(k)
            ]
        )
        .collect()[0]
    )
    return [row[f"p{i}"] for i in range(k)]


def bloom_pruned_read(
    spark,
    path: str,
    manifest: DataFrame,
    col: str,
    value,
    *,
    m_bits: int = 4096,
    k: int = 3,
    max_list: int = 100_000,
) -> DataFrame:
    """Read only the files whose Bloom bitmap has ALL ``k`` bits set for
    ``value`` — the pruned-scan half of the equality-skipping design.
    A missing word in a file's sparse map is an unset bit (proof of
    absence — the manifest is data-derived, see
    :func:`file_bloom_manifest`), so those files prune. Superset
    contract as with :func:`zone_pruned_read`: the pruned frame may hold
    false-positive files' rows — apply the exact row-level filter on
    top. The keep decision and path planning run as engine aggregates
    over the manifest table (:func:`_read_pruned`): directory-compacted
    path plan, driver materialization bounded by ``max_list``."""
    cond = F.lit(True)
    for p in bloom_value_positions(spark, value, m_bits=m_bits, k=k):
        w, b = divmod(p, 64)
        # two's-complement top bit: 1<<63 overflows a signed long literal
        mask = (1 << b) if b < 63 else -(1 << 63)
        word = F.col("bloom").getItem(w)
        cond = cond & word.isNotNull() & (word.bitwiseAND(F.lit(mask)) != 0)
    return _read_pruned(spark, path, manifest, cond, max_list=max_list)


def bloom_manifest_update(
    spark,
    path: str,
    col: str,
    existing: DataFrame,
    *,
    m_bits: int = 4096,
    k: int = 3,
    listed: list[tuple[str, int, int]] | None = None,
) -> DataFrame:
    """Incremental Bloom-manifest maintenance: index ONLY the data files
    not yet in ``existing`` and union their rows in — O(new files) per
    batch, same incremental discipline as :func:`zone_map_update`.
    Bit-identical to a fresh :func:`file_bloom_manifest` over the whole
    directory (per-file rows are independent).

    Round-6 fix (ADVICE): the column scan is built from ONLY the new
    file paths (``spark.read.parquet(*new)``) — the previous shape
    scanned the whole directory and semi-joined after the aggregate,
    which the join cannot push below, so every update paid O(all data).
    Listing is recursive (nested layouts included); listing paths are
    scheme-qualified the same way ``_metadata.file_path`` reports them,
    so the set difference is exact."""
    if m_bits <= 0 or m_bits % 64:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k <= 0:
        raise ValueError("k must be positive")
    new = _new_files(spark, path, existing, listed=listed)
    if not new:
        return existing
    fresh = _bloom_manifest_from_scan(
        spark.read.parquet(*[_glob_escape(f) for f, _, _ in new]),
        col, m_bits=m_bits, k=k,
    )
    missing = [c for c in _IDENTITY_COLS if c not in existing.columns]
    if missing:
        # pre-/partial-identity manifest: drop exactly the columns the
        # existing manifest lacks (see zone_map_update).
        fresh = fresh.drop(*missing)
    return existing.unionByName(fresh)


__all__ += [
    "file_bloom_manifest",
    "bloom_value_positions",
    "bloom_pruned_read",
    "bloom_manifest_update",
]
