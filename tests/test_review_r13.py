"""Round-13 regression tests for the ADVICE r12 findings.

1. (medium) knn_self_join's tile cutoff treated NaN similarities as +inf
   when computing the tile's k-th-largest score: a row with >= k NaN
   tile-mates got kth = inf, so ONLY the NaN candidates passed the mask
   and every REAL candidate in that tile was silently dropped.  NaNs must
   still always be emitted (they surface as NULL cos, ADVICE r9), but the
   cutoff must be computed over NaN-EXCLUDED scores — NULL cos sorts last
   in the final desc rank window, so a NaN tile-mate can never displace a
   real candidate globally.
2. (low) release_caches(df) returned the same False for "nothing was ever
   pinned on this exact object" (a derived/rebound frame) as for "already
   released", hiding mis-targeted releases.  It now warns on the former.
3. (low) bucketed_join recovered bucket columns by string-parsing DESCRIBE
   FORMATTED output; it now uses the structured catalog bucketSpec.
"""

from __future__ import annotations

import math

import pytest

from quantms_utils_spark.operators.similarity import knn_self_join


def test_knn_real_neighbors_survive_nan_majority_tile(spark):
    """ADVICE r12 (medium): one query vector, three corrupted (NaN)
    vectors, two real neighbors at cos 0.9 and 0.8, k=3.  The old cutoff
    (NaN -> +inf) made kth = inf and emitted ONLY the NaN candidates;
    the real neighbors 0.9/0.8 must rank 1 and 2, with NULL-cos rows
    only after them."""
    nan = float("nan")
    rows = [
        (0, 0, [1.0, 0.0, 0.0, 0.0]),
        (1, 0, [nan, 0.0, 0.0, 0.0]),
        (2, 0, [nan, 0.0, 0.0, 0.0]),
        (3, 0, [nan, 0.0, 0.0, 0.0]),
        (4, 0, [0.9, math.sqrt(1.0 - 0.81), 0.0, 0.0]),
        (5, 0, [0.8, 0.6, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    for nb in (1, 2):
        out = knn_self_join(
            df, "vec_id", "embedding", "label", k=3, n_buckets=nb
        )
        by_rank = {
            r["rank"]: (r["neighbor_id"], r["cos_sim"])
            for r in out.filter("vec_id = 0").collect()
        }
        assert by_rank[1][0] == 4 and by_rank[1][1] == pytest.approx(0.9), (
            nb,
            by_rank,
        )
        assert by_rank[2][0] == 5 and by_rank[2][1] == pytest.approx(0.8), (
            nb,
            by_rank,
        )
        # rank 3 is the first NULL-cos (corrupted) neighbor, id tie-break
        assert by_rank[3][1] is None and by_rank[3][0] == 1, (nb, by_rank)


def test_knn_nan_rows_still_detectable(spark):
    """The r9 contract is preserved: corrupted embeddings still surface
    as NULL-cos neighbor rows rather than vanishing."""
    nan = float("nan")
    rows = [
        (0, 0, [1.0, 0.0]),
        (1, 0, [0.0, 1.0]),
        (2, 0, [nan, nan]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = knn_self_join(df, "vec_id", "embedding", "label", k=2, n_buckets=1)
    got = {
        (r["vec_id"], r["neighbor_id"]): r["cos_sim"] for r in out.collect()
    }
    assert (0, 2) in got and got[(0, 2)] is None
    assert (1, 2) in got and got[(1, 2)] is None


def test_release_caches_warns_on_derived_frame(spark):
    """ADVICE r12 (low): releasing a DERIVED frame (the idiomatic rebind)
    used to return the same silent False as 'already released' while the
    operator's caches stayed pinned. It still returns False (and still
    releases nothing), but now warns so the leak is detectable."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        release_caches,
    )

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(6)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, "doc_id", "text", n_hashes=8)
    pairs = lsh_candidate_pairs(sigs, "doc_id", 8, 2, max_bucket=10)
    pairs.collect()
    derived = pairs.filter(F.col("doc_a") >= 0)
    with pytest.warns(RuntimeWarning, match="no pinned cache"):
        assert release_caches(derived) is False
    # the real target still releases
    assert release_caches(pairs) is True
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_cache_scope_rejects_unpinned_frame(spark):
    """cache_scope on a frame without a pinned cache is the exact mistake
    the scope exists to prevent — it now fails fast."""
    from quantms_utils_spark.operators.dedup import cache_scope

    df = spark.range(3)
    with pytest.raises(ValueError, match="no pinned cache"):
        with cache_scope(df):
            pass


# ------------------------------------------------- r13 layout-internals audit


def test_compact_partitions_preserves_null_partition_rows(spark, tmp_path):
    """r13 audit: rows with a NULL partition value were silently dropped —
    the plan's groupBy kept the NULL group but the plan→data equi-join
    never matched it. The join is now null-safe; NULL-partition rows land
    in the writer's default partition."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.layout import compact_partitions

    df = spark.range(0, 100).select(
        F.when(F.col("id") % 4 == 0, F.lit(None).cast("string"))
        .otherwise((F.col("id") % 3).cast("string"))
        .alias("part"),
        F.col("id").cast("string").alias("payload"),
    )
    out = str(tmp_path / "compacted")
    plan = compact_partitions(df, "part", out, target_bytes=1 << 20)
    assert {r["part"] for r in plan.collect()} == {None, "0", "1", "2"}
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert back.filter(F.col("part").isNull()).count() == 25
    assert sorted(r["payload"] for r in back.collect()) == sorted(
        str(i) for i in range(100)
    )


def test_compact_partitions_rejects_reserved_columns(spark):
    from quantms_utils_spark.operators.layout import compact_partitions

    df = spark.range(3).selectExpr("id AS part", "id AS n_files")
    with pytest.raises(ValueError, match="reserved column"):
        compact_partitions(df, "part", "/tmp/x", target_bytes=1 << 20)


def test_zone_map_survives_all_null_column_chunk(spark, tmp_path):
    """r13 audit: a parquet column chunk whose statistics carry no
    min/max (all-NULL chunk) made the footer reader raise from pyarrow's
    .min accessor, killing the manifest build. Such chunks now simply
    don't tighten the envelope, and a file with NO stats for the column
    is always kept by the pruned read."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.layout import (
        file_zone_map,
        zone_pruned_read,
    )

    path = str(tmp_path / "nullchunks")
    # file A: v entirely NULL; file B: v populated
    spark.range(0, 50).select(
        F.col("id"), F.lit(None).cast("double").alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(path)
    spark.range(50, 100).select(
        F.col("id"), (F.col("id") * 1.0).alias("v")
    ).coalesce(1).write.mode("append").parquet(path)

    man = file_zone_map(spark, path, ["v"]).localCheckpoint()
    rows = {r["file"]: (r["v_min"], r["v_max"]) for r in man.collect()}
    assert len(rows) == 2
    assert (None, None) in rows.values()  # the all-NULL file

    pruned = zone_pruned_read(spark, path, man, "v", 60.0, 70.0)
    got = sorted(
        r["id"] for r in pruned.filter(F.col("v").between(60, 70)).collect()
    )
    assert got == list(range(60, 71))


def test_bloom_manifest_covers_all_null_files_once(spark, tmp_path):
    """r13 audit: a file whose indexed column is entirely NULL never got a
    manifest row, so every bloom_manifest_update saw it as 'new' and
    re-scanned it per batch. It now carries an (n_values=0, empty bitmap)
    row: updates are true no-ops, pruning still drops it, and the exact
    filter over the pruned read stays complete."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.layout import (
        bloom_manifest_update,
        bloom_pruned_read,
        file_bloom_manifest,
    )

    path = str(tmp_path / "nullfiles")
    spark.range(0, 40).select(
        F.col("id"), F.lit(None).cast("string").alias("tag")
    ).coalesce(1).write.mode("overwrite").parquet(path)
    spark.range(40, 80).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("tag")
    ).coalesce(1).write.mode("append").parquet(path)

    man = file_bloom_manifest(spark, path, "tag", m_bits=256, k=2)
    man = man.localCheckpoint()
    assert man.count() == 2
    null_row = man.filter(F.col("n_values") == 0).collect()
    assert len(null_row) == 1 and null_row[0]["bloom"] == {}

    # update with no new data is a no-op (the null file is not 'new')
    again = bloom_manifest_update(spark, path, "tag", man, m_bits=256, k=2)
    assert again.count() == 2

    pruned = bloom_pruned_read(spark, path, man, "tag", "2", m_bits=256, k=2)
    assert (
        pruned.filter(F.col("tag") == "2").count()
        == spark.read.parquet(path).filter(F.col("tag") == "2").count()
    )
    # the all-NULL file prunes out of every probe
    kept_files = {
        r[0] for r in pruned.select(F.col("_metadata.file_path")).distinct().collect()
    }
    null_file = null_row[0]["file"]
    assert null_file not in kept_files


# ---------------------------------------------- r13 media-codec corrupt paths


class TestCodecCorruptPaths:
    """r13 audit of functions/media_codecs.py: corrupt/truncated payloads
    must fail with a ValueError naming the defect, never with raw
    struct/zlib/index noise — and never by accidental mis-stride."""

    def test_y4m_unsupported_colorspace_rejected_explicitly(self):
        import numpy as np

        from quantms_utils_spark.functions.media_codecs import (
            decode_y4m,
            encode_y4m_mono,
        )

        frames = [np.zeros((4, 4), dtype=np.uint8)]
        good = encode_y4m_mono(frames, 30, 1)
        # rewrite the colorspace token to C444: previously failed only by
        # accident ("frame marker missing" after mis-striding)
        bad = good.replace(b"Cmono", b"C444")
        with pytest.raises(ValueError, match="colorspace.*444"):
            decode_y4m(bad)
        # 4:2:0 still accepted (even dims)
        import struct

        hdr = b"YUV4MPEG2 W4 H4 F30:1 Ip A1:1 C420\n"
        y = bytes(16)
        uv = bytes(8)
        stream = hdr + b"FRAME\n" + y + uv
        w, h, fps, fr = decode_y4m(stream)
        assert (w, h, len(fr)) == (4, 4, 1) and fr[0] == y

    def test_y4m_unterminated_header_and_frame_line(self):
        from quantms_utils_spark.functions.media_codecs import decode_y4m

        with pytest.raises(ValueError, match="unterminated"):
            decode_y4m(b"YUV4MPEG2 W4 H4 F30:1 Cmono")
        with pytest.raises(ValueError, match="unterminated Y4M FRAME"):
            decode_y4m(b"YUV4MPEG2 W4 H4 F30:1 Cmono\nFRAME")

    def test_png_truncated_chunk_named(self):
        import numpy as np

        from quantms_utils_spark.functions.media_codecs import (
            decode_png,
            encode_png,
        )

        good = encode_png(np.arange(48, dtype=np.uint8).reshape(4, 4, 3))
        with pytest.raises(ValueError, match="truncated PNG chunk"):
            decode_png(good[:20])  # mid-IHDR
        idat = good.index(b"IDAT")
        with pytest.raises(ValueError, match="truncated PNG chunk b'IDAT'"):
            decode_png(good[: idat + 10])  # mid-IDAT body

    def test_wav_truncated_fmt_chunk_named(self):
        import struct

        from quantms_utils_spark.functions.media_codecs import decode_wav

        # fmt chunk claiming (and carrying) only 8 bytes
        short_fmt = struct.pack("<4sI", b"fmt ", 8) + bytes(8)
        payload = (
            struct.pack("<4sI4s", b"RIFF", 4 + len(short_fmt), b"WAVE")
            + short_fmt
        )
        with pytest.raises(ValueError, match="truncated WAV fmt"):
            decode_wav(payload)


# --------------------------------------------- r13 numpress corrupt headers


def test_numpress_corrupt_fixed_point_rejected():
    """r13 audit: a corrupt fixed-point header (fp <= 0 / NaN / inf) made
    decode_linear / decode_slof divide the whole array into inf/NaN
    silently. Now loud; valid encoders always write fp >= 1."""
    import struct

    import numpy as np

    from quantms_utils_spark.sources.numpress import (
        decode_linear,
        decode_slof,
        encode_linear,
        encode_slof,
    )

    good = encode_linear(np.array([100.0, 100.1, 100.2]))
    for bad_fp in (0.0, -2.0, float("nan"), float("inf")):
        bad = struct.pack(">d", bad_fp) + good[8:]
        with pytest.raises(ValueError, match="fixed point"):
            decode_linear(bad)
    gslof = encode_slof(np.array([10.0, 1000.0]))
    bad = struct.pack(">d", float("nan")) + gslof[8:]
    with pytest.raises(ValueError, match="fixed point"):
        decode_slof(bad)
    # odd body byte = truncation, loud
    with pytest.raises(ValueError, match="truncated numpress-slof"):
        decode_slof(gslof[:-1])
    # round trips still exact
    assert np.allclose(decode_slof(gslof), [10.0, 1000.0], rtol=1e-3)


def test_global_rank_family_rejects_colliding_output_column(spark):
    """r13 audit (rank.py): an output rank/bucket column colliding with an
    input column silently produced a duplicate-name frame that fails much
    later with an ambiguity error — now rejected up front."""
    from pyspark.sql import functions as F

    from quantms_utils_spark.operators.rank import (
        global_ntile,
        global_percent_rank,
        global_rank,
        global_row_number,
    )

    df = spark.range(5).select(F.col("id"), F.col("id").alias("rnk"))
    with pytest.raises(ValueError, match="already exists"):
        global_row_number(df, [F.col("id")])
    with pytest.raises(ValueError, match="already exists"):
        global_rank(df, [F.col("id")], ["id"])
    with pytest.raises(ValueError, match="already exists"):
        global_percent_rank(df, [F.col("id")], rank_col="rnk")
    with pytest.raises(ValueError, match="already exists"):
        global_ntile(df, [F.col("id")], 2, bucket_col="id")
    # non-colliding names still work
    out = global_row_number(df, [F.col("id")], rank_col="r2")
    assert [r["r2"] for r in out.orderBy("id").collect()] == [1, 2, 3, 4, 5]


# ------------------------------------------------------- r13 WARC framing


class TestWarcFramingAudit:
    def test_negative_content_length_scans_forward(self):
        """r13 audit: a negative Content-Length yielded a bogus record and
        moved the scan position BACKWARD. It now degrades to an empty body
        and the following record still parses."""
        from quantms_utils_spark.sources.warc import parse_warc_bytes

        rec_bad = (
            b"WARC/1.0\r\nWARC-Type: metadata\r\n"
            b"WARC-Record-ID: <urn:bad>\r\nContent-Length: -7\r\n\r\n"
        )
        body = b"hello world"
        rec_good = (
            b"WARC/1.0\r\nWARC-Type: resource\r\n"
            b"WARC-Record-ID: <urn:good>\r\n"
            + b"Content-Length: %d\r\n\r\n" % len(body)
            + body
        )
        recs = list(parse_warc_bytes(rec_bad + rec_good))
        assert [r["record_id"] for r in recs] == ["<urn:bad>", "<urn:good>"]
        assert recs[0]["content_length"] == 0 and recs[0]["body"] == b""
        assert recs[1]["body"] == body

    def test_http_split_earliest_terminator_wins(self):
        """r13 audit: bare-\\n HTTP headers whose HTML body contains
        \\r\\n\\r\\n used to split inside the body (wrong rest; a body
        'content-type:' line could override the header's)."""
        from quantms_utils_spark.sources.warc import split_http_payload

        entity = b"<html>\r\n\r\ncontent-type: text/evil\r\n</html>"
        body = (
            b"HTTP/1.1 200 OK\ncontent-type: text/html\n\n" + entity
        )
        status, ctype, rest = split_http_payload(body)
        assert status == 200
        assert ctype == "text/html"
        assert rest == entity

    def test_read_warc_stream_exposes_on_corrupt(self, spark):
        from quantms_utils_spark.sources.warc import read_warc_stream

        with pytest.raises(ValueError, match="on_corrupt"):
            read_warc_stream(spark, "/tmp/nowhere", on_corrupt="bogus")


def test_cosine_pairs_threshold_rounds_before_compare(spark):
    """r13: the cosine-pair threshold is the filter analog of the ANN
    rank gamble — a pair 1e-7 BELOW the threshold (sub-quantum) must be
    included (round-6 collapses it onto the representable boundary), one
    a full quantum below must not."""
    import math

    from quantms_utils_spark.operators.similarity import cosine_pairs_blocked

    def vec(c):
        return [c, math.sqrt(1.0 - c * c)]

    rows = [
        (0, 0, [1.0, 0.0]),
        (1, 0, vec(0.4 - 1e-7)),   # rounds to 0.4 -> included
        (2, 0, vec(0.4 - 1e-6)),   # 0.399999 -> excluded
        (3, 0, vec(0.9)),          # well above -> included
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    pairs = cosine_pairs_blocked(
        df, "vec_id", "embedding", "label", threshold=0.4, n_buckets=1
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert (0, 2) not in got
    assert (0, 3) in got


def test_lazy_logreg_chain_matches_operator(spark):
    """Optimization r13: the query layer trains the quality classifier as
    a LAZY aggregate chain (queries/mlops.py::_train_frame — iteration t+1
    crossJoin(broadcast)s iteration t's 1-row weight aggregate) instead of
    the operator's per-iteration blocking collect.  The update algebra is
    term-for-term the operator's, so the trained weights must be
    bit-identical on both test SFs."""
    from quantms_utils_spark.operators.ml import logreg_train
    from quantms_utils_spark.queries.mlops import (
        LOGREG_ITER,
        LOGREG_LR,
        LOGREG_ROUND,
        _FEATURES,
        _feature_frame,
        _train_frame,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        eager = logreg_train(
            _feature_frame(spark, sf_dir),
            _FEATURES,
            "y",
            n_iter=LOGREG_ITER,
            lr=LOGREG_LR,
            round_decimals=LOGREG_ROUND,
        )
        row = _train_frame(spark, sf_dir).collect()[0]
        lazy = [row[f"w{j}"] for j in range(len(_FEATURES))]
        assert lazy == pytest.approx(eager, abs=0.0), (sf_dir, lazy, eager)


def test_lazy_bpe_chain_matches_operator(spark):
    """Optimization r13: `text_bpe_merges` builds the three BPE rounds as
    a LAZY chain (queries/textops.py::bpe_merge_rules — round k's 1-row
    winning-pair aggregate crossJoin(broadcast)ed back onto the type
    table) instead of the operator's per-round blocking collect. Same
    word table, same pair counts, same lexicographic tie-break, same
    left-to-right fold — the emitted merge rules must be identical on
    both test SFs."""
    from quantms_utils_spark.operators.text import bpe_merges
    from quantms_utils_spark.queries.textops import bpe_merge_rules
    from quantms_utils_spark.tables import load

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        d = load(spark, sf_dir, "documents")
        eager = sorted(
            tuple(r) for r in bpe_merges(d, "text", n_merges=3).collect()
        )
        lazy = sorted(
            tuple(r) for r in bpe_merge_rules(spark, sf_dir).collect()
        )
        assert lazy == eager, (sf_dir, lazy, eager)
