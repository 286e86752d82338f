"""Structured Streaming tests: file-source micro-batches with watermarked
windows, checked against the identical batch computation."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from quantms_utils_spark.streaming import (
    hourly_event_aggregate,
    read_event_stream,
    sessionize_stateful,
    stream_dedup_events,
    stream_purchase_click_join,
    stream_quality_filter,
)


@pytest.fixture()
def event_files(spark, tmp_path):
    """Three micro-batch files of JSON events across three hours."""
    src = tmp_path / "stream_src"
    src.mkdir()
    rows = []
    for hour in range(3):
        batch = [
            {
                "event_id": hour * 100 + i,
                "ts": f"2024-01-01T{hour:02d}:{i % 60:02d}:00.000Z",
                "user_id": i % 5,
                "event_type": "purchase" if i % 2 == 0 else "view",
                "value": float(10 * (i + 1)),
                "props": json.dumps({"k": i}),
            }
            for i in range(10)
        ]
        (src / f"batch_{hour}.json").write_text(
            "\n".join(json.dumps(r) for r in batch)
        )
        rows.extend(batch)
    return str(src), rows


def _run_stream_to_memory(df, name):
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if not df.isStreaming or True else "complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return query


def test_streaming_hourly_agg_matches_batch(spark, event_files):
    path, _ = event_files
    stream = read_event_stream(spark, path)
    assert stream.isStreaming

    agg = hourly_event_aggregate(stream)
    query = (
        agg.writeStream.format("memory")
        .queryName("hourly_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    query.stop()
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM hourly_agg").collect()
    }

    batch = spark.read.schema(stream.schema).json(path)
    expected = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_event_aggregate(batch).collect()
    }
    assert got == expected
    assert len(got) == 6  # 3 hours × 2 event types


def test_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState gap-sessionizer: three hourly batches delivered
    IN ORDER (one query restart per file against the same checkpoint, so the
    state store carries over), 30-min gap → each user's hour-0 and hour-1
    sessions close when the next hour's batch arrives; hour-2 sessions stay
    open in state (watermark never passes their timeout in the test data)."""
    import json as _json

    src = tmp_path / "stream_src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    collected = []

    for hour in range(3):
        batch = [
            {
                "event_id": hour * 100 + i,
                "ts": f"2024-01-01T{hour:02d}:{i % 60:02d}:00.000Z",
                "user_id": i % 5,
                "event_type": "purchase" if i % 2 == 0 else "view",
                "value": float(10 * (i + 1)),
                "props": _json.dumps({"k": i}),
            }
            for i in range(10)
        ]
        (src / f"batch_{hour}.json").write_text(
            "\n".join(_json.dumps(r) for r in batch)
        )
        stream = read_event_stream(spark, str(src))
        sessions = sessionize_stateful(stream, gap_seconds=1800)
        query = (
            sessions.writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination(120)
        query.stop()

    got = sorted(
        (r["user_id"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"], r["total_value"])
        for r in collected
    )
    # Expected: per user (0..4), one closed session per hour 0 and 1:
    # events at minutes u and u+5 → n_events=2, value 10*(u+1) + 10*(u+6).
    expected = sorted(
        (
            u,
            f"2024-01-01 {h:02d}:{u:02d}:00",
            f"2024-01-01 {h:02d}:{u + 5:02d}:00",
            2,
            float(10 * (u + 1) + 10 * (u + 6)),
        )
        for u in range(5)
        for h in range(2)
    )
    assert got == expected


def test_stream_stream_join_matches_batch(spark, event_files):
    """Watermarked stream-stream join (purchases × prior-hour clicks) must
    produce exactly the batch join's rows once all data is processed."""
    path, _ = event_files
    stream = read_event_stream(spark, path)
    joined = stream_purchase_click_join(stream, right_type="view")
    assert joined.isStreaming
    query = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    query.stop()
    got = sorted(
        map(tuple, spark.sql(
            "SELECT purchase_id, click_id FROM ss_join"
        ).collect())
    )

    batch = spark.read.schema(stream.schema).json(path)
    expected = sorted(
        map(tuple, stream_purchase_click_join(batch, right_type="view")
            .select("purchase_id", "click_id").collect())
    )
    assert got == expected
    assert len(got) > 0


def test_stream_dedup_events(spark, tmp_path):
    """Duplicate event_ids delivered across micro-batches are emitted once;
    watermark bounds the dedup state."""
    import json as _json

    src = tmp_path / "dedup_src"
    src.mkdir()
    # two files, each containing ids 0..9 (file 2 is a full replay of file 1
    # plus new ids 10..14)
    for fidx, ids in enumerate([range(10), list(range(10)) + list(range(10, 15))]):
        rows = [
            {
                "event_id": i,
                "ts": f"2024-01-01T00:{i % 60:02d}:00.000Z",
                "user_id": i % 3,
                "event_type": "view",
                "value": 1.0,
                "props": "{}",
            }
            for i in ids
        ]
        (src / f"f{fidx}.json").write_text("\n".join(_json.dumps(r) for r in rows))

    deduped = stream_dedup_events(read_event_stream(spark, str(src)))
    query = (
        deduped.writeStream.format("memory")
        .queryName("dedup_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    query.stop()
    got = [r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_events").collect()]
    assert sorted(got) == list(range(15))

    # batch twin
    batch = spark.read.schema(read_event_stream(spark, str(src)).schema).json(str(src))
    assert stream_dedup_events(batch).count() == 15


def test_stream_quality_filter(spark, event_files):
    path, rows = event_files
    stream = stream_quality_filter(read_event_stream(spark, path), min_value=50.0)
    query = (
        stream.writeStream.format("memory")
        .queryName("filtered")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    query.stop()
    got = spark.sql("SELECT * FROM filtered").collect()
    expected_n = sum(1 for r in rows if r["value"] > 50.0)
    assert len(got) == expected_n
    assert all(r["k"] is not None for r in got)


def test_stream_static_classify_matches_batch(spark, tmp_path):
    """Stream-static join: arriving docs classified against the standing
    corpus' fingerprint table; streaming result must equal the batch twin."""
    import json

    from quantms_utils_spark.streaming.events import stream_classify_against_corpus

    corpus = spark.createDataFrame(
        [(1, "known doc alpha beta"), (2, "known doc gamma delta")],
        "doc_id long, text string",
    )
    arriving = [
        {"doc_id": 10, "text": "  Known DOC alpha   beta "},  # exact dup of 1
        {"doc_id": 11, "text": "entirely new content"},
        {"doc_id": 12, "text": "known doc gamma delta"},      # exact dup of 2
    ]
    path = tmp_path / "landing"
    path.mkdir()
    (path / "b0.json").write_text("\n".join(json.dumps(r) for r in arriving))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .json(str(path))
    )
    out = stream_classify_against_corpus(stream, corpus)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("classified")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in spark.sql("SELECT * FROM classified").collect()
    }
    batch = spark.read.schema("doc_id long, text string").json(str(path))
    want = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in stream_classify_against_corpus(batch, corpus).collect()
    }
    assert got == want
    assert got[10] == ("exact_dup", 1)
    assert got[11] == ("new", None)
    assert got[12] == ("exact_dup", 2)


# --- continuous ingest: foreachBatch classify-and-grow -----------------------


def test_continuous_ingest_grows_corpus_across_runs(spark, tmp_path):
    """Two availableNow drains with a shared checkpoint: batch-2 duplicates
    of batch-1 documents must classify as exact_dup against the corpus the
    first run grew."""
    import json

    from quantms_utils_spark.streaming.curation import start_continuous_ingest

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        with open(in_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .json(str(in_dir))
        )
        q = start_continuous_ingest(
            stream,
            corpus_dir=corpus_dir,
            out_dir=out_dir,
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    land(
        "batch1.json",
        [
            {"doc_id": 1, "text": "alpha beta gamma"},
            {"doc_id": 2, "text": "delta epsilon zeta"},
            {"doc_id": 3, "text": "Alpha  beta   GAMMA"},  # in-batch dup of 1
        ],
    )
    drain()
    first = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in spark.read.parquet(out_dir + "/epoch=*").collect()
    }
    assert first[1] == ("new", None)
    assert first[2] == ("new", None)
    assert first[3] == ("batch_dup", 1)

    land(
        "batch2.json",
        [
            {"doc_id": 10, "text": "alpha beta gamma"},   # dup of standing 1
            {"doc_id": 11, "text": "eta theta iota"},     # genuinely new
        ],
    )
    drain()
    out = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in spark.read.parquet(out_dir + "/epoch=*").collect()
    }
    assert out[10] == ("exact_dup", 1)
    assert out[11] == ("new", None)
    # the standing corpus now holds exactly the three distinct fingerprints
    fps = spark.read.parquet(corpus_dir + "/epoch=*")
    assert fps.count() == 3
    assert {r["match_id"] for r in fps.collect()} == {1, 2, 11}


def test_classify_and_grow_replay_is_idempotent(spark, tmp_path):
    """At-least-once retry of an epoch AFTER its corpus write landed must
    reproduce the original classifications and leave the standing corpus
    intact (the epoch's own fingerprints are invisible to its replay)."""
    from quantms_utils_spark.streaming.curation import classify_and_grow

    corpus_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(10, "alpha beta"), (11, "epsilon zeta")], "doc_id long, text string"
    )
    classify_and_grow(b0, 0, corpus_dir=corpus_dir, out_dir=out_dir)
    classify_and_grow(b1, 1, corpus_dir=corpus_dir, out_dir=out_dir)

    def state():
        out = sorted(
            (r["doc_id"], r["status"], r["match_id"])
            for r in spark.read.parquet(out_dir + "/epoch=*").collect()
        )
        corpus = sorted(
            r["match_id"]
            for r in spark.read.parquet(corpus_dir + "/epoch=*").collect()
        )
        return out, corpus

    before = state()
    # replay epoch 1 (both its writes already succeeded)
    classify_and_grow(b1, 1, corpus_dir=corpus_dir, out_dir=out_dir)
    assert state() == before
    out, corpus = state()
    assert (10, "exact_dup", 1) in out
    assert corpus == [1, 2, 11]


def test_classify_and_grow_string_ids(spark, tmp_path):
    """Non-numeric document ids keep their native type (no silent cast)."""
    from quantms_utils_spark.streaming.curation import classify_and_grow

    corpus_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    batch = spark.createDataFrame(
        [
            ("doc-a", "alpha beta"),
            ("doc-b", "gamma delta"),
            ("doc-c", "ALPHA   beta"),  # in-batch dup of doc-a
        ],
        "doc_id string, text string",
    )
    classify_and_grow(batch, 0, corpus_dir=corpus_dir, out_dir=out_dir)
    got = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in spark.read.parquet(out_dir + "/epoch=0").collect()
    }
    assert got["doc-a"] == ("new", None)
    assert got["doc-b"] == ("new", None)
    assert got["doc-c"] == ("batch_dup", "doc-a")


# --- continuous CDC: foreachBatch diff-and-apply ------------------------------


def test_continuous_diff_classifies_upserts_across_runs(spark, tmp_path):
    """Two availableNow drains: the second batch's rows classify against
    the state the first drain recorded — unchanged rows emit nothing,
    changed rows emit 'updated', new keys 'inserted'."""
    import json

    from quantms_utils_spark.streaming.diff import start_continuous_diff

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        with open(in_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def drain():
        stream = (
            spark.readStream.schema("k long, v string, n double")
            .json(str(in_dir))
        )
        q = start_continuous_diff(
            stream, keys=["k"], state_dir=state_dir,
            out_dir=out_dir, checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    land("b1.json", [
        {"k": 1, "v": "a", "n": 1.0},
        {"k": 2, "v": "b", "n": 2.0},
        {"k": 2, "v": "b2", "n": 2.5},  # in-batch upsert: last wins
    ])
    drain()
    first = {
        r["k"]: (r["status"], r["v"])
        for r in spark.read.parquet(out_dir + "/epoch=*").collect()
    }
    assert first == {1: ("inserted", "a"), 2: ("inserted", "b2")}

    land("b2.json", [
        {"k": 1, "v": "a", "n": 1.0},    # unchanged -> no output
        {"k": 2, "v": "B", "n": 2.5},    # updated
        {"k": 3, "v": "c", "n": 3.0},    # inserted
    ])
    drain()
    out = {
        (r["k"], r["status"])
        for r in spark.read.parquet(out_dir + "/epoch=*").collect()
    }
    assert (1, "inserted") in out and (2, "inserted") in out  # epoch 0 kept
    assert (2, "updated") in out and (3, "inserted") in out
    assert (1, "updated") not in out  # unchanged row emitted nothing


def test_continuous_diff_replay_is_idempotent(spark, tmp_path):
    from quantms_utils_spark.streaming.diff import diff_and_apply

    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b1 = spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string")
    diff_and_apply(b0, 0, keys=["k"], state_dir=state_dir, out_dir=out_dir)
    diff_and_apply(b1, 1, keys=["k"], state_dir=state_dir, out_dir=out_dir)

    def state():
        out = sorted(
            (r["k"], r["status"])
            for r in spark.read.parquet(out_dir + "/epoch=*").collect()
        )
        st = sorted(
            (r["k"], r["epoch"])
            for r in spark.read.parquet(state_dir + "/epoch=*").collect()
        )
        return out, st

    before = state()
    diff_and_apply(b1, 1, keys=["k"], state_dir=state_dir, out_dir=out_dir)
    assert state() == before
    out, _ = state()
    assert out == [(1, "inserted"), (2, "inserted"), (2, "updated"),
                   (3, "inserted")]


def test_continuous_sketch_merges_across_runs(spark, tmp_path):
    """Two availableNow drains of a token stream: the standing merged CMS
    must estimate >= exact for every token over the UNION of both drains —
    i.e. per-epoch cell tables really merge by cell-wise addition."""
    import json
    from collections import Counter

    from quantms_utils_spark.streaming.sketches import (
        merged_sketch,
        standing_estimates,
        start_continuous_sketch,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    state_dir = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    depth, width = 3, 64

    def land(name, toks):
        with open(in_dir / name, "w") as f:
            for t in toks:
                f.write(json.dumps({"tok": t}) + "\n")

    def drain():
        stream = spark.readStream.schema("tok string").json(str(in_dir))
        q = start_continuous_sketch(
            stream, token_col="tok", depth=depth, width=width,
            state_dir=state_dir, checkpoint_dir=ckpt,
        )
        q.awaitTermination(120)

    batch1 = ["a"] * 10 + ["b"] * 5 + ["c"]
    batch2 = ["a"] * 7 + ["d"] * 3
    land("b1.json", batch1)
    drain()
    land("b2.json", batch2)
    drain()

    # standing sketch stays bounded by depth x width
    merged = merged_sketch(spark, state_dir)
    assert merged.count() <= depth * width

    exact = Counter(batch1 + batch2)
    probes = spark.createDataFrame([(t,) for t in exact], "tok string")
    est = {
        r["tok"]: r["cms_est"]
        for r in standing_estimates(
            spark, state_dir, probes, "tok", depth, width
        ).collect()
    }
    for tok, cnt in exact.items():
        assert est[tok] >= cnt  # merged estimate covers the union counts
    # sketch row-count totals equal the full stream per hash row
    per_row = (
        merged.groupBy("cms_row").agg(F.sum("cms_cnt").alias("n")).collect()
    )
    assert all(r["n"] == len(batch1) + len(batch2) for r in per_row)


def test_continuous_drift_matches_batch_psi(spark, tmp_path):
    """Two availableNow drains of a value stream: the standing bin counts
    must equal the exact union counts, and the streaming drift report must
    equal the batch PSI computed over the same rows (the batch twin) —
    per-epoch count tables really merge by addition."""
    import json

    from quantms_utils_spark.operators.ml import population_stability
    from quantms_utils_spark.streaming.drift import (
        drift_report,
        standing_bins,
        start_continuous_drift,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    state_dir = str(tmp_path / "bins")
    ckpt = str(tmp_path / "ckpt")

    def land(name, bins):
        with open(in_dir / name, "w") as f:
            for b in bins:
                f.write(json.dumps({"bin": b}) + "\n")

    def drain():
        stream = spark.readStream.schema("bin long").json(str(in_dir))
        q = start_continuous_drift(
            stream, bin_col="bin", state_dir=state_dir, checkpoint_dir=ckpt
        )
        q.awaitTermination(120)

    batch1 = [0] * 10 + [1] * 5
    batch2 = [0] * 2 + [2] * 3
    land("b1.json", batch1)
    drain()
    land("b2.json", batch2)
    drain()

    standing = {
        r["bin"]: r["n"] for r in standing_bins(spark, state_dir).collect()
    }
    assert standing == {0: 12, 1: 5, 2: 3}

    baseline_rows = [0] * 10 + [1] * 8 + [2] * 2
    baseline = (
        spark.createDataFrame([(b,) for b in baseline_rows], "bin long")
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    streamed = {
        r["bin"]: r["psi_term"]
        for r in drift_report(spark, state_dir, baseline).collect()
    }
    stream_rows = spark.createDataFrame(
        [(b,) for b in batch1 + batch2], "bin long"
    )
    base_rows_df = spark.createDataFrame(
        [(b,) for b in baseline_rows], "bin long"
    )
    twin = {
        r["bin"]: r["psi_term"]
        for r in population_stability(stream_rows, base_rows_df).collect()
    }
    assert set(streamed) == set(twin)
    for k in twin:
        assert abs(streamed[k] - twin[k]) < 1e-12


def test_session_window_stream_matches_batch(spark, event_files):
    """Native session_window aggregation: the drained stream (complete
    mode, availableNow) must equal the batch run of the SAME operator on
    the same files — the declarative sibling of the stateful sessionizer
    parity, exercising Spark's built-in session state store."""
    from quantms_utils_spark.streaming.events import sessionize_session_window

    path, _ = event_files
    stream = read_event_stream(spark, path)
    df = sessionize_session_window(stream)
    query = (
        df.writeStream.format("memory")
        .queryName("sess_native")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    query.stop()
    got = {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]),
            r["n_events"],
            r["total_value"],
        )
        for r in spark.sql("SELECT * FROM sess_native").collect()
    }
    batch = spark.read.schema(stream.schema).json(path)
    expected = {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]),
            r["n_events"],
            r["total_value"],
        )
        for r in sessionize_session_window(batch).collect()
    }
    assert got == expected
    # 5 users x 3 hourly bursts, 30-min gap -> 3 sessions per user
    assert len(got) == 15


def _have_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _have_protobuf(),
    reason="transformWithStateInPandas needs protobuf (state-server protocol); "
    "not installed in this environment",
)
def test_transform_with_state_running_totals(spark, event_files):
    """transformWithStateInPandas (stateful v2): drained stream's FINAL
    per-user emission equals the batch groupBy on the same files — the
    ValueState fold carries across micro-batches (maxFilesPerTrigger=1
    forces three batches)."""
    from quantms_utils_spark.streaming.events import running_user_totals

    path, _ = event_files
    stream = read_event_stream(spark, path)
    df = running_user_totals(stream)
    query = (
        df.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    query.stop()
    # update mode appends one row per (user, batch); the final state is the
    # row with the max n_events (counts are monotone)
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in spark.sql(
            """
            SELECT user_id, max_by(n_events, n_events) AS n_events,
                   max_by(total_value, n_events) AS total_value
            FROM running_totals GROUP BY user_id
            """
        ).collect()
    }
    batch = spark.read.schema(stream.schema).json(path)
    expected = {
        r["user_id"]: (r["n"], round(r["tv"], 6))
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tv"),
        )
        .collect()
    }
    assert got == expected and len(got) == 5


def test_detect_journeys_matches_batch_regex(spark, tmp_path):
    """Streaming CEP (DFA in applyInPandasWithState state) == batch regex
    scan: three in-order batches per user carry interleaved
    view/click/purchase traffic, including journeys that SPAN batch
    boundaries (v in batch 0, c in batch 1, p in batch 2) — the case that
    proves the two-int DFA state really replaces the full event string.
    Ground truth is the batch twin's exact expression: regexp_count over
    the (ts, event_id)-ordered initial-letter string."""
    import json as _json

    from quantms_utils_spark.streaming.events import (
        detect_journeys_stateful,
        read_event_stream,
    )

    src = tmp_path / "journey_src"
    src.mkdir()
    ckpt = str(tmp_path / "journey_ckpt")

    # user 0: one journey per batch (v,c,p inside each batch)
    # user 1: ONE journey spanning the three batches (v | c | p)
    # user 2: broken by an intervening purchase (v | p c | p) -> 0 then
    #         the trailing "c p" without a v stays 0
    # user 3: noise only -> never emitted by the batch filter, streamed n=0
    per_batch = {
        0: {0: ["view", "click", "purchase"], 1: ["view"], 2: ["view"], 3: ["signup"]},
        1: {0: ["view", "click", "purchase"], 1: ["click"], 2: ["purchase", "click"], 3: ["error"]},
        2: {0: ["view", "click", "purchase"], 1: ["purchase"], 2: ["purchase"], 3: ["signup"]},
    }
    eid = 0
    last = {}
    for b in range(3):
        rows = []
        for u, types in per_batch[b].items():
            for i, et in enumerate(types):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": f"2024-01-01T{b:02d}:{i:02d}:00.000Z",
                        "user_id": u,
                        "event_type": et,
                        "value": 1.0,
                        "props": "{}",
                    }
                )
                eid += 1
        (src / f"batch_{b}.json").write_text(
            "\n".join(_json.dumps(r) for r in rows)
        )
        stream = read_event_stream(spark, str(src))
        q = (
            detect_journeys_stateful(stream)
            .writeStream.foreachBatch(
                lambda df, _id: last.update(
                    {r["user_id"]: r["n_journeys"] for r in df.collect()}
                )
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    batch = (
        spark.read.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .json(str(src))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id",
                                     F.substring("event_type", 1, 1).alias("c"))
                        )
                    ),
                    lambda x: x["c"],
                ),
                "",
            ).alias("journey")
        )
        .select(
            "user_id",
            F.regexp_count("journey", F.lit("v[^p]*c[^p]*p")).alias("n"),
        )
    )
    expected = {r["user_id"]: r["n"] for r in batch.collect()}
    assert last == expected
    # the hand-audited truth: 3 per-batch journeys, 1 spanning journey,
    # 0 for the broken and noise users
    assert expected == {0: 3, 1: 1, 2: 0, 3: 0}


def test_continuous_index_partition_pruned_probe(spark, tmp_path):
    """Streaming IVF ingest: two drained batches grow a cid-partitioned
    index; (1) assignments equal the batch expression over the union,
    (2) a 2-cluster probe scan reads ONLY those clusters' files — the
    partition-pruning contract the 100 TB probe relies on."""
    import json as _json

    from pyspark.sql import functions as F

    from quantms_utils_spark.streaming.similarity import (
        assign_stream,
        read_embedding_stream,
        start_continuous_index,
    )

    centroids = [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [0.0, 10.0])]
    src = tmp_path / "emb_src"
    src.mkdir()
    idx = str(tmp_path / "ivf_index")
    ckpt = str(tmp_path / "ivf_ckpt")

    def rows(batch):
        out = []
        for i in range(30):
            vid = batch * 100 + i
            base = centroids[i % 3][1]
            out.append(
                {
                    "vec_id": vid,
                    "embedding": [base[0] + (i % 5) * 0.1, base[1] + 0.05 * i],
                    "label": f"b{batch}",
                }
            )
        return out

    for b in range(2):
        (src / f"shard_{b}.json").write_text(
            "\n".join(_json.dumps(r) for r in rows(b))
        )
        q = start_continuous_index(
            read_embedding_stream(spark, str(src)), centroids, idx, ckpt
        )
        q.awaitTermination(120)
        q.stop()

    back = spark.read.parquet(idx)
    assert back.count() == 60
    # (1) streamed assignments == batch assignments on the same rows
    batch_df = spark.read.schema(
        "vec_id long, embedding array<double>, label string"
    ).json(str(src))
    expect = {
        (r["vec_id"], r["cid"])
        for r in assign_stream(batch_df, centroids).collect()
    }
    got = {(r["vec_id"], r["cid"]) for r in back.select("vec_id", "cid").collect()}
    assert got == expect
    # (2) probing 2 of 3 clusters is PARTITION PRUNING: the scan's
    # PartitionFilters carry the cid predicate (inputFiles() lists the
    # base relation pre-pruning, so the plan is the authoritative check)
    probe = back.filter(F.col("cid").isin(0, 2))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    import re as _re
    pf = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "cid" in pf.group(1), plan[:800]
    assert probe.count() == len([1 for _, c in expect if c in (0, 2)])


def test_attribution_stream_matches_batch_window(spark, event_files, tmp_path):
    """Streaming last-touch attribution (state = one carried channel per
    user) drained over the shared event files must aggregate to exactly
    the batch window query's per-channel totals — including purchases
    whose channel was set in an earlier micro-batch."""
    from quantms_utils_spark.streaming.events import (
        attribute_purchases_stateful,
        read_event_stream,
    )

    src, _rows = event_files
    collected = []
    stream = read_event_stream(spark, src)
    q = (
        attribute_purchases_stateful(stream)
        .writeStream.foreachBatch(
            lambda df, _id: collected.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "attr_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    got = {}
    for r in collected:
        c = got.setdefault(r["channel"], [0, 0.0])
        c[0] += 1
        c[1] += r["value"]
    batch = (
        spark.read.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .json(src)
    )
    from pyspark.sql import Window
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    channel = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    expect = {
        r["channel"]: (r["n"], r["total"])
        for r in batch.withColumn("channel", channel)
        .filter((F.col("event_type") == "purchase") & F.col("channel").isNotNull())
        .groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(got) == set(expect)
    for ch, (n, tot) in expect.items():
        assert got[ch][0] == n
        assert abs(got[ch][1] - tot) < 1e-6


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Late-data semantics pinned explicitly: with a 1-hour watermark and
    APPEND output, a row arriving in a later micro-batch whose event time
    sits more than an hour behind the stream's max event time must NOT
    resurrect its already-finalized window — the dropped-late-row path the
    complete-mode parity tests never exercise. A second late-but-within-
    watermark row (30 min behind) must still count."""
    import json as _json

    from quantms_utils_spark.streaming.events import (
        hourly_event_aggregate,
        read_event_stream,
    )

    src = tmp_path / "late_src"
    src.mkdir()
    ckpt = str(tmp_path / "late_ckpt")
    collected = []

    def drain():
        stream = read_event_stream(spark, str(src))
        q = (
            hourly_event_aggregate(stream, watermark="1 hour")
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    def write(name, rows):
        (src / name).write_text("\n".join(_json.dumps(r) for r in rows))

    def ev(eid, ts, etype="view", val=10.0):
        return {
            "event_id": eid, "ts": ts, "user_id": 1,
            "event_type": etype, "value": val, "props": "{}",
        }

    # batch 0: hour-10 traffic; batch 1: hour-13 traffic advances the
    # watermark to 12:00, finalizing every window before it
    write("b0.json", [ev(1, "2024-01-01T10:05:00.000Z"),
                      ev(2, "2024-01-01T10:20:00.000Z")])
    drain()
    write("b1.json", [ev(3, "2024-01-01T13:00:00.000Z"),
                      ev(4, "2024-01-01T13:10:00.000Z")])
    drain()
    # batch 2: one hopeless straggler (hour 10 — 3h late, beyond the
    # watermark) and one viable late row (12:40, within the hour)
    write("b2.json", [ev(5, "2024-01-01T10:30:00.000Z"),
                      ev(6, "2024-01-01T12:40:00.000Z")])
    drain()
    # batch 3: advance event time so every remaining window finalizes
    write("b3.json", [ev(7, "2024-01-01T16:00:00.000Z")])
    drain()

    got = {
        str(r["window_start"]): r["n_events"]
        for r in collected
        if r["event_type"] == "view"
    }
    # hour-10 window emitted with the ORIGINAL two rows only — the
    # straggler was dropped, not merged and not re-emitted
    assert got.get("2024-01-01 10:00:00") == 2
    # the within-watermark late row made it into its window
    assert got.get("2024-01-01 12:00:00") == 1
    assert got.get("2024-01-01 13:00:00") == 2


def test_journey_dfa_equals_regex_on_random_sequences():
    """Property: on ANY sequence over the event alphabet, the resumable
    3-state DFA counts exactly the regex's leftmost non-overlapping
    matches — and slicing the sequence at EVERY split point and resuming
    the fold gives the same count (the micro-batch boundary property the
    streaming operator depends on)."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from quantms_utils_spark.streaming.events import journey_dfa_fold

    pat = re.compile("v[^p]*c[^p]*p")
    alphabet = st.sampled_from("vcpse")

    @settings(max_examples=300, deadline=None)
    @given(st.lists(alphabet, max_size=60), st.integers(min_value=0, max_value=60))
    def prop(chars, cut):
        s = "".join(chars)
        expected = len(pat.findall(s))
        _, n = journey_dfa_fold(s)
        assert n == expected
        cut = min(cut, len(s))
        phase, n1 = journey_dfa_fold(s[:cut])
        _, n2 = journey_dfa_fold(s[cut:], phase, n1)
        assert n2 == expected

    prop()


def test_sessionizer_under_rocksdb_state_store(spark, tmp_path):
    """The applyInPandasWithState sessionizer runs unchanged under the
    RocksDB state-store provider — the production backend once state
    outgrows the default in-memory/HDFS provider (per-key state spills
    to local SST files instead of executor heap). Same three-batch
    in-order scenario as the default-provider test; identical sessions
    must emerge from the RocksDB-backed run."""
    import json as _json

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "rocks_src"
        src.mkdir()
        ckpt = str(tmp_path / "rocks_ckpt")
        collected = []
        for hour in range(3):
            batch = [
                {
                    "event_id": hour * 100 + i,
                    "ts": f"2024-01-01T{hour:02d}:{i % 60:02d}:00.000Z",
                    "user_id": i % 5,
                    "event_type": "view",
                    "value": 1.0,
                    "props": "{}",
                }
                for i in range(10)
            ]
            (src / f"b{hour}.json").write_text(
                "\n".join(_json.dumps(r) for r in batch)
            )
            stream = read_event_stream(spark, str(src))
            q = (
                sessionize_stateful(stream, gap_seconds=1800)
                .writeStream.foreachBatch(
                    lambda df, _id: collected.extend(df.collect())
                )
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()
        got = sorted(
            (r["user_id"], str(r["session_start"]), r["n_events"])
            for r in collected
        )
        expected = sorted(
            (u, f"2024-01-01 {h:02d}:{u:02d}:00", 2)
            for u in range(5)
            for h in range(2)
        )
        assert got == expected
    finally:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", prev
        )


def test_stream_stream_left_outer_emits_null_after_watermark(spark, tmp_path):
    """Outer stream-stream join semantics: a purchase with NO click in
    its lookback window must eventually emit with NULL click columns —
    but only after the watermark passes the window (the engine cannot
    rule out a late click before that). Matched purchases emit normally."""
    import json as _json

    from quantms_utils_spark.streaming.events import (
        read_event_stream,
        stream_purchase_click_join,
    )

    src = tmp_path / "oj_src"
    src.mkdir()
    ckpt = str(tmp_path / "oj_ckpt")
    collected = []

    def ev(eid, ts, etype, uid=1):
        return {
            "event_id": eid, "ts": ts, "user_id": uid,
            "event_type": etype, "value": 1.0, "props": "{}",
        }

    def drain():
        stream = read_event_stream(spark, str(src))
        q = (
            stream_purchase_click_join(
                stream, watermark="30 minutes", how="leftOuter"
            )
            .writeStream.foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    # user 1's purchase matches its click; user 2's purchase has no click at all
    (src / "b0.json").write_text("\n".join(_json.dumps(r) for r in [
        ev(1, "2024-01-01T10:00:00.000Z", "click"),
        ev(10, "2024-01-01T10:05:00.000Z", "purchase"),
        ev(11, "2024-01-01T10:10:00.000Z", "purchase", uid=2),
    ]))
    drain()
    # Advance BOTH sides' watermarks (the global watermark is their min,
    # and each side's node only sees its own event type — a "view" row
    # would be filtered out before the watermark node and advance
    # nothing), then one more batch: the outer NULL flush happens on the
    # trigger AFTER the watermark advanced, and a file source runs no
    # batch without new data.
    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in [
        ev(98, "2024-01-01T14:00:00.000Z", "click", uid=3),
        ev(99, "2024-01-01T14:00:00.000Z", "purchase", uid=3),
    ]))
    drain()
    (src / "b2.json").write_text("\n".join(_json.dumps(r) for r in [
        ev(100, "2024-01-01T15:00:00.000Z", "click", uid=3),
        ev(101, "2024-01-01T15:00:00.000Z", "purchase", uid=3),
    ]))
    drain()

    rows = {r["purchase_id"]: r["click_id"] for r in collected}
    assert rows.get(10) == 1          # matched within the hour
    assert 11 in rows and rows[11] is None  # flushed as NULL after watermark


def test_stream_dedup_state_expiry_readmits(spark, tmp_path):
    """The OTHER half of dropDuplicatesWithinWatermark's contract: dedup
    state is bounded BY EVICTION, so a duplicate re-delivered after the
    watermark passed (first_ts + horizon) is re-admitted — the id is
    emitted AGAIN. This is why the operator is 'within watermark', not a
    global dedup: at 100 TB the bounded state is the point, and any
    consumer needing global uniqueness must idempotent-merge downstream
    (e.g. the MERGE sink), which this pin documents."""
    import json as _json

    src = tmp_path / "expiry_src"
    src.mkdir()
    ckpt = str(tmp_path / "expiry_ckpt")

    def _write(fname, rows):
        (src / fname).write_text(
            "\n".join(
                _json.dumps(
                    {
                        "event_id": i,
                        "ts": ts,
                        "user_id": 0,
                        "event_type": "view",
                        "value": 1.0,
                        "props": "{}",
                    }
                )
                for i, ts in rows
            )
        )

    emitted: list[int] = []

    def _run():
        deduped = stream_dedup_events(
            read_event_stream(spark, str(src)), watermark="10 minutes"
        )
        # memory sink can't recover from a checkpoint; foreachBatch can
        q = (
            deduped.writeStream.foreachBatch(
                lambda bdf, _id: emitted.extend(
                    r["event_id"] for r in bdf.select("event_id").collect()
                )
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return list(emitted)

    # run 1: id=1 at 00:00, id=2 at 00:30 → watermark advances to 00:20,
    # evicting id=1's state (00:00 + 10 min < 00:20)
    _write(
        "b1.json",
        [(1, "2024-01-01T00:00:00.000Z"), (2, "2024-01-01T00:30:00.000Z")],
    )
    first = _run()
    assert sorted(first) == [1, 2]

    # run 2 (same checkpoint): id=1 re-delivered at 00:25 — AFTER its
    # state expired → re-admitted; id=2 re-delivered at 00:31 — state
    # still live (00:30 + 10 min > 00:20) → still dropped
    _write(
        "b2.json",
        [(1, "2024-01-01T00:25:00.000Z"), (2, "2024-01-01T00:31:00.000Z")],
    )
    both = _run()
    assert sorted(both) == [1, 1, 2]


def test_continuous_near_ingest_classifies_near_dups(spark, tmp_path):
    """Near-dup-aware classify-and-grow: run 2 must classify a small edit
    of a STANDING document as near_dup with the right match id, while an
    exact replay stays exact_dup and novel text stays new; only new
    keepers grow the standing signature/text state."""
    import json

    from quantms_utils_spark.streaming.curation import (
        start_continuous_near_ingest,
    )

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    corpus_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"

    def land(name, rows):
        with open(in_dir / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .json(str(in_dir))
        )
        q = start_continuous_near_ingest(
            stream,
            corpus_dir=corpus_dir,
            out_dir=out_dir,
            checkpoint_dir=ckpt,
            threshold=0.3,
        )
        q.awaitTermination(120)

    land(
        "b1.json",
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": "completely different content here entirely"},
        ],
    )
    drain()
    first = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(out_dir + "/epoch=*").collect()
    }
    assert first == {1: "new", 2: "new"}

    land(
        "b2.json",
        [
            {"doc_id": 10, "text": base},  # exact dup of standing 1
            {"doc_id": 11, "text": near},  # near dup of standing 1
            {"doc_id": 12, "text": "novel words nobody wrote before today"},
        ],
    )
    drain()
    out = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in spark.read.parquet(out_dir + "/epoch=*").collect()
        if r["doc_id"] >= 10
    }
    assert out[10] == ("exact_dup", 1)
    assert out[11][0] == "near_dup" and out[11][1] == 1
    assert out[12] == ("new", None)
    # standing state grew by exactly the new keepers (1, 2, 12)
    texts = spark.read.parquet(corpus_dir + "/texts/epoch=*")
    assert {r["doc_id"] for r in texts.collect()} == {1, 2, 12}


# --- continuous manifest maintenance: land + zone/bloom per epoch ------------


class TestManifestMaintainedIngest:
    def _land(self, tmp_path, rows_by_file):
        import json

        in_dir = tmp_path / "landing"
        in_dir.mkdir(exist_ok=True)
        for name, rows in rows_by_file.items():
            (in_dir / name).write_text(
                "\n".join(json.dumps(r) for r in rows)
            )
        return in_dir

    def test_drain_builds_table_and_both_manifests(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from quantms_utils_spark.operators.layout import (
            bloom_pruned_read,
            zone_pruned_read,
        )
        from quantms_utils_spark.streaming.layout import (
            current_bloom_manifest,
            current_zone_manifest,
            start_manifest_maintained_ingest,
        )

        in_dir = self._land(
            tmp_path,
            {
                "b0.json": [
                    {"k": i, "tag": f"t{i % 4}", "v": float(i)}
                    for i in range(0, 100)
                ],
                "b1.json": [
                    {"k": i, "tag": f"t{i % 4}", "v": float(i)}
                    for i in range(100, 200)
                ],
                "b2.json": [
                    {"k": i, "tag": f"t{i % 4}", "v": float(i)}
                    for i in range(200, 300)
                ],
            },
        )
        table_dir = str(tmp_path / "table")
        manifest_dir = str(tmp_path / "manifests")
        stream = (
            spark.readStream.schema("k long, tag string, v double")
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = start_manifest_maintained_ingest(
            stream,
            table_dir=table_dir,
            manifest_dir=manifest_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
            zone_cols=["k"],
            bloom_col="tag",
            m_bits=512,
            k=3,
        )
        q.awaitTermination(180)
        q.stop()

        full = spark.read.parquet(table_dir)
        assert full.count() == 300
        # one manifest row per landed data file, in BOTH manifests
        zm = current_zone_manifest(spark, manifest_dir)
        bm = current_bloom_manifest(spark, manifest_dir)
        n_files = full.select(F.col("_metadata.file_path")).distinct().count()
        assert zm.count() == n_files == bm.count()
        assert int(zm.agg(F.sum("n_rows")).collect()[0][0]) == 300

        # range predicate through the standing zone manifest: exact + skips
        pruned = zone_pruned_read(spark, table_dir, zm, "k", 0, 99)
        got = sorted(
            r["k"]
            for r in pruned.filter(F.col("k").between(0, 99)).collect()
        )
        assert got == list(range(100))
        assert (
            pruned.select(F.col("_metadata.file_path")).distinct().count()
            < n_files
        )

        # equality predicate through the standing bloom manifest: exact
        bp = bloom_pruned_read(
            spark, table_dir, bm, "tag", "t3", m_bits=512, k=3
        )
        assert (
            sorted(r["k"] for r in bp.filter(F.col("tag") == "t3").collect())
            == sorted(
                r["k"] for r in full.filter(F.col("tag") == "t3").collect()
            )
        )

    def test_replay_is_idempotent_and_second_drain_extends(
        self, spark, tmp_path
    ):
        from pyspark.sql import functions as F

        from quantms_utils_spark.streaming.layout import (
            current_zone_manifest,
            land_and_maintain,
            start_manifest_maintained_ingest,
        )

        table_dir = str(tmp_path / "table")
        manifest_dir = str(tmp_path / "manifests")
        ckpt = str(tmp_path / "ckpt")  # ONE checkpoint owns the table
        in_dir = self._land(
            tmp_path,
            {
                "b0.json": [
                    {"k": i, "tag": f"t{i % 3}"} for i in range(50)
                ]
            },
        )

        def drain():
            stream = spark.readStream.schema("k long, tag string").json(
                str(in_dir)
            )
            q = start_manifest_maintained_ingest(
                stream,
                table_dir=table_dir,
                manifest_dir=manifest_dir,
                checkpoint_dir=ckpt,
                zone_cols=["k"],
                bloom_col="tag",
                m_bits=512,
                k=2,
            )
            q.awaitTermination(120)
            q.stop()

        drain()
        zm1 = sorted(
            map(tuple, current_zone_manifest(spark, manifest_dir).collect())
        )
        n_rows_1 = spark.read.parquet(table_dir).count()
        assert n_rows_1 == 50

        # at-least-once REPLAY of the same epoch (the foreachBatch retry
        # shape): everything keys on the epoch id and overwrites in place
        batch = spark.read.schema("k long, tag string").json(str(in_dir))
        land_and_maintain(
            batch,
            0,
            table_dir=table_dir,
            manifest_dir=manifest_dir,
            zone_cols=["k"],
            bloom_col="tag",
            m_bits=512,
            k=2,
        )
        assert spark.read.parquet(table_dir).count() == 50
        zm2 = sorted(
            map(tuple, current_zone_manifest(spark, manifest_dir).collect())
        )
        assert [r[1:] for r in zm1] == [r[1:] for r in zm2]  # same stats

        # a later drain with the SAME checkpoint (epoch numbering continues;
        # a fresh checkpoint would restart at 0 and clobber — the documented
        # one-checkpoint-per-table invariant) extends table + manifests
        self._land(
            tmp_path,
            {"late.json": [{"k": 1000 + i, "tag": "t9"} for i in range(25)]},
        )
        drain()
        assert spark.read.parquet(table_dir).count() == 75
        zm3 = current_zone_manifest(spark, manifest_dir)
        assert int(zm3.agg(F.sum("n_rows")).collect()[0][0]) == 75

    def test_requires_a_manifest_request(self, spark):
        import pytest

        from quantms_utils_spark.streaming.layout import land_and_maintain

        with pytest.raises(ValueError, match="zone_cols and/or bloom_col"):
            land_and_maintain(
                spark.range(1),
                0,
                table_dir="/tmp/x",
                manifest_dir="/tmp/y",
            )


# --- continuous KMV: standing distinct/overlap sketch ------------------------


class TestContinuousKMV:
    def test_streaming_merge_bit_identical_to_batch(self, spark, tmp_path):
        import json

        from pyspark.sql import functions as F

        from quantms_utils_spark.operators.sketches import (
            kmv_distinct_estimate,
            kmv_jaccard,
            kmv_sketch,
        )
        from quantms_utils_spark.streaming.sketches import (
            merged_kmv,
            start_continuous_kmv,
        )

        in_dir = tmp_path / "landing"
        in_dir.mkdir()
        # three files -> three epochs (maxFilesPerTrigger=1); overlapping
        # value ranges across groups
        for i, (name, lo, hi) in enumerate(
            [("b0.json", 0, 400), ("b1.json", 300, 800), ("b2.json", 600, 1200)]
        ):
            (in_dir / name).write_text(
                "\n".join(
                    json.dumps({"g": f"g{v % 2}", "v": v})
                    for v in range(lo, hi)
                )
            )
        state_dir = str(tmp_path / "kmv_state")
        stream = (
            spark.readStream.schema("g string, v long")
            .option("maxFilesPerTrigger", 1)
            .json(str(in_dir))
        )
        q = start_continuous_kmv(
            stream,
            group_cols=["g"],
            value_col="v",
            k=128,
            state_dir=state_dir,
            checkpoint_dir=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)
        q.stop()

        standing = merged_kmv(spark, state_dir, ["g"], k=128)
        batch_all = spark.read.schema("g string, v long").json(str(in_dir))
        direct = kmv_sketch(batch_all, ["g"], "v", k=128)
        a = {r["g"]: r["kmv"] for r in standing.collect()}
        b = {r["g"]: r["kmv"] for r in direct.collect()}
        assert a == b  # streaming merge == one-shot batch sketch, bitwise

        # the standing sketch answers the overlap question
        g0 = standing.filter("g = 'g0'").select(F.col("kmv").alias("a"))
        g1 = standing.filter("g = 'g1'").select(F.col("kmv").alias("b"))
        j = (
            g0.crossJoin(g1)
            .select(kmv_jaccard(F.col("a"), F.col("b"), 128).alias("j"))
            .collect()[0]["j"]
        )
        assert j == 0.0  # g0=evens, g1=odds: DISJOINT value sets, and the
        # sketch must report exactly zero overlap (no false intersection)
        est = standing.select(
            "g", kmv_distinct_estimate(F.col("kmv"), 128).alias("e")
        ).collect()
        for r in est:
            assert abs(r["e"] - 600) <= 600 * 0.25

    def test_empty_state_and_replay(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from quantms_utils_spark.streaming.sketches import kmv_batch, merged_kmv

        state_dir = str(tmp_path / "kmv_state")
        assert merged_kmv(spark, state_dir, ["g"], k=8).count() == 0
        batch = spark.range(0, 100).select(
            F.lit("g").alias("g"), F.col("id").alias("v")
        )
        kmv_batch(batch, 0, group_cols=["g"], value_col="v", k=8, state_dir=state_dir)
        one = merged_kmv(spark, state_dir, ["g"], k=8).collect()[0]["kmv"]
        # at-least-once replay of the same epoch: identical state
        kmv_batch(batch, 0, group_cols=["g"], value_col="v", k=8, state_dir=state_dir)
        assert merged_kmv(spark, state_dir, ["g"], k=8).collect()[0]["kmv"] == one


def test_epoch_slice_manifests_carry_no_identity_columns(spark, tmp_path):
    """Round-9 schema pin: the streaming epoch-slice manifests must NOT
    carry (file_size, file_mtime) — they are epoch-keyed, never
    identity-reconciled, and an mtime column breaks replay
    bit-idempotence (the r8 regression). This pin keeps a batch-side
    schema change from silently leaking back in."""
    from quantms_utils_spark.streaming.layout import (
        current_bloom_manifest,
        current_zone_manifest,
        land_and_maintain,
    )

    table_dir = str(tmp_path / "pin_table")
    manifest_dir = str(tmp_path / "pin_manifests")
    batch = spark.range(20).selectExpr(
        "id as k", "cast(id % 3 as string) as tag"
    )
    land_and_maintain(
        batch, 0, table_dir=table_dir, manifest_dir=manifest_dir,
        zone_cols=["k"], bloom_col="tag", m_bits=512, k=2,
    )
    zm = current_zone_manifest(spark, manifest_dir)
    bm = current_bloom_manifest(spark, manifest_dir)
    for df in (zm, bm):
        assert "file_size" not in df.columns
        assert "file_mtime" not in df.columns
    assert {"file", "n_rows", "k_min", "k_max"} <= set(zm.columns)
    assert {"file", "n_values", "bloom"} <= set(bm.columns)


def test_classify_and_grow_null_text_classifies_new(spark, tmp_path):
    """Round-9 (review finding): a NULL-text document must appear in the
    epoch output classified 'new' — the previous inner keeper-join
    silently dropped it (null fp never equi-matches), diverging from the
    batch twin incremental_dedup's left join. NULL fingerprints also
    stay out of the standing corpus."""
    from quantms_utils_spark.streaming.curation import classify_and_grow

    corpus_dir = str(tmp_path / "corpus")
    out_dir = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "hello world")],
        "doc_id long, text string",
    )
    classify_and_grow(b0, 0, corpus_dir=corpus_dir, out_dir=out_dir)
    got = {
        r["doc_id"]: (r["status"], r["match_id"])
        for r in spark.read.parquet(out_dir + "/epoch=0").collect()
    }
    assert got == {
        1: ("new", None),
        2: ("new", None),          # present, not silently dropped
        3: ("batch_dup", 1),
    }
    fps = spark.read.parquet(corpus_dir + "/epoch=0").collect()
    assert all(r["fp"] is not None for r in fps)  # no junk NULL-fp rows
    assert len(fps) == 1


def test_continuous_diff_null_key_rows_are_first_class(spark, tmp_path):
    """Round-9 (review finding): a NULL key value must flow through the
    CDC loop like any other key — emitted 'inserted' once, then
    'unchanged' (no output) on re-delivery, 'updated' on change. The
    previous equi-joins dropped NULL-key rows entirely."""
    from quantms_utils_spark.streaming.diff import diff_and_apply

    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, "a"), (None, "x")], "k long, v string"
    )
    diff_and_apply(b0, 0, keys=["k"], state_dir=state_dir, out_dir=out_dir)
    out0 = {
        (r["k"], r["v"], r["status"])
        for r in spark.read.parquet(out_dir + "/epoch=0").collect()
    }
    assert out0 == {(1, "a", "inserted"), (None, "x", "inserted")}

    # re-delivery: NULL-key row is unchanged -> no output (it previously
    # either vanished or would re-insert forever)
    b1 = spark.createDataFrame(
        [(None, "x"), (2, "b")], "k long, v string"
    )
    diff_and_apply(b1, 1, keys=["k"], state_dir=state_dir, out_dir=out_dir)
    out1 = {
        (r["k"], r["v"], r["status"])
        for r in spark.read.parquet(out_dir + "/epoch=1").collect()
    }
    assert out1 == {(2, "b", "inserted")}

    # change under the NULL key -> updated
    b2 = spark.createDataFrame([(None, "y")], "k long, v string")
    diff_and_apply(b2, 2, keys=["k"], state_dir=state_dir, out_dir=out_dir)
    out2 = {
        (r["k"], r["v"], r["status"])
        for r in spark.read.parquet(out_dir + "/epoch=2").collect()
    }
    assert out2 == {(None, "y", "updated")}


def test_continuous_diff_state_grows_with_changes_not_keys(spark, tmp_path):
    """Round-9 (review finding): each epoch's state slice holds ONLY the
    changed keys' digests — a re-delivered full snapshot (the common
    CDC-polling shape) must not re-persist the whole key set per epoch,
    or state grows O(total rows ever seen)."""
    from quantms_utils_spark.streaming.diff import diff_and_apply

    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    full = [(i, f"v{i}") for i in range(50)]
    b0 = spark.createDataFrame(full, "k long, v string")
    diff_and_apply(b0, 0, keys=["k"], state_dir=state_dir, out_dir=out_dir)
    assert spark.read.parquet(state_dir + "/epoch=0").count() == 50

    # full snapshot again, ONE row changed
    changed = [(i, "CHANGED" if i == 7 else f"v{i}") for i in range(50)]
    b1 = spark.createDataFrame(changed, "k long, v string")
    diff_and_apply(b1, 1, keys=["k"], state_dir=state_dir, out_dir=out_dir)
    st1 = spark.read.parquet(state_dir + "/epoch=1").collect()
    assert len(st1) == 1 and st1[0]["k"] == 7  # O(changes), not O(keys)

    # and the reconstruction still classifies correctly from mixed epochs
    b2 = spark.createDataFrame(changed, "k long, v string")
    diff_and_apply(b2, 2, keys=["k"], state_dir=state_dir, out_dir=out_dir)
    assert spark.read.parquet(state_dir + "/epoch=2").count() == 0
    import os

    assert not os.path.exists(out_dir + "/epoch=2") or (
        spark.read.parquet(out_dir + "/epoch=2").count() == 0
    )


def test_attribution_null_event_type_keeps_carried_channel(
    spark, tmp_path
):
    """Round-9 (review finding): a NULL event_type between a click and a
    purchase must not clobber the carried channel — the batch twin uses
    last(..., ignorenulls=True). Previously the purchase lost its credit
    (or NaN poisoned the string state)."""
    import json

    from quantms_utils_spark.streaming.events import (
        attribute_purchases_stateful,
    )

    in_dir = tmp_path / "attr_null_in"
    in_dir.mkdir()
    rows = [
        {"user_id": 1, "event_id": 1, "ts": "2024-01-01T00:00:00",
         "event_type": "click", "value": 0.0},
        {"user_id": 1, "event_id": 2, "ts": "2024-01-01T00:01:00",
         "event_type": None, "value": 0.0},
        {"user_id": 1, "event_id": 3, "ts": "2024-01-01T00:02:00",
         "event_type": "purchase", "value": 9.0},
    ]
    with open(in_dir / "b.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(
        "user_id long, event_id long, ts timestamp, "
        "event_type string, value double"
    ).json(str(in_dir))
    collected = []
    q = (
        attribute_purchases_stateful(stream)
        .writeStream.foreachBatch(
            lambda df, _id: collected.extend(df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "attr_null_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    assert [(r["event_id"], r["channel"], r["value"]) for r in collected] == [
        (3, "click", 9.0)
    ]


def test_bins_batch_casts_integral_and_rejects_non_integral(
    spark, tmp_path
):
    """Round-9 (review finding): an int32 bin column must round-trip
    through the pinned 'bin long' state schema (cast on write); a
    non-integral bin column fails loudly instead of corrupting state."""
    import pytest

    from pyspark.sql import functions as F

    from quantms_utils_spark.streaming.drift import bins_batch, standing_bins

    state_dir = str(tmp_path / "bins")
    ints = spark.range(100).select((F.col("id") % 4).cast("int").alias("b"))
    bins_batch(ints, 0, bin_col="b", state_dir=state_dir)
    got = {
        r["bin"]: r["n"] for r in standing_bins(spark, state_dir).collect()
    }
    assert got == {0: 25, 1: 25, 2: 25, 3: 25}

    strings = spark.range(10).select(F.lit("bucket").alias("b"))
    with pytest.raises(ValueError, match="integral"):
        bins_batch(strings, 1, bin_col="b", state_dir=state_dir)


def test_merged_kmv_empty_state_honors_group_types(spark, tmp_path):
    """Round-9 (review finding): before any epoch lands, merged_kmv's
    empty frame must be able to carry the caller's group-column types —
    hardcoded strings made fresh-state pipelines fail joins that work
    once an epoch exists."""
    from quantms_utils_spark.streaming.sketches import merged_kmv

    empty = merged_kmv(
        spark, str(tmp_path / "nostate"), ["user_id"], k=8,
        group_types={"user_id": "bigint"},
    )
    assert dict(empty.dtypes)["user_id"] == "bigint"
    assert empty.count() == 0


def test_continuous_diff_preserves_user_digest_column(spark, tmp_path):
    """Round-10 (ADVICE r9): a user payload column literally named
    'digest' must survive into the epoch output with its values intact —
    the working digest now lives in a '__'-prefixed internal column."""
    from quantms_utils_spark.streaming.diff import diff_and_apply

    state_dir = str(tmp_path / "state")
    out_dir = str(tmp_path / "out")
    b0 = spark.createDataFrame(
        [(1, "sha:aaa"), (2, "sha:bbb")], "k long, digest string"
    )
    b1 = spark.createDataFrame(
        [(2, "sha:BBB"), (3, "sha:ccc")], "k long, digest string"
    )
    diff_and_apply(b0, 0, keys=["k"], state_dir=state_dir, out_dir=out_dir)
    diff_and_apply(b1, 1, keys=["k"], state_dir=state_dir, out_dir=out_dir)
    out = spark.read.parquet(out_dir + "/epoch=*")
    assert "digest" in out.columns  # user column kept, not clobber-dropped
    got = {(r["k"], r["digest"], r["status"]) for r in out.collect()}
    assert (1, "sha:aaa", "inserted") in got
    assert (2, "sha:bbb", "inserted") in got
    assert (2, "sha:BBB", "updated") in got
    assert (3, "sha:ccc", "inserted") in got


def test_continuous_diff_rejects_reserved_columns(spark, tmp_path):
    """Round-10 (ADVICE r9): batch columns colliding with the operator's
    working/output names ('status', '__digest', '_seq', ...) raise
    instead of being silently overwritten."""
    import pytest

    from quantms_utils_spark.streaming.diff import diff_and_apply

    b = spark.createDataFrame([(1, "x")], "k long, status string")
    with pytest.raises(ValueError, match="reserved"):
        diff_and_apply(
            b, 0, keys=["k"],
            state_dir=str(tmp_path / "s"), out_dir=str(tmp_path / "o"),
        )


def test_streaming_diff_digest_contract_shared_with_batch(spark):
    """Round-10 (ADVICE r9): the streaming digest is literally the batch
    table_diff payload (one shared expression, operators.diff._digest_expr)
    — same columns, same xxhash64, same NULL sentinel."""
    from quantms_utils_spark.operators.diff import _digest_expr
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 3.5)], "k long, v string, x double"
    )
    got = df.select(
        _digest_expr(["v", "x"]).alias("d"),
        F.xxhash64(
            F.coalesce(F.col("v").cast("string"), F.lit("\x00null")),
            F.coalesce(F.col("x").cast("string"), F.lit("\x00null")),
        ).alias("want"),
    ).collect()
    assert all(r["d"] == r["want"] for r in got)
    # empty non-key list: constant 0 digest (schema-only tables diff clean)
    z = df.select(_digest_expr([]).alias("d")).collect()
    assert all(r["d"] == 0 for r in z)
