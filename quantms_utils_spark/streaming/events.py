"""Structured Streaming surface.

The reference has no streaming operators (SURVEY §2.9 — its
``batch_write_mzml_streaming`` is bounded-memory file iteration, not event
streaming). This module is the forward-looking surface the synthetic
``events`` table exists for: the SAME logical transformations as the batch
queries (queries/core.py:event_hourly_agg), applied to a streaming reader
with watermarked event time, so one definition serves both executions —
the Spark idiom for batch/streaming unification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source over event parquet/json drops. At cloud
    scale the same code points at a Kafka/queue source; file streaming is the
    deterministic test harness."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def hourly_event_aggregate(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour event-time window per event_type with late-data
    watermark — the streaming twin of queries/core.py:event_hourly_agg.
    Works on both batch and streaming frames."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return src.groupBy(
        F.window("ts", "1 hour").alias("win"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("session_start", TimestampType(), True),
        StructField("session_end", TimestampType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType(), True),  # epoch µs
        StructField("last_ts", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)


def sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState``.

    State per user is the one OPEN session (start, last-seen, counters). Each
    micro-batch folds its events into the state in event-time order, emitting
    a row whenever a gap > ``gap_seconds`` closes a session; the trailing
    open session survives in the state store and is flushed by event-time
    timeout once the watermark passes it. This is the operator Spark's
    built-in windowing cannot express (data-driven window extents) — the
    batch twin is queries/core.py:sessionize (lag + cumulative flag-sum).

    Scale: state is O(active users), shuffled once by user_id; per-batch work
    is Arrow-batched pandas, not per-row Python.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    import pandas as pd  # noqa: F401 (executor-side)

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(start, unit="us")],
                        "session_end": [pd.Timestamp(last, unit="us")],
                        "n_events": [n],
                        "total_value": [total],
                    }
                )
            return

        ts_list, val_list = [], []
        for pdf in pdf_iter:
            ts_list.append(pdf["ts"])
            val_list.append(pdf["value"])
        ts = pd.concat(ts_list)
        vals = pd.concat(val_list)

        def arm_timeout(deadline_ms: int) -> None:
            # setTimeoutTimestamp RAISES (INVALID_TIMEOUT_TIMESTAMP,
            # killing the whole query) when the deadline is already
            # behind the watermark — reachable when a key receives only
            # null-ts rows (they pass the late filter) in the batch where
            # the watermark first passes its stored deadline, since data
            # is processed before timeouts fire. Clamp to watermark+1 so
            # the session flushes on the NEXT timeout sweep instead.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(int(deadline_ms), wm + 1))

        # Null event times would become NaT → int64-min → a garbage session
        # start AND a setTimeoutTimestamp before the watermark, which kills
        # the whole query. Drop them row-wise instead.
        valid = ts.notna()
        ts, vals = ts[valid], vals[valid]
        if len(ts) == 0:
            if state.exists:
                start, last, n, total = state.get
                arm_timeout(int(last) // 1000 + gap_seconds * 1000)
            return
        order = ts.argsort(kind="stable")
        # Normalize to µs regardless of the incoming datetime64 resolution
        # (Arrow hands pandas 2 datetime64[us]; plain int64-cast would be
        # resolution-dependent).
        ts_us = ts.astype("datetime64[us]").astype("int64").to_numpy()[order]
        vals = vals.to_numpy()[order]

        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0

        closed = []
        for t, v in zip(ts_us, vals):
            if start is None:
                start, last, n, total = t, t, 1, float(v)
            elif t - last > gap_us:
                closed.append((start, last, n, total))
                start, last, n, total = t, t, 1, float(v)
            else:
                last = max(last, t)
                n += 1
                total += float(v)

        state.update((int(start), int(last), int(n), float(total)))
        # Flush the open session once event time passes its gap deadline
        # (watermark-clamped: allowed-late rows can carry event times whose
        # deadline already trails the watermark).
        arm_timeout(int(last) // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                    "n_events": [c for *_, c, _ in closed],
                    "total_value": [v for *_, v in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_purchase_click_join(
    events: DataFrame,
    lookback: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
    left_type: str = "purchase",
    right_type: str = "click",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same user's
    clicks within the preceding hour. Both sides carry watermarks and the
    join condition carries the event-time range — that PAIR is what lets the
    state store expire rows (without the time bound, stream-stream join state
    grows forever). Works identically on batch frames (the time range is just
    a predicate there)."""
    purchases = events.filter(F.col("event_type") == left_type).select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    clicks = events.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    if events.isStreaming:
        purchases = purchases.withWatermark("purchase_ts", watermark)
        clicks = clicks.withWatermark("click_ts", watermark)
    cond = (
        (purchases.user_id == clicks.click_user)
        & (clicks.click_ts <= purchases.purchase_ts)
        & (clicks.click_ts >= F.expr(f"purchase_ts - {lookback}"))
    )
    # leftOuter emits an unmatched purchase (NULL click columns) only
    # once the watermark proves no in-window click can still arrive —
    # outer stream-stream results are watermark-delayed by design.
    return purchases.join(clicks, cond, how).select(
        "user_id", "purchase_id", "purchase_ts", "click_id", "click_ts"
    )


def stream_dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event dedup: duplicates arriving within the watermark
    horizon are dropped; state is bounded by the watermark (the streaming
    form of exact dedup — id state expires instead of growing forever). On a
    batch frame this degrades to plain dropDuplicates."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def stream_quality_filter(events: DataFrame, min_value: float = 0.0) -> DataFrame:
    """Stateless streaming filter + projection (the shape of a streaming
    ingest-cleaning stage); fully pushes down to the source scan in batch."""
    return events.filter(
        F.col("value") > min_value
    ).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def stream_classify_against_corpus(
    incoming: DataFrame, corpus: DataFrame, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Stream-STATIC join: classify a stream of arriving documents against
    the standing corpus' exact-duplicate fingerprint set — the streaming
    front half of ``operators.dedup.incremental_dedup`` (the LSH near-dup
    tier stays in the batch compaction pass; exact-dup rejection is the part
    worth doing at ingest latency). The static side is a tiny aggregated
    fingerprint table, so Spark broadcasts it and re-plans it per
    micro-batch; no streaming state is held at all (unlike stream-stream
    joins) — this scales to any corpus whose FINGERPRINT aggregate fits the
    broadcast budget, and degrades gracefully to a shuffled join beyond.
    Works identically on a batch frame (the twin the oracle checks).
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    corp_fp = (
        corpus.select(F.md5(norm).alias("fp"), F.col(id_col).alias("cid"))
        .groupBy("fp")
        .agg(F.min("cid").alias("match_id"))
    )
    return (
        incoming.withColumn("fp", F.md5(norm))
        .join(corp_fp, "fp", "left")
        .select(
            id_col,
            F.when(F.col("match_id").isNotNull(), F.lit("exact_dup"))
            .otherwise(F.lit("new"))
            .alias("status"),
            "match_id",
        )
    )


def sessionize_session_window(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap sessionization through Spark's BUILT-IN session-window
    aggregation — the declarative sibling of `sessionize_stateful` (which
    hand-manages state via applyInPandasWithState). One
    ``groupBy(user, session_window(ts, gap))``: the engine merges
    events whose gap to the session end is < ``gap``, maintains open
    sessions in the state store, and closes them when the watermark
    passes. Works identically on batch and streaming frames (same
    SessionWindow node), which is exactly what the batch-vs-stream
    parity test pins — the batch result IS the ground truth for the
    drained stream."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(
            "user_id", F.session_window(F.col("ts"), gap).alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("total_value", DoubleType(), True),
    ]
)


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running (count, value-sum) via Spark 4's
    ``transformWithStateInPandas`` — the arbitrary-stateful v2 API that
    succeeds ``applyInPandasWithState`` (explicit typed state handles
    with optional TTL, composable timers, initial-state support). State
    per user is ONE ValueState row; each micro-batch folds its Arrow
    batches into it and emits the updated running totals — the
    streaming-native form of a continuously-maintained per-key
    aggregate. The parity test drains the stream and checks the final
    emission per user equals the batch groupBy on the same files.

    Environment gate: the v2 state-server protocol speaks protobuf
    (pyspark.sql.streaming.proto), so running this REQUIRES the
    ``protobuf`` package — absent here, the parity test skips with the
    same honest-gate policy as pyopenms/sdrf-pipelines. The operator
    code itself is complete and exercised wherever protobuf exists."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE"
            )

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            prev = self._state.get() if self._state.exists() else None
            n, total = (prev[0], prev[1]) if prev else (0, 0.0)
            for pdf in rows:
                vals = pdf["value"].dropna()
                n += int(len(pdf))
                total += float(vals.sum())
            self._state.update((n, round(total, 6)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


JOURNEY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("n_journeys", LongType(), True),
    ]
)

JOURNEY_STATE_SCHEMA = StructType(
    [
        StructField("phase", IntegerType(), True),
        StructField("n", LongType(), True),
    ]
)


def journey_dfa_fold(chars, phase: int = 0, n: int = 0) -> tuple[int, int]:
    """Fold event-type initials through the journey DFA (the compiled form
    of the regex ``v[^p]*c[^p]*p``); resumable — pass the previous
    (phase, n) to continue across micro-batches. Property-tested against
    the regex's leftmost non-overlapping scan on random alphabets."""
    for c in chars:
        if phase == 0:
            if c == "v":
                phase = 1
        elif phase == 1:
            if c == "c":
                phase = 2
            elif c == "p":
                phase = 0
        else:
            if c == "p":
                phase, n = 0, n + 1
    return phase, n


def detect_journeys_stateful(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming CEP twin of the batch ``event_pattern_match`` query: count
    each user's ``view … click … purchase`` journeys (no intervening
    purchase) INCREMENTALLY, without ever materializing the event string.

    The regex ``v[^p]*c[^p]*p`` the batch query scans is a 3-state DFA, so
    per-user state compresses to TWO integers — (phase, journeys so far):

        phase 0 ──v──▶ phase 1 ──c──▶ phase 2 ──p──▶ count++, phase 0
                       phase 1 ──p──▶ phase 0   (all other chars: stay)

    Leftmost non-overlapping regex scan and this DFA count identical
    matches (the parity test drives both over the same files). Each
    micro-batch sorts its rows by (ts, event_id) and folds them through
    the DFA; cross-batch correctness assumes in-order delivery per key —
    the same contract as ``sessionize_stateful``. Emits the cumulative
    (user_id, n_journeys) each batch (update semantics).

    Scale: this is the CEP shape at 100 TB — state per key is O(pattern
    states), NOT O(history), so a billion-user stream holds two ints per
    user in the state store while the batch twin's collect_list holds the
    full event string."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        phase, n = state.get if state.exists else (0, 0)
        frames = [pdf[["ts", "event_id", "event_type"]] for pdf in pdf_iter]
        if not frames:
            return
        ordered = pd.concat(frames).sort_values(["ts", "event_id"])
        phase, n = journey_dfa_fold(ordered["event_type"].str[0], phase, n)
        state.update((phase, n))
        yield pd.DataFrame({"user_id": [user_id], "n_journeys": [n]})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=JOURNEY_OUTPUT_SCHEMA,
            stateStructType=JOURNEY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CREDIT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("event_id", LongType(), True),
        StructField("channel", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)

CREDIT_STATE_SCHEMA = StructType(
    [StructField("last_channel", StringType(), True)]
)


def attribute_purchases_stateful(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of the batch ``event_attribution_last_touch`` query:
    each purchase is credited to the user's most recent prior non-purchase
    event type, emitted as ONE append-mode credit row per purchase.

    State per user is a single string (the carried channel) — the
    streaming materialization of the batch query's
    ``last(..., ignorenulls=True)`` window, whose state is likewise one
    scalar. Rollup to (channel, attributed_value) happens DOWNSTREAM of
    the credit stream (land-then-aggregate, or a second streaming agg) —
    chaining the rollup into this query would stack two stateful
    operators in one plan, which Structured Streaming restricts. Same
    in-order per-key delivery contract as the other stateful twins."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        (last,) = state.get if state.exists else (None,)
        frames = [
            pdf[["ts", "event_id", "event_type", "value"]] for pdf in pdf_iter
        ]
        if not frames:
            return
        ordered = pd.concat(frames).sort_values(["ts", "event_id"])
        out = []
        for eid, etype, val in zip(
            ordered["event_id"], ordered["event_type"], ordered["value"]
        ):
            if etype == "purchase":
                if last is not None:
                    out.append((user_id, int(eid), last, float(val)))
            elif pd.notna(etype):
                # a NULL event_type must not clobber the carried channel —
                # the batch twin uses last(..., ignorenulls=True); a None/
                # NaN here would also poison the StringType state column
                last = etype
        state.update((last,))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "channel", "value"]
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=CREDIT_OUTPUT_SCHEMA,
            stateStructType=CREDIT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
