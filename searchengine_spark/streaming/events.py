"""Structured-Streaming event analytics: the streaming twins of
``analysis/events.py``'s batch operators.

- :func:`stream_windowed_counts` — ``readStream`` → ``withWatermark`` →
  tumbling-window aggregation in UPDATE mode. The watermark bounds state
  (windows older than watermark are finalized and evicted) and DROPS
  late rows that arrive after it passes — the two properties that make a
  windowed aggregation runnable forever over an unbounded stream. The
  aggregation expression is byte-for-byte the batch
  :func:`~searchengine_spark.analysis.events.windowed_counts` plan.
- :func:`stream_sessionize` — gap-based per-user sessions as a CUSTOM
  stateful operator via ``applyInPandasWithState`` (Arrow-batched; no
  per-row Python). State per user is one open session (5 scalars), so
  memory is O(active users), not O(events) — the shape that survives an
  unbounded stream. Each micro-batch emits the running aggregate of every
  session it touched (update semantics): closed sessions emit their final
  row when the gap closes them, and the last emission per
  (user_id, session_id) always equals the batch
  :func:`~searchengine_spark.analysis.events.sessionize` row over the
  same prefix of events.

Correctness contract: per-user event-time order ACROSS micro-batches
(within a batch the operator sorts). An out-of-order producer needs a
watermark-buffered reorder stage first; the driver fixtures and the
parity tests feed time-ordered files, which is also how a replayed log
(the 100-TB case: Kafka partitions keyed by user, or date-partitioned
object storage) arrives.

Both run with ``trigger(availableNow=True)`` for batch-incremental
catch-up (the tests) or the default micro-batch trigger for a live feed —
the same dataframes, untouched.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: the driver `events` table schema (TESTDATA.md)
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

SESSION_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, start_us long, end_us long"
)
#: open-session state per user: (session index, start, end, count)
SESSION_STATE_SCHEMA = "sess long, start long, end long, n long"


def read_events_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events parquet directory. One file per
    trigger by default so multi-batch behavior (watermark advance, state
    carry-over) is exercised deterministically; a production feed raises
    it or swaps in a Kafka source — downstream plans are identical."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def windowed_counts_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """The batch ``windowed_counts`` aggregation with a watermark bolted
    on — same groupBy/agg expressions, so batch and stream results are
    comparable row-for-row. UPDATE output mode emits each (window, type)
    row whenever a batch changes it; rows later than the watermark are
    dropped by the state store before they reach the aggregate."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def _session_fn(gap_us: int, use_timeout: bool = False) -> Callable:
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        if use_timeout and state.hasTimedOut:
            # the event-time watermark passed (last event + gap): the open
            # session can never be extended — emit its final row and EVICT
            # the state (unbounded streams must not hold idle users forever)
            sess, start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user, sess, n, start, end)],
                columns=[
                    "user_id", "session_id", "n_events", "start_us", "end_us"
                ],
            )
            return
        if state.exists:
            sess, start, end, n = state.get
        else:
            sess, start, end, n = 0, None, None, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        # in-batch ordering: event time, then event_id (the batch twin's
        # deterministic tiebreak)
        batch = batch.sort_values(["_us", "event_id"], kind="mergesort")
        rows = []
        for us in batch["_us"].to_numpy():
            us = int(us)
            if start is None:
                start = end = us
                n = 1
            elif us - end > gap_us:
                rows.append((user, sess, n, start, end))  # final emission
                sess += 1
                start = end = us
                n = 1
            else:
                end = us
                n += 1
        if n:
            rows.append((user, sess, n, start, end))  # running aggregate
        state.update((int(sess), int(start), int(end), int(n)))
        if use_timeout:
            # close the open session when the watermark passes its gap
            # horizon; +1 ms so an event AT the horizon still extends it
            state.setTimeoutTimestamp((int(end) + gap_us) // 1000 + 1)
        yield pd.DataFrame(
            rows,
            columns=["user_id", "session_id", "n_events", "start_us", "end_us"],
        )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    idle_timeout_watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator:
    ``applyInPandasWithState`` keyed by user_id, one open session of four
    scalars as state. Emits every session the batch touched with its
    running aggregate; the last emission per (user_id, session_id) is the
    session's final row.

    ``idle_timeout_watermark`` (e.g. ``"1 hour"``) switches on event-time
    state EVICTION — the property an unbounded 100-TB stream requires:
    a watermark is attached to ``ts`` and each open session arms a timeout
    at (last event + gap), so when the watermark passes it the session
    emits its final row and its state is REMOVED — memory is then
    O(users active within the gap+watermark horizon), not O(all users
    ever seen). Default None keeps NoTimeout semantics (state pending
    until the user's next event; simplest for bounded catch-up runs —
    note the watermark also drops late events, so only feed it streams
    whose disorder is within the delay)."""
    gap_us = gap_minutes * 60 * 1_000_000
    src = events
    timeout = GroupStateTimeout.NoTimeout
    if idle_timeout_watermark is not None:
        src = events.withWatermark("ts", idle_timeout_watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    # ts stays in the projection: event-time timeout requires the
    # watermarked column to survive into the stateful operator's input
    base = src.select(
        "user_id", "event_id", "ts", F.unix_micros(F.col("ts")).alias("_us")
    )
    return base.groupby("user_id").applyInPandasWithState(
        _session_fn(gap_us, use_timeout=idle_timeout_watermark is not None),
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "update",
        timeout,
    )


def run_collecting(
    df: DataFrame, checkpoint: str, output_mode: str = "update"
) -> list[tuple[int, pd.DataFrame]]:
    """Run a streaming dataframe to completion with availableNow,
    collecting each micro-batch's emissions as (batch_id, pandas) — the
    test/verification harness. Production sinks swap in here unchanged."""
    batches: list[tuple[int, pd.DataFrame]] = []

    def sink(bdf: DataFrame, bid: int) -> None:
        pdf = bdf.toPandas()
        if len(pdf):
            batches.append((bid, pdf))

    q = (
        df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return batches
