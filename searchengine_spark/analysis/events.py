"""Event-stream analytics: tumbling-window aggregation + sessionization.

The driver corpus ships an ``events`` table ``(event_id, ts, user_id,
event_type, value, props)``; these operators are the standard large-scale
shapes over it, all pure JVM built-ins:

- :func:`windowed_counts` — tumbling time windows (``F.window``) per event
  type: the batch twin of a Structured-Streaming windowed aggregation (the
  same expression runs on a ``readStream`` source with a watermark).
- :func:`sessionize` — gap-based sessions per user via lag/cumsum windows;
  the shuffle key is ``user_id``, so state is bounded by one user's events
  — the batch twin of ``session_window`` in streaming.

Timestamps are compared in exact integer microseconds (``unix_micros`` /
DuckDB ``epoch_us``) so the SQL oracles are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """(window_start, event_type, n_events, sum_value): tumbling-window
    per-type aggregation. One hash-shuffle on (window, type); partial
    aggregation map-side."""
    return (
        events.groupBy(
            F.window("ts", window).alias("w"), "event_type"
        )
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


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, n_events, start_us, end_us): maximal event
    runs per user with inter-event gaps ≤ ``gap_minutes``. session_id is
    the session's START TIME in epoch microseconds (== start_us) — a
    globally stable identifier: it survives incremental recompute, and the
    streaming twin can evict idle-user state without ever re-issuing an id
    (a per-user 0-based counter cannot — a user returning after state
    eviction would restart the counter and collide with already-emitted
    sessions). Per-user windows — state bounded by one user's history, the
    classic sessionization shuffle shape."""
    gap_us = gap_minutes * 60 * 1_000_000
    # parquet naive timestamps read as TIMESTAMP_NTZ; the session tz is UTC,
    # so the cast is wallclock-identity and matches DuckDB's epoch_us
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = events.select("user_id", "event_id", us.alias("_us"))
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    new_session = (
        F.col("_us") - F.lag("_us").over(w) > F.lit(gap_us)
    ).cast("int")
    with_sess = base.withColumn(
        "_sess",
        F.coalesce(
            F.sum(F.coalesce(new_session, F.lit(0))).over(w), F.lit(0)
        ),
    )
    return (
        with_sess.groupBy("user_id", "_sess")
        .agg(
            F.count("*").alias("n_events"),
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
        )
        .select(
            "user_id",
            F.col("start_us").alias("session_id"),
            "n_events",
            "start_us",
            "end_us",
        )
    )
