"""Streaming twins of the batch event operators: watermarked windowed
aggregation (late data dropped, state bounded) and applyInPandasWithState
sessionization (last emission per session == the batch sessionize row)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd

from searchengine_spark.analysis.events import sessionize, windowed_counts
from searchengine_spark.streaming.events import (
    read_events_stream,
    run_collecting,
    sessionize_stream,
    sessionize_stream_ooo,
    windowed_counts_stream,
)


def _events_pdf(rows):
    """rows: (event_id, ts_str, user_id, event_type, value)"""
    return pd.DataFrame(
        {
            "event_id": pd.array([r[0] for r in rows], dtype="int64"),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": pd.array([r[2] for r in rows], dtype="int64"),
            "event_type": [r[3] for r in rows],
            "value": [float(r[4]) for r in rows],
            "props": ["{}"] * len(rows),
        }
    )


def _write_ordered(indir, pdfs):
    """One parquet per micro-batch; mtimes force the file-source order."""
    for i, pdf in enumerate(pdfs):
        p = os.path.join(indir, f"batch{i}.parquet")
        pdf.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))


def _last_per_key(batches, keys):
    frames = [pdf.assign(_bid=bid) for bid, pdf in batches]
    allpdf = pd.concat(frames, ignore_index=True)
    allpdf = allpdf.sort_values("_bid", kind="mergesort")
    return (
        allpdf.groupby(keys, as_index=False)
        .last()
        .drop(columns=["_bid"])
        .sort_values(keys)
        .reset_index(drop=True)
    )


def test_stream_windowed_counts_parity_and_late_drop(spark):
    indir = tempfile.mkdtemp(prefix="se_evstr_")
    ckpt = tempfile.mkdtemp(prefix="se_evck_")
    try:
        batch1 = _events_pdf(
            [
                (1, "2026-01-01 00:10:00", 1, "click", 1.0),
                (2, "2026-01-01 00:40:00", 1, "click", 2.0),
                (3, "2026-01-01 01:20:00", 2, "view", 3.0),
                (4, "2026-01-01 03:30:00", 2, "click", 4.0),  # watermark anchor
            ]
        )
        ontime = (10, "2026-01-01 03:45:00", 3, "view", 5.0)
        batch2 = _events_pdf([ontime])
        late = (9, "2026-01-01 00:30:00", 3, "click", 100.0)  # window closed
        batch3 = _events_pdf([late])
        _write_ordered(indir, [batch1, batch2, batch3])

        # watermark after batch1 = 03:30 - 1h = 02:30 > the late row's
        # window end (01:00) → the state store must drop it. The late file
        # arrives TWO triggers after the anchor: availableNow pre-plans the
        # next batch's offsets (incl. its watermark metadata) before the
        # previous batch commits, so the filter takes effect one batch
        # later than the progress-reported watermark (measured; the live
        # micro-batch trigger has the same one-batch construction lag)
        src = read_events_stream(spark, indir, max_files_per_trigger=1)
        stream = windowed_counts_stream(src, window="1 hour", watermark="1 hour")
        got = _last_per_key(
            run_collecting(stream, ckpt), ["window_start", "event_type"]
        )

        kept = pd.concat([batch1, batch2], ignore_index=True)
        exp = (
            windowed_counts(spark.createDataFrame(kept))
            .toPandas()
            .sort_values(["window_start", "event_type"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[exp.columns.tolist()], exp, check_dtype=False
        )
        # the dropped row's (window, type) must not exist at all for user-3's
        # late click (00:00 window has only the on-time batch1 clicks)
        w0 = got[
            (got.window_start == pd.Timestamp("2026-01-01 00:00:00"))
            & (got.event_type == "click")
        ]
        assert float(w0["sum_value"].iloc[0]) == 3.0  # 1.0 + 2.0, not +100
    finally:
        for d in (indir, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_sessionize_matches_batch(spark):
    indir = tempfile.mkdtemp(prefix="se_sestr_")
    ckpt = tempfile.mkdtemp(prefix="se_seck_")
    try:
        # user 1: two sessions split ACROSS batches (gap inside batch 2);
        # user 2: one session spanning batches 1-3 (state carry-over);
        # user 3: appears only in batch 3 (fresh state mid-stream)
        b1 = [
            (1, "2026-01-01 00:00:00", 1, "click", 1.0),
            (2, "2026-01-01 00:10:00", 1, "click", 1.0),
            (3, "2026-01-01 00:05:00", 2, "view", 1.0),
        ]
        b2 = [
            (4, "2026-01-01 02:00:00", 1, "click", 1.0),  # >30 min gap → new
            (5, "2026-01-01 00:20:00", 2, "view", 1.0),
        ]
        b3 = [
            (6, "2026-01-01 02:10:00", 1, "click", 1.0),
            (7, "2026-01-01 00:45:00", 2, "view", 1.0),
            (8, "2026-01-01 09:00:00", 3, "click", 1.0),
        ]
        pdfs = [_events_pdf(b) for b in (b1, b2, b3)]
        _write_ordered(indir, pdfs)

        src = read_events_stream(spark, indir, max_files_per_trigger=1)
        got = _last_per_key(
            run_collecting(sessionize_stream(src, gap_minutes=30), ckpt),
            ["user_id", "session_id"],
        )

        exp = (
            sessionize(
                spark.createDataFrame(pd.concat(pdfs, ignore_index=True)),
                gap_minutes=30,
            )
            .toPandas()
            .sort_values(["user_id", "session_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[exp.columns.tolist()], exp, check_dtype=False
        )
        assert len(exp) == 4  # 2 + 1 + 1 sessions
    finally:
        for d in (indir, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_sessionize_post_eviction_return(spark):
    """A user who returns AFTER their idle session was timeout-evicted must
    open a session whose id does NOT collide with any already-emitted id
    (session_id == start_us makes this structural): an update-mode sink
    keyed by (user_id, session_id) keeps both sessions."""
    indir = tempfile.mkdtemp(prefix="se_seret_")
    ckpt = tempfile.mkdtemp(prefix="se_seretck_")
    try:
        # u9 active in b1, idle long enough for the b2/b3 watermark pushers
        # to fire the event-time timeout (gap 30m + wm 30m → horizon 01:00),
        # then RETURNS in b4 — state was removed, a fresh session opens
        b1 = [
            (1, "2026-01-01 00:00:00", 9, "click", 1.0),
            (2, "2026-01-01 00:10:00", 9, "click", 1.0),
        ]
        b2 = [(3, "2026-01-01 04:00:00", 5, "view", 1.0)]
        b3 = [(4, "2026-01-01 08:00:00", 6, "view", 1.0)]
        b4 = [
            (5, "2026-01-01 12:00:00", 9, "click", 1.0),
            (6, "2026-01-01 12:05:00", 9, "click", 1.0),
        ]
        pdfs = [_events_pdf(b) for b in (b1, b2, b3, b4)]
        _write_ordered(indir, pdfs)

        src = read_events_stream(spark, indir, max_files_per_trigger=1)
        batches = run_collecting(
            sessionize_stream(
                src, gap_minutes=30, idle_timeout_watermark="30 minutes"
            ),
            ckpt,
        )
        # the first u9 session must have closed via timeout BEFORE b4
        # (a u9 row in a batch with no u9 input)
        assert any(
            bid in (1, 2) and (pdf.user_id == 9).any() for bid, pdf in batches
        ), "idle session never closed via timeout before the user returned"
        got = _last_per_key(batches, ["user_id", "session_id"])
        u9 = got[got.user_id == 9]
        assert len(u9) == 2, f"post-eviction session collided: {u9}"
        exp = (
            sessionize(
                spark.createDataFrame(pd.concat(pdfs, ignore_index=True)),
                gap_minutes=30,
            )
            .toPandas()
            .sort_values(["user_id", "session_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[exp.columns.tolist()], exp, check_dtype=False
        )
    finally:
        for d in (indir, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_sessionize_ooo_matches_batch(spark):
    """Out-of-order feed (per-user disorder bounded by the watermark):
    sessionize_stream_ooo emits each session exactly once, final, and the
    set matches the batch sessionizer — including an out-of-order event
    that BRIDGES two previously-separate open sessions."""
    indir = tempfile.mkdtemp(prefix="se_seooo_")
    ckpt = tempfile.mkdtemp(prefix="se_seoook_")
    try:
        # u1: events 00:00,00:10,00:20 + 02:00,02:05 arrive shuffled across
        # batches (disorder < 30m watermark); u2: 00:00 and 00:50 arrive as
        # two separate open sessions, then 00:25 bridges them into one;
        # u99: far-future sentinels that advance the watermark so every
        # u1/u2 session finalizes before the stream drains
        b1 = [
            (2, "2026-01-01 00:10:00", 1, "click", 1.0),
            (10, "2026-01-01 00:00:00", 2, "view", 1.0),
        ]
        b2 = [
            (1, "2026-01-01 00:00:00", 1, "click", 1.0),  # 10m late
            (3, "2026-01-01 00:20:00", 1, "click", 1.0),
            (11, "2026-01-01 00:50:00", 2, "view", 1.0),  # 2nd open session
        ]
        b3 = [
            (5, "2026-01-01 02:05:00", 1, "click", 1.0),
            (12, "2026-01-01 00:25:00", 2, "view", 1.0),  # bridges u2
        ]
        b4 = [(4, "2026-01-01 02:00:00", 1, "click", 1.0)]  # 5m late
        b5 = [(98, "2026-01-01 06:00:00", 99, "view", 1.0)]
        b6 = [(99, "2026-01-01 10:00:00", 99, "view", 1.0)]
        pdfs = [_events_pdf(b) for b in (b1, b2, b3, b4, b5, b6)]
        _write_ordered(indir, pdfs)

        src = read_events_stream(spark, indir, max_files_per_trigger=1)
        batches = run_collecting(
            sessionize_stream_ooo(src, gap_minutes=30, watermark="30 minutes"),
            ckpt,
        )
        allpdf = pd.concat([p for _, p in batches], ignore_index=True)
        emitted = allpdf[allpdf.user_id != 99]
        # exactly-once: no (user, session_id) appears twice
        assert not emitted.duplicated(["user_id", "session_id"]).any()
        got = emitted.sort_values(["user_id", "session_id"]).reset_index(
            drop=True
        )
        full = pd.concat(pdfs, ignore_index=True)
        exp = (
            sessionize(
                spark.createDataFrame(full[full.user_id != 99]),
                gap_minutes=30,
            )
            .toPandas()
            .sort_values(["user_id", "session_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[exp.columns.tolist()], exp, check_dtype=False
        )
        # the bridge actually happened: u2 has ONE session of 3 events
        u2 = got[got.user_id == 2]
        assert len(u2) == 1 and int(u2["n_events"].iloc[0]) == 3
    finally:
        for d in (indir, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_sessionize_idle_timeout_evicts_state(spark):
    """With idle_timeout_watermark set, an idle user's open session closes
    via event-time timeout when the watermark passes (last event + gap):
    the final row is emitted in a batch carrying NO events for that user,
    and the emitted aggregate matches the batch sessionize row."""
    indir = tempfile.mkdtemp(prefix="se_setmo_")
    ckpt = tempfile.mkdtemp(prefix="se_setmock_")
    try:
        # user 9 is active only in batch 1; users 5/6 keep the watermark
        # advancing afterwards (gap 30 min + watermark 30 min → horizon
        # 01:00; batches 2-4 push the watermark far past it — several
        # batches because availableNow applies the watermark one batch late)
        b1 = [
            (1, "2026-01-01 00:00:00", 9, "click", 1.0),
            (2, "2026-01-01 00:10:00", 9, "click", 1.0),
        ]
        b2 = [(3, "2026-01-01 04:00:00", 5, "view", 1.0)]
        b3 = [(4, "2026-01-01 08:00:00", 6, "view", 1.0)]
        b4 = [(5, "2026-01-01 12:00:00", 5, "view", 1.0)]
        pdfs = [_events_pdf(b) for b in (b1, b2, b3, b4)]
        _write_ordered(indir, pdfs)

        src = read_events_stream(spark, indir, max_files_per_trigger=1)
        batches = run_collecting(
            sessionize_stream(
                src, gap_minutes=30, idle_timeout_watermark="30 minutes"
            ),
            ckpt,
        )
        # the timeout emission: a user-9 row in a batch with no user-9 input
        timeout_rows = [
            (bid, r)
            for bid, pdf in batches
            for r in pdf[pdf.user_id == 9].itertuples()
            if bid > 0
        ]
        assert timeout_rows, "idle session never closed via timeout"
        got = _last_per_key(batches, ["user_id", "session_id"])
        exp = (
            sessionize(
                spark.createDataFrame(pd.concat(pdfs, ignore_index=True)),
                gap_minutes=30,
            )
            .toPandas()
            .sort_values(["user_id", "session_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[exp.columns.tolist()], exp, check_dtype=False
        )
    finally:
        for d in (indir, ckpt):
            shutil.rmtree(d, ignore_errors=True)
