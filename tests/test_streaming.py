"""Structured-Streaming ingestion tests (streaming/ingest.py): late-arriving
transcript files append into the index with partition-scoped writes and
exactly-once file tracking via the stream checkpoint."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from searchengine_spark.engine import SearchEngine
from searchengine_spark.oracle.oracle import OracleEngine
from searchengine_spark.sources.transcripts import (
    generate_transcripts,
    transcripts_spark_df,
)
from searchengine_spark.streaming.ingest import stream_transcripts


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts("tiny", seed=11)


@pytest.fixture(scope="module")
def stream_built(spark, corpus):
    wh = tempfile.mkdtemp(prefix="se_stream_")
    eng = SearchEngine(spark, wh)
    eng.build(transcripts_spark_df(spark, corpus))
    yield eng, wh
    shutil.rmtree(wh, ignore_errors=True)


def _late_batch(spark, rows):
    return spark.createDataFrame(
        [(c, t, "user", x, None, None) for c, t, x in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


def test_append_turns_searchable_and_idempotent(spark, corpus, stream_built):
    eng, _ = stream_built
    n0 = eng.catalog.read("documents").count()
    batch = _late_batch(
        spark,
        [
            ("conv00-700001", 0, "latestreamword spark data appears"),
            ("conv00-700001", 1, "another latestreamword turn"),
        ],
    )
    assert eng.append_turns(batch) == 2
    assert eng.catalog.read("documents").count() == n0 + 2
    page, count = eng.search("latestreamword")
    assert count == 2
    # idempotent re-delivery: same keys are dropped
    assert eng.append_turns(batch) == 0
    _, count2 = eng.search("latestreamword")
    assert count2 == 2


def test_append_matches_full_rebuild_oracle(spark, corpus):
    """After appending late turns, ranking/count must equal an oracle built
    on the unioned corpus (same invariant as the M1 upsert). Own warehouse:
    the module fixture's index already contains other tests' appends."""
    import pandas as pd

    wh = tempfile.mkdtemp(prefix="se_streamo_")
    eng = SearchEngine(spark, wh)
    eng.build(transcripts_spark_df(spark, corpus))
    extra = pd.DataFrame(
        {
            "conv_id": ["conv00-800001", "conv00-800002"],
            "turn_idx": [0, 0],
            "role": ["user", "user"],
            "text": [
                "streamoracleword spark data window",
                "streamoracleword поиск запрос",
            ],
            "tool": [None, None],
            "ts": [pd.Timestamp("2026-02-01")] * 2,
        }
    )
    eng.append_turns(_late_batch(
        spark, list(zip(extra["conv_id"], extra["turn_idx"], extra["text"]))
    ))
    merged = pd.concat([corpus, extra], ignore_index=True)
    oracle = OracleEngine().build(merged)
    for q, mode in [("streamoracleword", "reference"), ("streamoracleword spark", "bm25")]:
        page, count = eng.search(q, mode=mode, exact_count=True)
        opage, ocount = oracle.search(q, mode=mode)
        assert count == ocount, (q, mode)
        assert list(page["conv_id"]) == list(opage["conv_id"]), (q, mode)
    shutil.rmtree(wh, ignore_errors=True)


def test_stream_transcripts_available_now(spark, corpus):
    """End-to-end readStream → foreachBatch: drop files into a directory,
    run with availableNow, new turns become searchable; a second run with
    the same checkpoint reprocesses nothing."""
    import pandas as pd

    wh = tempfile.mkdtemp(prefix="se_streamq_")
    indir = tempfile.mkdtemp(prefix="se_streamin_")
    ckpt = tempfile.mkdtemp(prefix="se_streamck_")
    eng = SearchEngine(spark, wh)
    eng.build(transcripts_spark_df(spark, corpus))
    n0 = eng.catalog.read("documents").count()

    pd.DataFrame(
        {
            "conv_id": ["conv00-900001"],
            "turn_idx": [0],
            "role": ["user"],
            "text": ["streamfileword arrives via structured streaming"],
            "tool": pd.array([None], dtype="string"),
            "ts": [pd.Timestamp("2026-03-01")],
        }
    ).astype({"turn_idx": "int32", "ts": "datetime64[us]"}).to_parquet(
        os.path.join(indir, "late1.parquet"), index=False
    )

    q = stream_transcripts(spark, indir, wh, ckpt)
    q.awaitTermination(120)
    eng._searcher = None
    page, count = eng.search("streamfileword")
    assert count == 1
    assert eng.catalog.read("documents").count() == n0 + 1

    # second run, same checkpoint: nothing new → no change
    q2 = stream_transcripts(spark, indir, wh, ckpt)
    q2.awaitTermination(120)
    eng._searcher = None
    assert eng.catalog.read("documents").count() == n0 + 1
    for d in (wh, indir, ckpt):
        shutil.rmtree(d, ignore_errors=True)


def test_append_never_rewrites_existing_files(spark, corpus):
    """The append path is O(batch): every pre-existing file of documents/
    postings_flat/postings survives byte-identical (blocks APPEND after the
    existing (term, shard) runs — disjoint higher doc ranges)."""
    import hashlib

    wh = tempfile.mkdtemp(prefix="se_appstab_")
    eng = SearchEngine(spark, wh)
    eng.build(transcripts_spark_df(spark, corpus))

    def snapshot(table):
        out = {}
        root = os.path.join(wh, table)
        for dirpath, _, files in os.walk(root):
            for f in files:
                p = os.path.join(dirpath, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, root)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
        return out

    tables = ["postings", "postings_flat", "documents"]
    before = {t: snapshot(t) for t in tables}
    eng.append_turns(_late_batch(
        spark, [("conv00-850001", 0, "appendonly hotalpha words here")]
    ))
    after = {t: snapshot(t) for t in tables}
    for t in tables:
        for path, h in before[t].items():
            if path == "_SUCCESS":
                continue
            assert after[t].get(path) == h, (t, path)
        assert len(after[t]) > len(before[t]), t  # new files appended
    # and the appended doc is immediately searchable alongside old blocks
    page, count = eng.search("appendonly")
    assert count == 1
    _, chot = eng.search("hotalpha", exact_count=True)
    assert chot > 1  # old + new postings merge in the kernel
    shutil.rmtree(wh, ignore_errors=True)


def test_append_then_reindex_compacts(spark, corpus):
    """Mixed late-data flows: a streamed append followed by an upsert of the
    SAME turn must stay consistent — the shard reindex squashes the appended
    blocks (compaction) and the new text wins."""
    wh = tempfile.mkdtemp(prefix="se_mix_")
    eng = SearchEngine(spark, wh)
    eng.build(transcripts_spark_df(spark, corpus))
    eng.append_turns(_late_batch(
        spark, [("conv00-870001", 0, "mixfirstword appears")]
    ))
    _, c1 = eng.search("mixfirstword")
    assert c1 == 1
    eng.reindex_turn("conv00-870001", 0, "mixsecondword replaces it")
    _, c2 = eng.search("mixfirstword")
    _, c3 = eng.search("mixsecondword")
    assert c2 == 0 and c3 == 1
    shutil.rmtree(wh, ignore_errors=True)
