"""Shared fixtures: one SparkSession, one built tiny index, one oracle.

Session-scoped so the whole suite pays Spark startup and the index build
once. Uses local[8] with shuffle partitions = 8 (SURVEY §5: local Spark,
`python -m pytest -x -q`).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from searchengine_spark.engine import SearchEngine
from searchengine_spark.oracle.oracle import OracleEngine
from searchengine_spark.session import get_spark
from searchengine_spark.sources.transcripts import (
    generate_transcripts,
    transcripts_spark_df,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_pdf():
    return generate_transcripts("tiny")


@pytest.fixture(scope="session")
def oracle(tiny_pdf):
    return OracleEngine().build(tiny_pdf)


@pytest.fixture(scope="session")
def engine(spark, tiny_pdf):
    """SearchEngine with a fully built index over the tiny fixture.

    docs_per_shard=256 forces multiple doc-range shards at tiny scale so the
    skew-split path and multi-shard kernel merging are exercised (the
    default floor of 4096 would put the whole fixture in one shard)."""
    from searchengine_spark.config import EngineConfig

    wh = tempfile.mkdtemp(prefix="se_wh_")
    eng = SearchEngine(spark, wh, EngineConfig(docs_per_shard=256))
    eng.build(transcripts_spark_df(spark, tiny_pdf))
    yield eng
    shutil.rmtree(wh, ignore_errors=True)


from searchengine_spark.queryset import REFERENCE_QUERIES  # noqa: E402,F401 — re-exported for tests
