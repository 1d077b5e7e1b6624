"""Pre-validate the driver correctness gate: every ``queries()`` entry must
match its ``oracle_sql()`` DuckDB result (row count, schema-compatible
values) at sf0.001. The driver repeats this at sf0.01.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert name in os_, f"{name} has no oracle"
    got = normalize(qs[name](spark, SF_DIR).toPandas())
    exp = normalize(duck.execute(os_[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name} columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name} rows {len(got)} != {len(exp)}"
    for c in got.columns:
        if np.issubdtype(got[c].dtype, np.floating):
            np.testing.assert_allclose(
                got[c], exp[c], rtol=1e-9, atol=1e-12, err_msg=f"{name}.{c}"
            )
        else:
            mism = (got[c] != exp[c]).sum()
            assert mism == 0, f"{name}.{c}: {mism} mismatching values"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) >= 0
    assert set(pdf.columns) == {"conv_id", "turn_idx", "score", "n_candidates"}
