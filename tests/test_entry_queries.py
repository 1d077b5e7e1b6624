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


def dtype_kinds(df: pd.DataFrame) -> dict:
    """Column -> dtype *kind* ('i', 'f', 'b', 'O', ...) before any coercion.

    The driver's value hash is dtype-aware: Spark int64 vs DuckDB
    HUGEINT-as-float64 hash differently even when values are equal
    (round-4 q_split_token_budget failure). Asserting kind equality here
    makes that class of oracle drift fail in-repo instead of at the driver.
    """
    out = {}
    for c in df.columns:
        k = df[c].dtype.kind
        out[c] = "O" if k in ("O", "U", "S") else k
    return out


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
    if name in entrymod.ROWS_ONLY_QUERIES:
        # declared non-SQL-expressible: the driver runs a rows-only check;
        # here pin that it runs, returns rows, and keeps a stable schema
        assert name not in os_, f"{name} declared rows-only but has an oracle"
        df = qs[name](spark, SF_DIR)
        pdf = df.toPandas()
        assert len(pdf) > 0, f"{name} returned no rows"
        assert list(pdf.columns) == [f.name for f in df.schema.fields]
        return
    assert name in os_, f"{name} has no oracle"
    got_raw = qs[name](spark, SF_DIR).toPandas()
    exp_raw = duck.execute(os_[name]).df()
    got, exp = normalize(got_raw), normalize(exp_raw)
    assert list(got.columns) == list(exp.columns), (
        f"{name} columns {list(got.columns)} != {list(exp.columns)}"
    )
    gk, ek = dtype_kinds(got_raw), dtype_kinds(exp_raw)
    for c in got.columns:
        assert gk[c] == ek[c], (
            f"{name}.{c}: dtype kind mismatch spark={gk[c]} oracle={ek[c]} "
            f"(driver hash is dtype-aware; cast the oracle SQL)"
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
