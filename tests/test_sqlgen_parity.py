"""Pin the generated DuckDB oracle SQL to the Python source of truth.

The driver's correctness gate compares Spark (running the Python
lemmatizer/hash code) against DuckDB (running SQL generated from the same
constants by oracle/sqlgen.py). These tests check the two implementations
agree token-by-token, independent of any corpus.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.functions.lemmatize import lemmatize_token
from searchengine_spark.oracle.sqlgen import (
    MINHASH_P,
    _MINHASH_AB,
    h32_sql,
    lemmas_cte_sql,
    minhash_sql,
    simhash_bit_sql,
)

# letters the tokenizer keeps (T2 alphabet), plus inflection-heavy samples
TOKEN_ALPHABET = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" \
    "абвгдеёжзийклмнопрстуфхцчшщъыьэюяАБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ"

INTERESTING_TOKENS = [
    "the", "a", "s", "walking", "walked", "walks", "stories", "classes",
    "tables", "gas", "red", "ss", "поиск", "запросом", "ёж", "Ёлка",
    "logлог", "dataданные", "и", "мы", "SPARK", "xING", "ed", "ing",
    "bed", "sled", "у", "его",
]


def _oracle_lemmas(tokens: list[str]) -> dict[str, list[str]]:
    """Run the generated lemma SQL over a one-doc-per-token table."""
    con = duckdb.connect()
    con.execute("create table documents(doc_id bigint, text varchar)")
    con.executemany(
        "insert into documents values (?, ?)", list(enumerate(tokens))
    )
    sql = "with " + lemmas_cte_sql() + " select doc_id, term from lem order by doc_id"
    out: dict[int, list[str]] = {}
    for doc_id, term in con.execute(sql).fetchall():
        out.setdefault(doc_id, []).append(term)
    return {tokens[i]: sorted(out.get(i, [])) for i in range(len(tokens))}


def test_lemma_sql_matches_python_on_interesting_tokens():
    got = _oracle_lemmas(INTERESTING_TOKENS)
    for tok in INTERESTING_TOKENS:
        assert got[tok] == sorted(lemmatize_token(tok)), tok


@given(
    st.lists(
        st.text(alphabet=TOKEN_ALPHABET, min_size=1, max_size=12),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=30, deadline=None)
def test_lemma_sql_matches_python_random(tokens):
    tokens = [t for t in tokens if t.strip()]
    if not tokens:
        return
    got = _oracle_lemmas(tokens)
    for tok in set(tokens):
        assert got[tok] == sorted(lemmatize_token(tok)), tok


@pytest.mark.parametrize("word", ["spark", "поиск", "x", "Zz", "hotalpha"])
def test_hash_sql_matches_python(word):
    con = duckdb.connect()
    lit = "'" + word + "'"
    h = int(hashlib.md5(word.encode()).hexdigest()[:8], 16)
    got_h = con.execute("select " + h32_sql(lit)).fetchone()[0]
    assert got_h == h
    for k in range(len(_MINHASH_AB)):
        a, b = _MINHASH_AB[k]
        exp = (a * (h % MINHASH_P) + b) % MINHASH_P
        got = con.execute("select " + minhash_sql(lit, k)).fetchone()[0]
        assert got == exp, (word, k)
    for bit in [0, 1, 7, 15]:
        got = con.execute("select " + simhash_bit_sql(lit, bit)).fetchone()[0]
        assert got == (h >> bit) & 1
