"""Dialect-portable SQL snippets shared by the Spark engine and the DuckDB
oracle (the driver's correctness gate compares the two).

Why generated SQL: the correctness gate (`__spark_entry__.py`) runs each
Spark query next to an ANSI-SQL oracle in DuckDB. Anything both sides must
compute identically — the lemmatizer's token rules and every hash function —
is emitted here ONCE from the same Python constants
(`searchengine_spark.functions.lemmatize`), so the two sides cannot drift.

Every snippet restricts itself to the intersection of Spark SQL and DuckDB:
``md5``, ``ascii``, ``substr``, ``lower``, ``length``, ``like``, ``case``,
arithmetic. Notably NO ``conv``/``strtol`` (absent in DuckDB) and no
``hash`` (different algorithms) — 32-bit ints are built from md5 hex chars
with ``ascii()`` arithmetic.

Reference citations: the lemmatizer rules transcribe
``/root/reference/src/main/java/searchengine/indexing/impl/
LemmaSearcherImpl.java`` (tokenize :98-101, per-alphabet split :59-78,
POS stop-filter :81-95, ё→е :71) — see functions/lemmatize.py.
"""

from __future__ import annotations

from searchengine_spark.functions.lemmatize import (
    EN_STOPWORDS,
    RU_DICT,
    RU_STOPWORDS,
)

# --------------------------------------------------------------------------
# Portable 32-bit hash: H32(s) = int(md5(s)[0:8], 16), emitted as arithmetic
# over ascii() of hex chars (both dialects lowercase their md5 hex output).
# --------------------------------------------------------------------------


def h32_sql(expr: str) -> str:
    """SQL for the 32-bit integer value of the first 8 md5 hex chars of
    ``expr``. Deterministic and identical in Spark SQL and DuckDB."""
    parts = []
    for i in range(1, 9):
        a = f"ascii(substr(md5({expr}),{i},1))"
        nibble = f"cast({a} - (case when {a} >= 97 then 87 else 48 end) as bigint)"
        parts.append(f"{nibble} * {16 ** (8 - i)}")  # bigint * int → bigint
    return "(" + " + ".join(parts) + ")"


#: universal-hash family over H32: h_k(x) = (A_k*(H32 mod P) + B_k) mod P.
#: P = 2^31-1 (Mersenne prime). All A_k < 2^31 and H32 is reduced mod P
#: before the multiply, so every intermediate stays < 2^62 — no BIGINT
#: overflow in either engine (Spark runs ANSI mode and would throw).
MINHASH_P = 2_147_483_647
_MINHASH_AB = [
    (1103515245, 12345), (1140671485, 12820163), (1664525, 1013904223),
    (22695477, 1), (65793, 4282663), (134775813, 1), (214013, 2531011),
    (16843009, 826366247), (69069, 362437), (1220703125, 7), (32310901, 11),
    (100005491, 33333), (252097563, 71), (179424673, 97), (15485863, 13),
    (982451653, 29),
]


def minhash_sql(expr: str, k: int) -> str:
    """SQL for hash function ``k`` of the universal family applied to H32."""
    a, b = _MINHASH_AB[k]
    return f"(({a} * ({h32_sql(expr)} % {MINHASH_P}) + {b}) % {MINHASH_P})"


def simhash_bit_sql(expr: str, bit: int) -> str:
    """SQL for bit ``bit`` (0-based) of H32(expr) — arithmetic shift, no
    dialect-specific bit operators."""
    return f"((cast(floor({h32_sql(expr)} / {2 ** bit}) as bigint)) % 2)"


# --------------------------------------------------------------------------
# Lemmatizer as SQL (oracle side; the Spark side runs the Python original)
# --------------------------------------------------------------------------

_TOKEN_SPLIT_SQL = "[^А-ЯЁа-яёA-Za-z]+"  # T2, LemmaSearcherImpl.java:98-101


def _in_list(expr: str, words) -> str:
    quoted = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))
    return f"{expr} in ({quoted})"


def en_lemma_sql(w: str) -> str:
    """CASE expression: lowercased EN token → lemma or NULL (stop-filtered).
    Mirrors ``functions.lemmatize._en_lemma`` exactly (suffix rules + the
    stoplist checked before AND after stripping)."""
    stripped = f"""case
      when {w} like '%ies' and length({w}) > 4 then substr({w}, 1, length({w}) - 3) || 'y'
      when {w} like '%sses' then substr({w}, 1, length({w}) - 2)
      when {w} like '%ing' and length({w}) > 5 then substr({w}, 1, length({w}) - 3)
      when {w} like '%ed' and length({w}) > 4 then substr({w}, 1, length({w}) - 2)
      when {w} like '%s' and {w} not like '%ss' and length({w}) > 3 then substr({w}, 1, length({w}) - 1)
      else {w} end"""
    return f"""case
      when {w} = '' or {_in_list(w, EN_STOPWORDS)} then null
      when {_in_list(stripped, EN_STOPWORDS)} then null
      else {stripped} end"""


def ru_lemma_sql(w: str) -> str:
    """CASE expression: lowercased, ё→е-normalized RU token → lemma or NULL.
    Mirrors ``functions.lemmatize._ru_lemma`` (stoplist + dictionary)."""
    dict_cases = " ".join(
        f"when {w} = '{k}' then '{v}'" for k, v in sorted(RU_DICT.items())
    )
    return f"""case
      when {w} = '' or {_in_list(w, RU_STOPWORDS)} then null
      else (case {dict_cases} else {w} end) end"""


def lemmas_cte_sql(doc_table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """DuckDB CTE chain ``tok`` → ``lemmas(doc_id, term)`` reproducing the
    engine's T1–T5 pipeline (one row per lemma OCCURRENCE, order-free).

    A mixed-alphabet token contributes up to one EN and one RU lemma
    (T3, LemmaSearcherImpl.java:59-78) — hence the UNION ALL of branches.
    """
    en_w = "lower(regexp_replace(tok, '[А-ЯЁа-яё]+', '', 'g'))"
    ru_w = "replace(replace(lower(regexp_replace(tok, '[A-Za-z]+', '', 'g')), 'ё', 'е'), 'Ё', 'е')"
    return f"""
tok as (
  select {id_col} as doc_id,
         unnest(regexp_split_to_array({text_col}, '{_TOKEN_SPLIT_SQL}')) as tok
  from {doc_table}
  where {text_col} is not null and {text_col} <> ''
),
lemmas as (
  select doc_id, {en_lemma_sql(en_w)} as term
  from tok where tok <> '' and regexp_matches(tok, '[A-Za-z]')
  union all
  select doc_id, {ru_lemma_sql(ru_w)} as term
  from tok where tok <> '' and regexp_matches(tok, '[А-ЯЁа-яё]')
),
lem as (select doc_id, term from lemmas where term is not null)
"""


def postings_cte_sql(**kw) -> str:
    """…, post(doc_id, term, tf), doclen(doc_id, doc_len) — the flat posting
    rows (T6 tf counting) and per-doc lengths."""
    return (
        lemmas_cte_sql(**kw)
        + """,
post as (select doc_id, term, count(*) as tf from lem group by doc_id, term),
doclen as (select doc_id, count(*) as doc_len from lem group by doc_id)
"""
    )
