"""Similarity search over an embedding column (``array<float>``).

Two paths, mirroring production ANN systems:

- :func:`cosine_topk` — brute-force exact top-k for a (small) probe set:
  broadcast the probes, one pass over the corpus, per-partition top-k via
  ``Window`` + rank filter (Spark's TakeOrderedAndProject shape). Exact;
  O(n·|probes|·d) — the correctness baseline and the right answer when
  |probes| is small.
- :func:`lsh_sign_buckets` / :func:`lsh_bucket_pairs` — the scale path:
  random-hyperplane (here: coordinate-sign) LSH buckets; candidate pairs
  only materialize within a bucket. At 10^12 vectors the bucket key is the
  shuffle key and no n² anything exists.

All arithmetic is JVM-side (``aggregate``/``zip_with`` over array columns,
cast to double before multiplying — float32 inputs, float64 math, same as
the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SCORE_DECIMALS = 5


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, vec_id, cosine): exact top-k cosine neighbors of each
    probe vector (self excluded). Probes are broadcast; ties broken by
    vec_id asc on the ROUNDED score so ranking is float-order independent."""
    probes = F.broadcast(
        embeddings.filter(F.col(id_col).isin(probe_ids)).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    scored = (
        embeddings.crossJoin(probes)
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("vec_id"),
            F.round(
                _dot(F.col(vec_col), F.col("qvec"))
                / (_norm(F.col(vec_col)) * _norm(F.col("qvec"))),
                SCORE_DECIMALS,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def lsh_sign_buckets(
    embeddings: DataFrame,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): sign-bit LSH over the first ``n_bits`` coordinates
    (a fixed, data-independent projection — deterministic and portable).
    bucket = Σ 2^i·[v_i > 0]."""
    bucket = None
    for i in range(n_bits):
        bit = F.when(F.element_at(F.col(vec_col), i + 1) > 0, F.lit(2**i)).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else bucket + bit
    return embeddings.select(
        F.col(id_col).alias("vec_id"), bucket.cast("long").alias("bucket")
    )


def lsh_bucket_pairs(
    embeddings: DataFrame,
    threshold: float = 0.3,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cosine): near-neighbor candidate pairs from shared LSH bucket,
    verified by exact cosine ≥ threshold. The join key is the bucket — the
    only shuffle; no all-pairs stage exists."""
    with_bucket = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).join(lsh_sign_buckets(embeddings, n_bits, id_col, vec_col), "vec_id")
    a = with_bucket.alias("a")
    b = with_bucket.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("a"),
            F.col("b.vec_id").alias("b"),
            F.round(
                _dot(F.col("a.vec"), F.col("b.vec"))
                / (_norm(F.col("a.vec")) * _norm(F.col("b.vec"))),
                SCORE_DECIMALS,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
