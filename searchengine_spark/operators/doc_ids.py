"""Dense global doc-id assignment (SURVEY §4.3.1).

The reference gets doc ids for free from MySQL's autoincrement PK
(``model/Page.java:16-18``). At 10^12 rows a single-partition
``row_number()`` window is not an option, so this is the classic two-pass
zipWithIndex shape, expressed with DataFrame ops only:

1. range-partition by the total order ``(conv_id, turn_idx)`` —
   ``repartitionByRange`` keeps partition index == key-range order;
2. one small job counts rows per partition → driver cumsums to offsets
   (P integers, trivially broadcastable at any scale);
3. ``row_number()`` windowed **per partition id** (parallel — no global
   window) + the partition's offset.

The assignment is reproducible for a given input regardless of the sampled
range boundaries: partitions are disjoint ordered key ranges, so
offset(pid) + rank-within-pid is the global rank either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


class DuplicateKeysError(ValueError):
    """Input rows repeat the primary key (M4, SURVEY §2.4): the reference's
    PK-backed tables make duplicate (site, path) unrepresentable
    (``model/Page.java:14-39`` unique identity); here a silent
    ``dense_rank`` collapse would corrupt tf semantics with no signal, so
    the build fails loudly instead."""


def assign_doc_ids(
    df: DataFrame,
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    parallelism: int = 32,
    id_col: str = "doc_id",
    persist: bool = True,
    expect_unique: bool = False,
) -> DataFrame:
    """Add a dense 0-based ``id_col`` ordered by ``key_cols``.

    Keys MAY repeat across rows (e.g. one row per posting of a document):
    ids are assigned per distinct key via ``dense_rank`` within each range
    partition + per-partition distinct-count offsets, so the caller can
    explode payload BEFORE this shuffle and keep the shuffled rows skinny.
    (Shuffling or caching ``map``-typed payload was measured ~10× the cost
    of the shuffle itself — complex-type serialization dominates — so the
    build pipeline explodes the per-doc tf maps first and sends only flat
    posting rows through here.)

    The returned DataFrame is persisted (the offsets job already
    materialized the exchange; later actions would otherwise recompute the
    whole upstream, since physical plans are not shared across actions).
    Callers should ``unpersist()`` when done.
    """
    parts = df.repartitionByRange(
        parallelism, *[F.col(c) for c in key_cols]
    ).withColumn("_pid", F.spark_partition_id())
    if persist:
        parts = parts.persist(StorageLevel.MEMORY_AND_DISK)
    # one job: per-partition distinct-key counts (the id offsets) and — in
    # the same pass — raw row counts for the M4 duplicate-PK check
    count_rows = (
        parts.groupBy("_pid")
        .agg(F.countDistinct(*key_cols).alias("n"), F.count("*").alias("raw"))
        .collect()
    )
    counts = {r["_pid"]: r["n"] for r in count_rows}
    if expect_unique:
        n_dup = sum(r["raw"] - r["n"] for r in count_rows)
        if n_dup:
            raise DuplicateKeysError(
                f"{n_dup} input rows repeat an existing {key_cols} key"
            )
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    offsets_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(*key_cols)
    return (
        parts.join(offsets_df, "_pid")
        .withColumn(id_col, F.col("_offset") + F.dense_rank().over(w) - 1)
        .drop("_pid", "_offset")
    )
