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


def assign_doc_ids(
    df: DataFrame,
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    parallelism: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a dense 0-based ``doc_id`` ordered by ``key_cols``.

    The returned DataFrame is persisted (MEMORY_AND_DISK) because the offset
    computation already materialized the partitioning; callers writing it to
    a table should ``unpersist()`` afterwards.
    """
    parts = (
        df.repartitionByRange(parallelism, *[F.col(c) for c in key_cols])
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {r["_pid"]: r["n"] for r in parts.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
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
        .withColumn(id_col, F.col("_offset") + F.row_number().over(w) - 1)
        .drop("_pid", "_offset")
    )
