"""Stable global docID assignment — the two-level Lucene docBase scheme.

Reference semantics: segment-local dense docIDs plus a per-segment docBase
accumulated across readers (``CuVS2510GPUVectorsWriter.java:376-386``); index
sorting fixes the order before ids are assigned (``:316-329``). Spark
re-expression (SURVEY.md §1.2): range-partition + sort by (conv_id, turn_idx)
— Spark's sort IS the Sorter.DocMap — then doc_id = partition_base +
local_offset, with bases computed from per-partition counts. No global
single-partition window: the only cross-partition step is a tiny
per-partition-count aggregation broadcast back, so this scales to 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# monotonically_increasing_id packs (partition_id << 33) | local_offset.
_MID_PART_SHIFT = 33


def assign_doc_ids(
    df: DataFrame,
    num_partitions: int | None = None,
    return_cached: bool = False,
) -> DataFrame:
    """Return df + doc_id (long), densely numbered in (conv_id, turn_idx) order.

    The input is persisted mid-flight: monotonically_increasing_id is only
    deterministic for a FIXED partitioning (repartitionByRange samples
    non-deterministically), and the ids are read twice (bases, then final).
    With return_cached=True, returns (out, cached_df) so the caller can
    unpersist the cache once every downstream consumer has run — the result
    stays correct only while the cache lives, so unpersist LAST.
    """
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    sorted_df = (
        df.repartitionByRange(int(n), "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()
    )
    sorted_df.count()  # materialize so both reads see identical ids

    parts = (
        sorted_df.select(F.shiftrightunsigned("_mid", _MID_PART_SHIFT).alias("_pid"))
        .groupBy("_pid")
        .count()
        .orderBy("_pid")
        .collect()
    )  # one row per partition — tiny even at 10^5 partitions
    base = 0
    bases = []
    for r in parts:
        bases.append((r["_pid"], base))
        base += r["count"]
    bases_df = F.broadcast(
        df.sparkSession.createDataFrame(bases, "`_pid` long, `_base` long")
    )

    out = (
        sorted_df.withColumn("_pid", F.shiftrightunsigned("_mid", _MID_PART_SHIFT))
        .join(bases_df, "_pid")
        .withColumn(
            "doc_id",
            (F.col("_base") + F.col("_mid").bitwiseAND(F.lit((1 << _MID_PART_SHIFT) - 1))).cast("long"),
        )
        .drop("_pid", "_mid", "_base")
    )
    if return_cached:
        return out, sorted_df
    return out
