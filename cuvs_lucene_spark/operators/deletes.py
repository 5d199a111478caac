"""Delete handling — the liveDocs analog (SURVEY.md §2.5).

Reference semantics (``TestCuVSDeletedDocuments.java:69-132,213-255``):
deleted docs are masked at search time (liveDocs bitset) and physically
purged at merge; collection stats (df, avgdl) still include deleted docs
until the segments holding them are merged — we replicate exactly that:

  * ``delete_docs`` appends tombstone keys (conv_id, turn_idx) to an
    append-only deletes table (delete-by-term analog,
    ``TestCuVSDeletedDocuments.java:93``) — O(deletes) I/O, no index rewrite;
  * ``search`` anti-joins live results against the tombstones (D1);
  * ``compact`` (operators/merge.py) rewrites segments without the deleted
    postings and recomputes stats (the purge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.sources import fs
from cuvs_lucene_spark.sources.catalog import IndexCatalog

DELETES_SCHEMA = "conv_id string, turn_idx int, deleted_at timestamp"


def deletes_path(index_dir: str) -> str:
    return fs.join(index_dir, "deletes")


def has_deletes(index_dir: str) -> bool:
    return any(f.endswith(".parquet") for f in fs.listdir(deletes_path(index_dir)))


def delete_docs(spark: SparkSession, index_dir: str, keys: DataFrame) -> int:
    """Append tombstones for (conv_id, turn_idx) keys; returns #keys appended.

    Idempotent at read time (tombstones are deduped when applied), so
    re-appending the same keys after a retry is harmless.
    """
    n = keys.count()
    if n == 0:
        return 0
    (
        keys.select("conv_id", F.col("turn_idx").cast("int"))
        .withColumn("deleted_at", F.current_timestamp())
        .coalesce(1)
        .write.mode("append")
        .parquet(deletes_path(index_dir))
    )
    return int(n)


def read_delete_keys(spark: SparkSession, index_dir: str) -> DataFrame | None:
    if not has_deletes(index_dir):
        return None
    return (
        spark.read.parquet(deletes_path(index_dir))
        .select("conv_id", "turn_idx")
        .dropDuplicates(["conv_id", "turn_idx"])
    )


def deleted_doc_ids(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Tombstone keys → doc_ids via the doc_dim map (the ordToDoc authority).

    Deletes are assumed small relative to the corpus; the join broadcasts the
    tombstone side so this never shuffles doc_dim.
    """
    keys = read_delete_keys(spark, index_dir)
    if keys is None:
        return None
    dd = IndexCatalog(index_dir).read_doc_dim(spark)
    return dd.join(F.broadcast(keys), ["conv_id", "turn_idx"], "inner").select("doc_id")


def clear_deletes(index_dir: str) -> None:
    """Drop the tombstone table (called after compaction purges them)."""
    fs.delete_dir(deletes_path(index_dir))
