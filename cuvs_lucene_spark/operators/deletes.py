"""Delete handling — the liveDocs analog (SURVEY.md §2.5).

Reference semantics (``TestCuVSDeletedDocuments.java:69-132,213-255``):
deleted docs are masked at search time (liveDocs bitset) and physically
purged at merge; collection stats (df, avgdl) still include deleted docs
until the segments holding them are merged — we replicate exactly that:

  * ``delete_docs`` appends tombstone keys (conv_id, turn_idx) to a
    ledger-pinned deletes table (delete-by-term analog,
    ``TestCuVSDeletedDocuments.java:93``) — O(deletes) I/O, no index rewrite;
  * ``search`` anti-joins live results against the tombstones (D1);
  * ``compact`` (operators/merge.py) rewrites segments without the deleted
    postings and recomputes stats (the purge).

Commit protocol: tombstones follow the same write-data → write-file-list →
swap-pointer shape as the three segment tables (sources/catalog.py). Each
``delete_docs`` call writes its parquet parts into a fresh ``batch-<uuid>``
directory, then atomically replaces ``deletes/ledger.json`` with the full
committed file list. Readers consume ONLY ledger-listed files, so a dead or
zombie delete attempt's partial part-file is invisible — the deletes table
no longer relies on directory-scan append reads (which on S3-class stores
would surface orphans). Single-writer per index is the documented contract
(Lucene IndexWriter lock analog), so the read-modify-write of the ledger
needs no compare-and-swap.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.sources import fs
from cuvs_lucene_spark.sources.catalog import IndexCatalog

DELETES_SCHEMA = "conv_id string, turn_idx int, deleted_at timestamp"
LEDGER_NAME = "ledger.json"


def deletes_path(index_dir: str) -> str:
    return fs.join(index_dir, "deletes")


def _ledger_path(index_dir: str) -> str:
    return fs.join(deletes_path(index_dir), LEDGER_NAME)


def _read_ledger(index_dir: str) -> list[dict]:
    """Committed tombstone file entries [{path, bytes}] (paths relative to
    the deletes dir); [] when no delete has ever been committed."""
    lp = _ledger_path(index_dir)
    if not fs.exists(lp):
        return []
    return json.loads(fs.read_bytes(lp).decode("utf-8"))["files"]


def has_deletes(index_dir: str) -> bool:
    return bool(_read_ledger(index_dir))


def delete_docs(spark: SparkSession, index_dir: str, keys: DataFrame) -> int:
    """Commit tombstones for (conv_id, turn_idx) keys; returns #keys appended.

    Idempotent at read time (tombstones are deduped when applied), so
    re-committing the same keys after a retry is harmless. Crash-safe: the
    batch directory is written first and only becomes visible when the
    ledger swap (atomic temp+rename, fs.write_bytes_atomic) lands.
    """
    n = keys.count()
    if n == 0:
        return 0
    batch = f"batch-{uuid.uuid4().hex[:12]}"
    batch_dir = fs.join(deletes_path(index_dir), batch)
    (
        keys.select("conv_id", F.col("turn_idx").cast("int"))
        .withColumn("deleted_at", F.current_timestamp())
        .coalesce(1)
        .write.mode("error")
        .parquet(batch_dir)
    )
    entries = _read_ledger(index_dir)
    entries += [
        {"path": fs.join(batch, rel), "bytes": size}
        for rel, size in fs.list_files_recursive(batch_dir)
        if rel.endswith(".parquet")
    ]
    fs.write_bytes_atomic(
        _ledger_path(index_dir),
        json.dumps({"files": entries}, indent=1).encode("utf-8"),
    )
    return int(n)


def read_delete_keys(spark: SparkSession, index_dir: str) -> DataFrame | None:
    entries = _read_ledger(index_dir)
    if not entries:
        return None
    base = deletes_path(index_dir)
    return (
        spark.read.parquet(*[fs.join(base, e["path"]) for e in entries])
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


def check_delete_files(index_dir: str) -> dict:
    """CheckIndex-style verification of the tombstone ledger: every ledger
    entry must exist with exactly the recorded byte size; batch files on
    disk but absent from the ledger are reported as orphans (left by dead
    delete attempts — invisible to readers, reclaimable)."""
    base = deletes_path(index_dir)
    entries = _read_ledger(index_dir)
    on_disk = {rel: size for rel, size in fs.list_files_recursive(base)}
    for e in entries:
        got = on_disk.get(e["path"])
        if got is None:
            raise IOError(f"deletes ledger entry missing on disk: {e['path']}")
        if got != e["bytes"]:
            raise IOError(
                f"deletes file size mismatch {e['path']}: "
                f"ledger {e['bytes']} vs disk {got}"
            )
    committed = {e["path"] for e in entries}
    orphans = [
        rel
        for rel in on_disk
        if rel not in committed
        and rel != LEDGER_NAME
        and not rel.split("/")[-1].startswith(("_", "."))
    ]
    return {"files": len(entries), "orphans": orphans}


def gc_orphan_deletes(index_dir: str) -> list[str]:
    """Reclaim tombstone part-files not referenced by the ledger (dead
    delete attempts). Safe because readers only consume ledger entries."""
    report = check_delete_files(index_dir)
    base = deletes_path(index_dir)
    for rel in report["orphans"]:
        fs.delete_file(fs.join(base, rel))
    return report["orphans"]


def clear_deletes(index_dir: str) -> None:
    """Drop the tombstone table (called after compaction purges them)."""
    fs.delete_dir(deletes_path(index_dir))
