"""Numeric doc-values updates — the ``updateNumericDocValue`` analog.

Lucene lets a writer update a numeric doc-value field for all docs matching
a term WITHOUT rewriting the segment: the update lands in a tiny new
doc-values generation file (``.dvm``/``.dvd`` gen N+1) and readers overlay
it onto the base values (reference build pins Lucene 10.2.0 via
``pom.xml:42-43``; the cuvs reference itself delegates doc-values entirely
to Lucene). We replicate exactly that shape on the index catalog:

  * ``update_doc_values`` appends a small parquet batch of
    ``(conv_id, turn_idx, value)`` rows under ``dv/batch-<uuid>/`` and
    commits it into the manifest's ``dv_files`` list — O(updates) I/O,
    no postings/doc_dim rewrite, a first-class index commit (new version,
    immutable commit copy), the same write-data → pin-file-list →
    swap-pointer protocol as tombstones (operators/deletes.py);
  * readers resolve a field via ``read_doc_values``: batches carry the
    commit version they landed in (``seq``), and the newest value per key
    wins — Lucene's "highest doc-values generation wins" rule;
  * ``IndexReader.doc_dim_view`` (query.py) overlays every committed DV
    field onto doc_dim, so ``search(..., boost_by="<dv_field>")``
    (FunctionScoreQuery analog) re-ranks on updated values immediately —
    no reindex, exactly like Lucene's
    ``IndexWriter.updateNumericDocValue`` + ``FeatureField`` reranking;
  * point-in-time readers see the DV state of their pinned commit (the
    ``dv_files`` list is part of the commit), and ``rollback_to`` restores
    it with the segment set.

Keys are ``(conv_id, turn_idx)`` — the same index-independent identity the
tombstone table uses — so DV overlays survive compaction and addIndexes
splices untouched: merges renumber docIDs, never conversation keys.

Scale shape: overlays are assumed small relative to the corpus (Lucene's
DV-update files likewise hold only updated docs). The read path is one
narrow scan of the pinned batch files + a key-grouped last-write-wins
aggregate; the query-side overlay join broadcasts the DV side, so doc_dim
never reshuffles. A pathological overlay approaching corpus size should be
folded into the base table by a rebuild — same advice Lucene gives when
DV generations pile up (forceMerge folds them in).
"""

from __future__ import annotations

import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.sources import fs
from cuvs_lucene_spark.sources.catalog import IndexCatalog

DV_DIR = "dv"


def _as_cat(index: str | IndexCatalog) -> IndexCatalog:
    return IndexCatalog(index) if isinstance(index, str) else index


def dv_path(index_dir: str) -> str:
    return fs.join(index_dir, DV_DIR)


def update_doc_values(
    spark: SparkSession,
    index: str | IndexCatalog,
    dv_field: str,
    updates: DataFrame,
    default: float = 0.0,
) -> int:
    """Commit a numeric doc-values update batch; returns #keys written.

    ``updates`` must carry (conv_id, turn_idx, value). One value per key
    per batch (duplicates are dropped arbitrarily — callers wanting
    deterministic content must pre-aggregate, exactly as Lucene's
    updateNumericDocValue applies ONE value per term per call). ``default``
    is the value docs WITHOUT an update resolve to; it is recorded on the
    field's first update and immutable afterwards (the field's "missing"
    value). Crash-safe: the batch directory is written first and becomes
    visible only when the manifest commit lands.
    """
    if dv_field in ("doc_id", "conv_id", "turn_idx", "role", "ts", "dl"):
        raise ValueError(
            f"dv field {dv_field!r} collides with a base doc_dim column"
        )
    cat = _as_cat(index)
    n = updates.count()
    if n == 0:
        return 0
    batch = f"batch-{uuid.uuid4().hex[:12]}"
    batch_dir = fs.join(dv_path(cat.index_dir), batch)
    (
        updates.select(
            "conv_id",
            F.col("turn_idx").cast("int"),
            F.col("value").cast("double"),
        )
        .dropDuplicates(["conv_id", "turn_idx"])
        .coalesce(1)
        .write.mode("error")
        .parquet(batch_dir)
    )
    cat.append_dv_files(
        dv_field,
        float(default),
        [
            {"path": fs.join(batch, rel), "bytes": size}
            for rel, size in fs.list_files_recursive(batch_dir)
            if rel.endswith(".parquet")
        ],
    )
    return int(n)


def read_doc_values(
    spark: SparkSession, index: str | IndexCatalog, dv_field: str
) -> DataFrame | None:
    """Resolved (conv_id, turn_idx, value) for one DV field — last-write-wins
    across batches by commit version (Lucene: highest dv generation wins).
    None when the field has no committed updates in this snapshot. Pass a
    pinned catalog for the DV state as of a historical commit."""
    cat = _as_cat(index)
    entries = [e for e in cat.dv_files() if e["field"] == dv_field]
    if not entries:
        return None
    base = dv_path(cat.index_dir)
    by_seq: dict[int, list[str]] = {}
    for e in entries:
        by_seq.setdefault(int(e["seq"]), []).append(e["path"])
    parts = [
        spark.read.parquet(*[fs.join(base, p) for p in paths]).withColumn(
            "_seq", F.lit(seq)
        )
        for seq, paths in by_seq.items()
    ]
    allb = reduce(DataFrame.unionByName, parts)
    return allb.groupBy("conv_id", "turn_idx").agg(
        F.max_by("value", "_seq").alias("value")
    )


def check_dv_files(index: str | IndexCatalog) -> dict:
    """CheckIndex-style verification of the DV overlay: every
    manifest-listed entry must exist with exactly the recorded byte size;
    on-disk batch files referenced by NO retained commit are reported as
    orphans (dead update attempts — invisible to readers, reclaimable)."""
    cat = _as_cat(index)
    base = dv_path(cat.index_dir)
    entries = cat.dv_files()
    on_disk = dict(fs.list_files_recursive(base)) if fs.isdir(base) else {}
    for e in entries:
        got = on_disk.get(e["path"])
        if got is None:
            raise IOError(f"committed dv file missing on disk: {e['path']}")
        if got != e["bytes"]:
            raise IOError(
                f"dv file size mismatch {e['path']}: "
                f"committed {e['bytes']} vs disk {got}"
            )
    referenced = {e["path"] for e in entries} | cat.referenced_dv_paths()
    orphans = [
        rel
        for rel in on_disk
        if rel not in referenced
        and not rel.split("/")[-1].startswith(("_", "."))
    ]
    return {"files": len(entries), "orphans": orphans}


def gc_orphan_dv(index: str | IndexCatalog) -> list[str]:
    """Reclaim DV part-files referenced by no retained commit. Run AFTER
    prune_commits, like gc_segments / gc_orphan_deletes."""
    cat = _as_cat(index)
    report = check_dv_files(cat)
    base = dv_path(cat.index_dir)
    for rel in report["orphans"]:
        fs.delete_file(fs.join(base, rel))
    return report["orphans"]
