"""Point-in-time commits / time-travel — the Lucene IndexCommit +
SnapshotDeletionPolicy + IndexFileDeleter trio (SURVEY §2.6 L8 extension).

Reference analog: Lucene keeps every commit point alive until the
IndexDeletionPolicy releases it, and ``DirectoryReader.open(IndexCommit)``
reads a historical snapshot; the codec under test participates only through
immutable per-segment files (``CuVS2510GPUVectorsWriter.java:143-147``) —
exactly the property our parquet segment dirs replicate. Pinned here:

  * every mutation (segment add, delete batch, compaction) is ONE manifest
    commit: new version + immutable ``commits/commit-v*.json`` copy;
  * ``IndexReader(..., version=N)`` reproduces the results of commit N
    byte-for-byte AFTER later deletes and compaction;
  * pinned tombstones: a reader at a pre-delete commit sees the deleted
    docs, a reader at the delete commit masks them;
  * pinned catalogs are read-only;
  * ``prune_commits`` + ``gc_segments``/``gc_orphan_deletes`` reclaim
    exactly the unreferenced data, and live queries are unaffected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.operators.build import build_index
from cuvs_lucene_spark.operators.deletes import delete_docs, gc_orphan_deletes
from cuvs_lucene_spark.operators.merge import compact
from cuvs_lucene_spark.query import IndexReader, search
from cuvs_lucene_spark.sources import fs
from cuvs_lucene_spark.sources.catalog import CorruptIndexError, IndexCatalog

QUERY = "world school"


def _topk(spark, idx, q=QUERY, k=5, version=None):
    res = search(
        spark, idx, q, k=k, reader=IndexReader(spark, idx, version=version)
    )
    return [(r["doc_id"], round(float(r["score"]), 6)) for r in res.collect()]


@pytest.fixture(scope="module")
def tt_index(spark, tiny_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "timetravel")
    build_index(spark, tiny_df, d, buckets=8, salt_buckets=4, hot_df_ratio=0.10)
    return d


class TestCommitHistory:
    def test_every_mutation_is_a_commit_and_versions_pin_results(
        self, spark, tt_index
    ):
        cat = IndexCatalog(tt_index)
        v_build = cat.read_manifest()["version"]
        commits = cat.list_commits()
        assert [c["version"] for c in commits][-1] == v_build
        assert all(c["n_delete_files"] == 0 for c in commits)

        before = _topk(spark, tt_index)
        victims = [d for d, _ in before[:2]]
        rd = IndexReader(spark, tt_index)
        keys = (
            rd.cat.read_doc_dim(spark)
            .where(F.col("doc_id").isin(victims))
            .select("conv_id", "turn_idx")
        )
        assert delete_docs(spark, tt_index, keys) == 2
        v_del = IndexCatalog(tt_index).read_manifest()["version"]
        assert v_del == v_build + 1  # the delete batch is a first-class commit
        assert IndexCatalog(tt_index).list_commits()[-1]["n_delete_files"] == 1

        # live view masks; the pre-delete commit still returns the victims
        live = _topk(spark, tt_index)
        assert not {d for d, _ in live} & set(victims)
        assert _topk(spark, tt_index, version=v_build) == before
        # the delete commit itself, pinned, masks (tombstones are pinned too)
        assert _topk(spark, tt_index, version=v_del) == live

        # compaction purges the victims and commits once more
        meta = compact(spark, tt_index)
        assert meta is not None
        v_compact = IndexCatalog(tt_index).read_manifest()["version"]
        assert v_compact == v_del + 1
        assert IndexCatalog(tt_index).list_commits()[-1]["n_delete_files"] == 0

        # all three snapshots coexist and answer differently/identically
        assert _topk(spark, tt_index, version=v_build) == before
        assert _topk(spark, tt_index, version=v_del) == live
        # post-compaction stats drop the deleted docs (Lucene post-merge), so
        # scores may shift — but the masked SET is the same
        assert {d for d, _ in _topk(spark, tt_index)} == {d for d, _ in live}

    def test_pinned_catalog_is_read_only(self, spark, tt_index):
        v = IndexCatalog(tt_index).read_manifest()["version"]
        pinned = IndexCatalog(tt_index, version=v)
        with pytest.raises(RuntimeError, match="read-only"):
            pinned.commit_segment({"id": 999})
        with pytest.raises(RuntimeError, match="read-only"):
            pinned.set_delete_files([])
        with pytest.raises(RuntimeError, match="read-only"):
            pinned.prune_commits()
        with pytest.raises(RuntimeError, match="read-only"):
            pinned.gc_segments()

    def test_unknown_version_is_loud(self, spark, tt_index):
        with pytest.raises(CorruptIndexError, match="commit v99999999"):
            IndexReader(spark, tt_index, version=99999999)

    def test_prune_and_gc_reclaim_unreferenced_only(self, spark, tt_index):
        # runs AFTER the mutation test (module-scoped index): history holds
        # build/delete/compact commits; old seg dirs + tombstone batch exist.
        cat = IndexCatalog(tt_index)
        commits = cat.list_commits()
        assert len(commits) >= 3
        live_v = cat.read_manifest()["version"]
        live_ids = {s["id"] for s in cat.read_manifest()["segments"]}
        old_ids = cat.referenced_segment_ids() - live_ids
        assert old_ids  # compaction left the merged-away segments on disk

        # snapshot-hold: keeping the pre-delete commit keeps its segments
        v_build = commits[0]["version"]
        pruned = cat.prune_commits(keep_last=1, keep=(v_build,))
        assert live_v not in pruned and v_build not in pruned
        assert cat.gc_segments() == []  # v_build still references the old segs
        before = _topk(spark, tt_index, version=v_build)
        assert before  # held snapshot still fully readable

        # release the hold: now the old segments + tombstone batch reclaim
        pruned2 = cat.prune_commits(keep_last=1)
        assert v_build in pruned2
        reclaimed = cat.gc_segments()
        assert set(reclaimed) == old_ids
        for sid in reclaimed:
            assert not fs.isdir(cat.seg_dir(sid))
        assert gc_orphan_deletes(tt_index)  # delete batch now unreferenced
        with pytest.raises(CorruptIndexError):
            IndexReader(spark, tt_index, version=v_build)
        # live view untouched
        assert _topk(spark, tt_index)
        IndexCatalog(tt_index).check_index()


class TestWriteLock:
    """Lucene write.lock / LockObtainFailedException analog: every manifest
    read-modify-write is a critical section; a second concurrent writer
    fails loudly instead of losing an update; crashed writers' stale locks
    are broken after stale_after."""

    def test_contender_times_out_then_succeeds(self, spark, tt_index):
        from cuvs_lucene_spark.sources.catalog import LockObtainFailedError

        cat = IndexCatalog(tt_index)
        hold = cat.write_lock()
        hold.__enter__()
        try:
            with pytest.raises(LockObtainFailedError, match="write lock held"):
                with IndexCatalog(tt_index).write_lock(timeout=0.3):
                    pass
        finally:
            hold.__exit__(None, None, None)
        # released → mutation commits normally
        v0 = cat.read_manifest()["version"]
        cat.set_delete_files(cat.delete_files())
        assert cat.read_manifest()["version"] == v0 + 1

    def test_stale_lock_is_broken(self, spark, tt_index):
        cat = IndexCatalog(tt_index)
        fs.write_bytes_atomic(
            fs.join(tt_index, "write.lock"), b'{"owner": "crashed"}'
        )
        import time as _t

        _t.sleep(0.2)
        v0 = cat.read_manifest()["version"]
        with cat.write_lock(timeout=1.0, stale_after=0.1):
            pass  # acquired by breaking the stale lock
        cat.set_delete_files(cat.delete_files())
        assert cat.read_manifest()["version"] == v0 + 1
        assert not fs.exists(fs.join(tt_index, "write.lock"))

    def test_concurrent_delete_batches_never_lose_updates(
        self, spark, tiny_df, tmp_path_factory
    ):
        """Two threads each commit 8 tombstone batches against one index;
        the final manifest must hold all 16 entries (the append RMW is one
        critical section)."""
        from concurrent.futures import ThreadPoolExecutor

        from cuvs_lucene_spark.operators.build import build_index

        d = str(tmp_path_factory.mktemp("lock") / "idx")
        build_index(spark, tiny_df.limit(300), d, buckets=8, salt_buckets=4,
                    hot_df_ratio=0.10)
        cat = IndexCatalog(d)

        def appender(worker: int) -> None:
            for i in range(8):
                cat.append_delete_files(
                    [{"path": f"batch-w{worker}-{i}/part.parquet", "bytes": 1}]
                )

        with ThreadPoolExecutor(2) as ex:
            list(ex.map(appender, [0, 1]))
        assert len(cat.delete_files()) == 16
