"""Index administration: addIndexes / backup+restore / rollback / NRT reopen.

Reference analog: ``IndexWriter.addIndexes(Directory...)`` splices foreign
segments into an index by file copy + SegmentInfos commit; the codec under
test participates only through its immutable per-segment files
(``CuVS2510GPUVectorsWriter.java:143-147``). Pinned here:

  * importing index B into index A reproduces — byte-for-byte, including
    docIDs and tie-breaks — the index built over A∪B in one shot, when B's
    rows sort after A's (delta blocks are shift-invariant; only the
    first_doc/last_doc anchors move);
  * source tombstones travel with the import;
  * incompatible build parameters are refused loudly;
  * backup_files + restore_backup yield a readable index with identical
    results; rollback_to un-does a delete as a new linear commit;
  * IndexReader.open_if_changed is None when current, fresh after a commit.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.operators.admin import add_indexes
from cuvs_lucene_spark.operators.build import build_index
from cuvs_lucene_spark.operators.deletes import delete_docs
from cuvs_lucene_spark.query import IndexReader, search
from cuvs_lucene_spark.sources import fs
from cuvs_lucene_spark.sources.catalog import IndexCatalog

QUERIES = ["world school", "merge", "plan review team"]
SPLIT_CONV = "conv-00000120"  # rows of the halves sort A-then-B


def _topk(spark, idx, q, k=8, reader=None):
    res = search(spark, idx, q, k=k, reader=reader)
    return [(r["doc_id"], round(float(r["score"]), 6)) for r in res.collect()]


@pytest.fixture(scope="module")
def halves(spark, tiny_df, tmp_path_factory):
    root = tmp_path_factory.mktemp("addidx")
    a, b, full = str(root / "a"), str(root / "b"), str(root / "full")
    kw = dict(buckets=8, salt_buckets=4, hot_df_ratio=0.10)
    build_index(spark, tiny_df.where(F.col("conv_id") < SPLIT_CONV), a, **kw)
    build_index(spark, tiny_df.where(F.col("conv_id") >= SPLIT_CONV), b, **kw)
    build_index(spark, tiny_df, full, **kw)
    return a, b, full


class TestAddIndexes:
    def test_import_equals_single_shot_build(self, spark, halves):
        a, b, full = halves
        imported = add_indexes(spark, a, b)
        assert len(imported) == 1 and imported[0]["imported_from"]["index"] == b
        ra, rf = IndexReader(spark, a), IndexReader(spark, full)
        assert (ra.n_docs, ra.sum_dl) == (rf.n_docs, rf.sum_dl)
        for q in QUERIES:
            assert _topk(spark, a, q) == _topk(spark, full, q)
        IndexCatalog(a).check_index()

    def test_incompatible_build_params_refused(self, spark, tiny_df, halves, tmp_path_factory):
        a = halves[0]
        other = str(tmp_path_factory.mktemp("addidx") / "wrongbuckets")
        build_index(
            spark, tiny_df.limit(50), other,
            buckets=16, salt_buckets=4, hot_df_ratio=0.10,
        )
        with pytest.raises(ValueError, match="incompatible index"):
            add_indexes(spark, a, other)

    def test_source_tombstones_travel(self, spark, tiny_df, tmp_path_factory):
        root = tmp_path_factory.mktemp("addidx_del")
        a, b = str(root / "a"), str(root / "b")
        kw = dict(buckets=8, salt_buckets=4, hot_df_ratio=0.10)
        build_index(spark, tiny_df.where(F.col("conv_id") < SPLIT_CONV), a, **kw)
        build_index(spark, tiny_df.where(F.col("conv_id") >= SPLIT_CONV), b, **kw)
        top_b = _topk(spark, b, "world school", k=2)
        rb = IndexReader(spark, b)
        keys = (
            rb.cat.read_doc_dim(spark)
            .where(F.col("doc_id").isin([d for d, _ in top_b]))
            .select("conv_id", "turn_idx")
        )
        victim_keys = {(r["conv_id"], r["turn_idx"]) for r in keys.collect()}
        assert delete_docs(spark, b, keys) == 2
        add_indexes(spark, a, b)
        hits = search(spark, a, "world school", k=50).collect()
        assert not {(r["conv_id"], r["turn_idx"]) for r in hits} & victim_keys


class TestBackupRollbackReopen:
    def test_backup_restore_roundtrip(self, spark, halves, tmp_path_factory):
        a = halves[0]  # post-import, post-tombstone state of the module index
        cat = IndexCatalog(a)
        files = cat.backup_files()
        assert any(f.startswith("commits/") for f in files)
        dst = str(tmp_path_factory.mktemp("bk") / "restore")
        for rel in files:
            src_p, dst_p = fs.join(a, rel), fs.join(dst, rel)
            fs.mkdirs(dst_p.rsplit("/", 1)[0])
            shutil.copyfile(src_p, dst_p)
        restored = IndexCatalog.restore_backup(dst)
        restored.check_index()
        for q in QUERIES:
            assert _topk(spark, dst, q) == _topk(spark, a, q)

    def test_rollback_and_open_if_changed(self, spark, tiny_df, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("rb") / "idx")
        build_index(spark, tiny_df.limit(400), d, buckets=8, salt_buckets=4,
                    hot_df_ratio=0.10)
        rd0 = IndexReader(spark, d)
        assert rd0.open_if_changed() is None  # current
        v0 = IndexCatalog(d).read_manifest()["version"]
        before = _topk(spark, d, "world school")

        keys = rd0.cat.read_doc_dim(spark).limit(5).select("conv_id", "turn_idx")
        assert delete_docs(spark, d, keys) == 5
        rd1 = rd0.open_if_changed()  # delete batch is a commit → fresh reader
        assert rd1 is not None and rd1.manifest["version"] == v0 + 1

        cat = IndexCatalog(d)
        cat.rollback_to(v0)  # un-delete, linear history
        assert cat.read_manifest()["version"] == v0 + 2
        assert not cat.delete_files()
        assert _topk(spark, d, "world school") == before
        # a pruned commit refuses rollback
        cat.prune_commits(keep_last=1)
        with pytest.raises(Exception, match="not retained"):
            cat.rollback_to(v0)


class TestDiskUsage:
    def test_disk_usage_matches_check_files_and_updates(
        self, spark, tiny_df, tmp_path_factory
    ):
        """disk_usage == committed bytes per check_files; orphans NOT
        counted; a delete batch adds tombstone bytes; metadata-only."""
        d = str(tmp_path_factory.mktemp("du") / "idx")
        build_index(spark, tiny_df.limit(500), d, buckets=8, salt_buckets=4,
                    hot_df_ratio=0.10)
        cat = IndexCatalog(d)
        du = cat.disk_usage()
        cf = cat.check_files()
        assert set(du["segments"]) == set(cf)
        for sid, rep in cf.items():
            assert du["segments"][sid]["bytes"] == rep["bytes"]
            per = du["segments"][sid]
            assert per["bytes"] == sum(
                per[t]["bytes"] for t in ("doc_dim", "postings", "dictionary")
            )
            assert per["postings"]["bytes"] > 0
        assert du["deletes"] == {"files": 0, "bytes": 0}
        assert du["commits"]["files"] >= 1
        assert du["total_bytes"] == (
            sum(s["bytes"] for s in du["segments"].values())
            + du["commits"]["bytes"]
        )

        # plant an orphan: usage unchanged (it is not index state)
        sid = next(iter(du["segments"]))
        orphan = fs.join(cat._table_dir(sid, "postings"), "part-orphan.parquet")
        fs.write_bytes_atomic(orphan, b"x" * 1234)
        assert cat.disk_usage()["total_bytes"] == du["total_bytes"]

        # a delete batch becomes visible as tombstone bytes
        victims = spark.createDataFrame(
            [(r["conv_id"], r["turn_idx"])
             for r in cat.read_doc_dim(spark).limit(3).collect()],
            "conv_id string, turn_idx int",
        )
        delete_docs(spark, d, victims)
        du2 = cat.reopen().disk_usage() if hasattr(cat, "reopen") else IndexCatalog(d).disk_usage()
        assert du2["deletes"]["files"] >= 1 and du2["deletes"]["bytes"] > 0
        assert du2["total_bytes"] > du["total_bytes"]


class TestDescribeIndex:
    def test_overview_matches_oracle_facts(self, spark, tiny_df, oracle_tiny,
                                           tmp_path_factory):
        from cuvs_lucene_spark.query import describe_index

        d = str(tmp_path_factory.mktemp("desc") / "idx")
        build_index(spark, tiny_df, d, buckets=8, salt_buckets=4,
                    hot_df_ratio=0.10)
        ov = describe_index(spark, d, top_terms=5)
        f = ov["fields"]["text"]
        assert f["doc_count"] == oracle_tiny.n_docs
        assert abs(f["avgdl"] - oracle_tiny.avgdl) < 1e-6
        assert f["n_terms"] == len(oracle_tiny.postings)
        want_top = sorted(
            ((t, len(p[0])) for t, p in oracle_tiny.postings.items()),
            key=lambda x: (-x[1], x[0]),
        )[:5]
        assert f["top_terms"] == want_top
        assert ov["analyzer"] == "standard" and ov["n_deleted"] == 0
        assert ov["disk_usage"]["total_bytes"] > 0
        assert [s["id"] for s in ov["segments"]] == [0]

        # deletes show up
        victims = spark.createDataFrame(
            [(r["conv_id"], r["turn_idx"]) for r in
             IndexCatalog(d).read_doc_dim(spark).limit(4).collect()],
            "conv_id string, turn_idx int",
        )
        delete_docs(spark, d, victims)
        assert describe_index(spark, d)["n_deleted"] == 4
