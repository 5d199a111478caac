"""Numeric doc-values updates (updateNumericDocValue analog).

Pins: (1) a committed DV field re-ranks boost_by searches exactly like the
equivalent doc_dim expression — no reindex; (2) last-write-wins across
batches by commit version; (3) point-in-time readers see the DV state of
their pinned commit; (4) rollback restores the DV ledger; (5) overlays
survive compaction (keys are index-independent); (6) the DV ledger has the
same check/gc surface as tombstones; (7) sort-by-DV-field overlays too.

Lucene reference behavior: IndexWriter.updateNumericDocValue writes a new
dv generation without touching postings; the newest generation wins;
commits pin generations (point-in-time + rollback come for free).
"""

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.operators.build import build_index
from cuvs_lucene_spark.operators.docvalues import (
    check_dv_files,
    gc_orphan_dv,
    read_doc_values,
    update_doc_values,
)
from cuvs_lucene_spark.query import IndexReader, search, search_sorted
from cuvs_lucene_spark.sources.catalog import IndexCatalog

Q = "world school student"

# first batch: every turn_idx % 3 == 1 gets 2.0 (default 1.0)
_CASE1 = "CASE WHEN turn_idx % 3 = 1 THEN 2.0 ELSE 1.0 END"
# after the second batch (turn_idx % 6 == 1 overwritten to 5.0):
_CASE2 = (
    "CASE WHEN turn_idx % 6 = 1 THEN 5.0 "
    "WHEN turn_idx % 3 = 1 THEN 2.0 ELSE 1.0 END"
)


@pytest.fixture(scope="module")
def dv_index(spark, tiny_df, tmp_path_factory):
    """Index + two committed DV update batches; yields (dir, v0, v1, v2) =
    (index dir, pre-update version, post-batch-1, post-batch-2)."""
    d = str(tmp_path_factory.mktemp("idx") / "dv")
    build_index(spark, tiny_df, d, buckets=4, salt_buckets=2, hot_df_ratio=0.10)
    cat = IndexCatalog(d)
    v0 = cat.read_manifest()["version"]
    dd = IndexReader(spark, d).cat.read_doc_dim(spark)
    update_doc_values(
        spark, d, "quality",
        dd.where("turn_idx % 3 = 1").select(
            "conv_id", "turn_idx", F.lit(2.0).alias("value")
        ),
        default=1.0,
    )
    v1 = cat.read_manifest()["version"]
    update_doc_values(
        spark, d, "quality",
        dd.where("turn_idx % 6 = 1").select(
            "conv_id", "turn_idx", F.lit(5.0).alias("value")
        ),
        default=1.0,
    )
    v2 = cat.read_manifest()["version"]
    assert v0 < v1 < v2
    return d, v0, v1, v2


def _rows(res):
    return [(r["doc_id"], r["score"]) for r in res.collect()]


def _boosted(spark, d, boost, reader=None):
    return _rows(
        search(spark, d, Q, k=15, float32=False, boost_by=boost, reader=reader)
    )


class TestDocValuesBoost:
    def test_dv_boost_equals_expression_twin(self, spark, dv_index):
        d, _v0, _v1, _v2 = dv_index
        got = _boosted(spark, d, "quality")
        want = _boosted(spark, d, _CASE2)
        assert got == want
        # and the boost genuinely re-ranks vs unboosted
        plain = _rows(search(spark, d, Q, k=15, float32=False))
        assert [r[0] for r in got] != [r[0] for r in plain]

    def test_last_write_wins_values(self, spark, dv_index):
        d, *_ = dv_index
        vals = {
            (r["conv_id"], r["turn_idx"]): r["value"]
            for r in read_doc_values(spark, d, "quality").collect()
        }
        assert all(
            v == (5.0 if t % 6 == 1 else 2.0) for (_, t), v in vals.items()
        )
        # batch 1 keys not overwritten by batch 2 keep their value
        assert any(t % 3 == 1 and t % 6 != 1 for _, t in vals)

    def test_point_in_time_dv_state(self, spark, dv_index):
        d, v0, v1, _v2 = dv_index
        # pinned between the two batches: only batch 1 visible
        rd1 = IndexReader(spark, d, version=v1)
        assert _boosted(spark, d, "quality", reader=rd1) == _boosted(
            spark, d, _CASE1
        )
        # pinned before any update: the field does not exist
        rd0 = IndexReader(spark, d, version=v0)
        assert "quality" not in rd0.doc_dim_view(spark).columns

    def test_rollback_restores_dv_ledger(self, spark, tiny_df, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("idx") / "dvrb")
        build_index(spark, tiny_df, d, buckets=4, salt_buckets=2, hot_df_ratio=0.10)
        dd = IndexReader(spark, d).cat.read_doc_dim(spark)
        update_doc_values(
            spark, d, "quality",
            dd.where("turn_idx % 3 = 1").select(
                "conv_id", "turn_idx", F.lit(2.0).alias("value")
            ),
            default=1.0,
        )
        cat = IndexCatalog(d)
        v1 = cat.read_manifest()["version"]
        update_doc_values(
            spark, d, "quality",
            dd.where("turn_idx % 6 = 1").select(
                "conv_id", "turn_idx", F.lit(5.0).alias("value")
            ),
            default=1.0,
        )
        cat.rollback_to(v1)
        assert _boosted(spark, d, "quality") == _boosted(spark, d, _CASE1)

    def test_dv_survives_compaction(self, spark, dv_index):
        from cuvs_lucene_spark.operators.merge import compact

        d, *_ = dv_index
        want = _boosted(spark, d, _CASE2)
        compact(spark, d, salt_buckets=2, hot_df_ratio=0.10, force=True)
        assert _boosted(spark, d, "quality") == want

    def test_sort_by_dv_field(self, spark, dv_index):
        d, *_ = dv_index
        got = [
            (r["conv_id"], r["turn_idx"])
            for r in search_sorted(
                spark, d, Q, sort_by="quality", k=10
            ).collect()
        ]
        # twin: the same match set sorted by the expression
        from cuvs_lucene_spark.query import _match_doc_ids_df

        rd = IndexReader(spark, d)
        ids = _match_doc_ids_df(spark, rd, Q, "or", None, None, None, None)
        want = [
            (r["conv_id"], r["turn_idx"])
            for r in (
                rd.cat.read_doc_dim(spark)
                .join(ids, "doc_id", "left_semi")
                .withColumn("q", F.expr(_CASE2))
                .orderBy(F.desc("q"), F.asc("doc_id"))
                .limit(10)
            ).collect()
        ]
        assert got == want


class TestDocValuesLedger:
    def test_base_column_collision_rejected(self, spark, dv_index):
        d, *_ = dv_index
        dd = IndexReader(spark, d).cat.read_doc_dim(spark).limit(1)
        with pytest.raises(ValueError, match="collides"):
            update_doc_values(
                spark, d, "role", dd.select("conv_id", "turn_idx", F.lit(1.0).alias("value"))
            )

    def test_check_and_gc_orphans(self, spark, dv_index):
        import os

        d, *_ = dv_index
        rep = check_dv_files(d)
        assert rep["files"] >= 2 and rep["orphans"] == []
        orphan = os.path.join(d, "dv", "batch-deadbeef0000", "part-zombie.parquet")
        os.makedirs(os.path.dirname(orphan), exist_ok=True)
        with open(orphan, "wb") as f:
            f.write(b"not a parquet")
        assert check_dv_files(d)["orphans"] == [
            "batch-deadbeef0000/part-zombie.parquet"
        ]
        assert gc_orphan_dv(d) == ["batch-deadbeef0000/part-zombie.parquet"]
        assert check_dv_files(d)["orphans"] == []

    def test_backup_includes_dv(self, spark, dv_index):
        d, *_ = dv_index
        files = IndexCatalog(d).backup_files()
        assert any(p.startswith("dv/") for p in files)
