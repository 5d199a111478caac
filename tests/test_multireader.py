"""Federated MultiReader search (multireader.open_multi_reader).

Lucene analog: ``MultiReader`` composes leaves with re-based docIDs and
summed collection stats; no data moves. Pinned here: a federated handle
over two half-indexes answers every surface identically to the index built
over the union in one shot (the halves split on the (conv_id, turn_idx)
sort boundary, so the re-based docIDs reproduce the one-shot assignment
exactly — scores, ranks AND tie-breaks); leaf tombstones mask federated
results; leaf commits trigger open_if_changed; incompatible leaves refuse.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.multireader import MultiIndexCatalog, open_multi_reader
from cuvs_lucene_spark.operators.build import build_index
from cuvs_lucene_spark.operators.deletes import delete_docs
from cuvs_lucene_spark.query import IndexReader, search
from cuvs_lucene_spark.sources.catalog import IndexCatalog

SPLIT = "conv-00000120"
QUERIES = ["world school", "merge", "plan review team"]


def _rows(res):
    return [
        (r["doc_id"], round(float(r["score"]), 6), r["conv_id"], r["turn_idx"])
        for r in res.collect()
    ]


@pytest.fixture(scope="module")
def fed(spark, tiny_df, tmp_path_factory):
    root = tmp_path_factory.mktemp("multi")
    a, b, full = str(root / "a"), str(root / "b"), str(root / "full")
    kw = dict(buckets=8, salt_buckets=4, hot_df_ratio=0.10, positions=True)
    build_index(spark, tiny_df.where(F.col("conv_id") < SPLIT), a, **kw)
    build_index(spark, tiny_df.where(F.col("conv_id") >= SPLIT), b, **kw)
    build_index(spark, tiny_df, full, **kw)
    return a, b, full


class TestMultiReader:
    def test_equals_single_shot_build_across_surfaces(self, spark, fed):
        a, b, full = fed
        rd = open_multi_reader(spark, [a, b])
        assert (rd.n_docs, rd.sum_dl) == (
            IndexReader(spark, full).n_docs,
            IndexReader(spark, full).sum_dl,
        )
        for q in QUERIES:
            got = _rows(search(spark, rd.cat.index_dir, q, k=8, reader=rd))
            want = _rows(search(spark, full, q, k=8))
            assert got == want, q
        # AND + filtered + count on the federated handle
        got = _rows(
            search(spark, rd.cat.index_dir, "world school", k=8, mode="and",
                   filter_cond=F.col("role") == "user", reader=rd)
        )
        want = _rows(
            search(spark, full, "world school", k=8, mode="and",
                   filter_cond=F.col("role") == "user")
        )
        assert got == want

    def test_multiterm_and_phrase_on_federated_handle(self, spark, fed):
        a, b, full = fed
        from cuvs_lucene_spark.multiterm import search_multiterm
        from cuvs_lucene_spark.query import search_phrase

        rd = open_multi_reader(spark, [a, b])
        got = _rows(search_multiterm(spark, rd.cat.index_dir, prefix="sch",
                                     k=8, reader=rd))
        want = _rows(search_multiterm(spark, full, prefix="sch", k=8))
        assert got == want
        got = _rows(search_phrase(spark, rd.cat.index_dir, "world school",
                                  k=8, reader=rd))
        want = _rows(search_phrase(spark, full, "world school", k=8))
        assert got == want

    def test_leaf_tombstones_mask_federated_results(self, spark, tiny_df, tmp_path_factory):
        root = tmp_path_factory.mktemp("multi_del")
        a, b = str(root / "a"), str(root / "b")
        kw = dict(buckets=8, salt_buckets=4, hot_df_ratio=0.10)
        build_index(spark, tiny_df.where(F.col("conv_id") < SPLIT), a, **kw)
        build_index(spark, tiny_df.where(F.col("conv_id") >= SPLIT), b, **kw)
        rd = open_multi_reader(spark, [a, b])
        before = _rows(search(spark, rd.cat.index_dir, "world school", k=6, reader=rd))
        victim_key = (before[0][2], before[0][3])
        # delete the top hit in whichever LEAF owns it
        for leaf in (a, b):
            keys = (
                IndexCatalog(leaf).read_doc_dim(spark)
                .where((F.col("conv_id") == victim_key[0])
                       & (F.col("turn_idx") == victim_key[1]))
                .select("conv_id", "turn_idx")
            )
            delete_docs(spark, leaf, keys)
        rd2 = rd.open_if_changed()  # leaf commit → fresh federated handle
        assert rd2 is not None
        after = _rows(search(spark, rd2.cat.index_dir, "world school", k=6, reader=rd2))
        assert victim_key not in {(r[2], r[3]) for r in after}
        # survivors keep exact scores and order (stats unchanged pre-merge)
        surv = [r for r in before if (r[2], r[3]) != victim_key]
        assert after[: len(surv)] == surv

    def test_incompatible_leaves_refused_and_read_only(self, spark, tiny_df, fed, tmp_path_factory):
        a = fed[0]
        other = str(tmp_path_factory.mktemp("multi") / "wrong")
        build_index(spark, tiny_df.limit(50), other, buckets=16,
                    salt_buckets=4, hot_df_ratio=0.10)
        with pytest.raises(ValueError, match="incompatible sub-index"):
            MultiIndexCatalog([a, other])
        cat = MultiIndexCatalog([a])
        assert not hasattr(cat, "commit_segment")  # no mutator surface

    def test_leaf_version_pinning(self, spark, fed, tmp_path):
        """A leaf pinned to a pre-delete commit shows the deleted doc in the
        federated view (MultiReader over DirectoryReader.open(IndexCommit)).

        Mutates a PRIVATE copy of leaf ``a``: the module-scoped ``fed``
        fixture is shared with the analytics tests below, and a tombstone
        written into the shared leaf would legitimately skew their
        federated-vs-one-shot comparison."""
        import shutil

        a_shared, b, full = fed
        a = str(tmp_path / "a_copy")
        shutil.copytree(a_shared, a)
        top = search(spark, a, "world school", k=1).collect()[0]
        v0 = IndexCatalog(a).read_manifest()["version"]
        keys = (
            IndexCatalog(a).read_doc_dim(spark)
            .where(F.col("doc_id") == top["doc_id"])
            .select("conv_id", "turn_idx")
        )
        delete_docs(spark, a, keys)
        live = open_multi_reader(spark, [a, b])
        pinned = open_multi_reader(spark, [(a, v0), b])
        live_keys = {
            (r["conv_id"], r["turn_idx"])
            for r in search(spark, live.cat.index_dir, "world school", k=8,
                            reader=live).collect()
        }
        pinned_keys = {
            (r["conv_id"], r["turn_idx"])
            for r in search(spark, pinned.cat.index_dir, "world school", k=8,
                            reader=pinned).collect()
        }
        victim = (top["conv_id"], top["turn_idx"])
        assert victim not in live_keys and victim in pinned_keys


class TestMultiReaderAnalytics:
    """Round-4 analytics surfaces compose with the federated handle: facets,
    count, grouped/collapse already pinned elsewhere — here facet_counts,
    facet_ranges and drill_sideways over N leaves must equal the one-shot
    index (the match set and doc_dim re-base are leaf-transparent)."""

    def test_facets_and_drill_sideways_federated(self, spark, fed):
        from cuvs_lucene_spark.multireader import open_multi_reader
        from cuvs_lucene_spark.query import (
            count_matches,
            drill_sideways,
            facet_counts,
        )

        a, b, full = fed
        rd = open_multi_reader(spark, [a, b])
        q = "world school student"
        fc_fed = {
            (r["facet"], r["n_docs"])
            for r in facet_counts(
                spark, rd.cat.index_dir, q, facet="role", reader=rd
            ).collect()
        }
        fc_full = {
            (r["facet"], r["n_docs"])
            for r in facet_counts(spark, full, q, facet="role").collect()
        }
        assert fc_fed == fc_full and fc_fed

        assert count_matches(
            spark, rd.cat.index_dir, q, reader=rd
        ) == count_matches(spark, full, q)

        dims = {"role": ["user", "tool"], "turn_idx": [0, 1, 2, 3, 4]}
        ds_fed = {
            (r["dim"], r["facet"], r["n_docs"])
            for r in drill_sideways(
                spark, rd.cat.index_dir, q, dims=dims, reader=rd
            ).collect()
        }
        ds_full = {
            (r["dim"], r["facet"], r["n_docs"])
            for r in drill_sideways(spark, full, q, dims=dims).collect()
        }
        assert ds_fed == ds_full and ds_fed
