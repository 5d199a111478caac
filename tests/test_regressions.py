"""Targeted regression repros for defects found in round-4 review.

Each test pins one specific historical hazard:

  1. the driver-side TermStates cache serving stale df/cf after a
     delete-and-rebuild at the same path with a caller-fixed run_id
     (the snapshot key must include the manifest commit identity, not just
     (segment id, run_id) — Lucene's reader caches are likewise keyed per
     commit point);
  2. searchAfter page membership at cursor scores > 8, where a float32 ULP
     exceeds an absolute 1e-6 slack and a boundary doc could be
     misclassified (phase 1 must run float64 with a RELATIVE slack when
     ``after`` is set).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.operators.build import build_index
from cuvs_lucene_spark.query import IndexReader, search


def _transcripts(spark, rows):
    """(conv_id, turn_idx, role, text, tool, ts) frame from (text,) specs."""
    base = datetime.datetime(2026, 1, 1)
    data = [
        (
            f"conv-{i // 8:08d}",
            i % 8,
            ["user", "assistant"][i % 2],
            text,
            None,
            base + datetime.timedelta(seconds=i),
        )
        for i, text in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )


class TestTermStatsCacheRebuild:
    def test_term_stats_fresh_after_rebuild_same_run_id(
        self, spark, tmp_path_factory
    ):
        """Delete-and-rebuild at the SAME path with the SAME caller run_id
        must not serve the old snapshot's df/cf from the process-global
        term-stats cache: (id, run_id) collide by construction, so the
        snapshot key has to carry the manifest commit identity."""
        from cuvs_lucene_spark.sources import fs

        d = str(tmp_path_factory.mktemp("idx") / "stale_ts")
        half = _transcripts(spark, ["merge sort"] * 20)
        build_index(spark, half, d, buckets=4, salt_buckets=2, run_id="fixed")
        rd1 = IndexReader(spark, d)
        df1 = rd1.term_stats(["merge"])["merge"][0]
        assert df1 == 20
        # cache is hot now: a second lookup must not issue a fresh seek
        assert rd1.term_stats(["merge"])["merge"][0] == 20

        fs.delete_dir(d)
        full = _transcripts(spark, ["merge sort"] * 20 + ["merge join"] * 30)
        build_index(spark, full, d, buckets=4, salt_buckets=2, run_id="fixed")
        rd2 = IndexReader(spark, d)
        assert rd2._snap_key != rd1._snap_key
        df2, _, cf2 = rd2.term_stats(["merge"])["merge"]
        assert df2 == 50 and cf2 == 50

        # and the scoring path agrees (idf reflects the NEW df)
        top = search(spark, d, "merge", k=60, reader=rd2).collect()
        assert len(top) == 50


class TestSearchAfterHighScoreCursor:
    @pytest.fixture(scope="class")
    def rare_index(self, spark, tmp_path_factory):
        """Corpus engineered so multi-term hits score far above 8: three
        very rare terms (df=4 of 300) co-occur in the top docs, putting the
        page-1 cursor score around 3 x idf x (k1+1) >> 8."""
        texts = ["alpha beta common filler words here"] * 600
        # 9 docs carrying rare terms (df=6 each); 3 docs have all three at
        # tf=2, so their score is ~3 terms x idf~4.5 x tf-factor~1.4 >> 8
        for i in range(3):
            texts.append("zebra zebra quokka quokka axolotl axolotl alpha")
        for i in range(3):
            texts.append("zebra quokka alpha noise")
        for i in range(3):
            texts.append("axolotl alpha noise")
        d = str(tmp_path_factory.mktemp("idx") / "rare")
        build_index(
            spark, _transcripts(spark, texts), d, buckets=4, salt_buckets=2
        )
        return d

    def test_pruned_paging_matches_exhaustive_above_score_8(
        self, spark, rare_index
    ):
        q = "zebra quokka axolotl"
        page1 = search(spark, rare_index, q, k=4, prune=True).collect()
        assert page1 and page1[0]["score"] > 8.0, (
            "repro precondition: cursor score must exceed the float32-ULP "
            "hazard threshold"
        )
        cursor = (float(page1[-1]["score"]), int(page1[-1]["doc_id"]))
        tail_ex = search(spark, rare_index, q, k=10, after=cursor).collect()
        tail_pr = search(
            spark, rare_index, q, k=10, prune=True, after=cursor
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in tail_pr] == [
            (r["doc_id"], r["score"]) for r in tail_ex
        ]
        # pages partition the full result list exactly
        full = search(spark, rare_index, q, k=20).collect()
        assert [r["doc_id"] for r in page1 + tail_ex] == [
            r["doc_id"] for r in full[: len(page1) + len(tail_ex)]
        ]


class TestLMSimilarityUnderTombstones:
    """Pins the engine==oracle property for the LM Similarities on an index
    WITH tombstones (round-4 advice: no lmd/lmjm test exercised deletes).

    Semantics pinned: collection stats (cf -> p_c, n_docs, avgdl) keep
    covering tombstoned docs until merge — Lucene's pre-merge behavior, and
    the engine's documented contract — while tombstoned docs are masked from
    RESULTS. The oracle mirrors that exactly by scoring over the full corpus
    and applying the delete set as an accept mask at collection time only.
    """

    @pytest.mark.parametrize("similarity", ["lmd", "lmjm"])
    def test_lm_scores_match_oracle_with_deletes(
        self, spark, tiny_df, tiny_pdf, oracle_tiny, tmp_path_factory, similarity
    ):
        from cuvs_lucene_spark.operators.deletes import delete_docs
        from cuvs_lucene_spark.oracle import oracle_search

        d = str(tmp_path_factory.mktemp("idx") / f"lm_del_{similarity}")
        build_index(spark, tiny_df, d, buckets=8, salt_buckets=4)
        victims = tiny_df.where(F.col("conv_id") < "conv-00000030").select(
            "conv_id", "turn_idx"
        )
        n_del = delete_docs(spark, d, victims)
        assert n_del > 0

        meta = oracle_tiny.meta
        accept = (meta["conv_id"] >= "conv-00000030").to_numpy()
        for q in ["world school", "merge sort join", "the student"]:
            exp = oracle_search(
                oracle_tiny, q, k=10, accept=accept, similarity=similarity
            )
            got = [
                (r["doc_id"], r["score"])
                for r in search(spark, d, q, k=10, similarity=similarity).collect()
            ]
            assert [g for g, _ in got] == [e for e, _ in exp], (
                f"{similarity} {q!r}: docIDs {got} != {exp}"
            )
            for (gd, gs), (_ed, es) in zip(got, exp):
                assert abs(gs - es) < 1e-5, (
                    f"{similarity} {q!r}: score {gs} vs {es} for doc {gd}"
                )


class TestQueryValidation:
    """Up-front argument validation added in round 5: explicit errors at the
    API boundary instead of incidental failures deep in kernels."""

    def test_unknown_similarity_fails_fast(self, spark, tiny_index):
        with pytest.raises(ValueError, match="unknown similarity"):
            search(spark, tiny_index, "world", similarity="lmdir")

    def test_unknown_similarity_fails_fast_batch(self, spark, tiny_index):
        from cuvs_lucene_spark.query import search_batch

        with pytest.raises(ValueError, match="unknown similarity"):
            search_batch(spark, tiny_index, ["world"], similarity="bm-25")

    def test_context_carries_bm25_free_params(self, spark, tiny_df, tiny_index):
        """search_with_context forwards k1/b: a tuned search's hit set must
        equal plain search() with the same knobs."""
        from cuvs_lucene_spark.query import search_with_context

        tuned = search(spark, tiny_index, "world school", k=5, k1=0.5, b=0.9)
        ctx = search_with_context(
            spark, tiny_index, tiny_df, "world school", k=5, window=0,
            k1=0.5, b=0.9,
        )
        want = [(r["doc_id"], r["score"]) for r in tuned.collect()]
        got = [(r["doc_id"], r["score"]) for r in ctx.collect()]
        assert got == want

    def test_ivf_dim_mismatch_raises(self, spark, tmp_path_factory):
        import numpy as np

        from cuvs_lucene_spark.pipeline.similarity import (
            cosine_topk,
            ivf_build,
            ivf_probe_search,
        )

        rng = np.random.default_rng(3)
        emb = spark.createDataFrame(
            [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(64)],
            "vec_id long, embedding array<double>",
        )
        d = str(tmp_path_factory.mktemp("ivf") / "dimchk")
        ivf_build(emb, d, n_centroids=4)
        with pytest.raises(ValueError, match="8"):
            ivf_probe_search(spark, d, [0.0] * 5, k=3)
        # cosine_topk has no meta: the guard rides the scan
        with pytest.raises(Exception, match="dims|RAISE_ERROR|5"):
            cosine_topk(emb, [0.0, 1.0, 0.0, 0.0, 1.0], k=3).collect()

    def test_ivfpq_dim_mismatch_raises(self, spark, tmp_path_factory):
        import numpy as np

        from cuvs_lucene_spark.pipeline.similarity import (
            ivfpq_build,
            ivfpq_search,
        )

        rng = np.random.default_rng(4)
        emb = spark.createDataFrame(
            [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(64)],
            "vec_id long, embedding array<double>",
        )
        d = str(tmp_path_factory.mktemp("ivfpq") / "dimchk")
        ivfpq_build(emb, d, n_centroids=4, m=2, ks=16)
        with pytest.raises(ValueError, match="8"):
            ivfpq_search(spark, d, [0.0] * 5, k=3)


class TestContextBatch:
    def test_batch_context_matches_single(self, spark, tiny_df, tiny_index):
        """search_with_context_batch == per-query search_with_context rows
        (modulo the leading qid), so the amortized path is drop-in."""
        from cuvs_lucene_spark.query import (
            search_with_context,
            search_with_context_batch,
        )

        qs = ["world school", "merge sort"]
        batch = search_with_context_batch(
            spark, tiny_index, tiny_df, qs, k=4, window=1
        ).collect()
        for qid, q in enumerate(qs):
            single = search_with_context(
                spark, tiny_index, tiny_df, q, k=4, window=1
            ).collect()
            got = [
                (r["doc_id"], r["ctx_turn_idx"], r["is_hit"], r["text"])
                for r in batch
                if r["qid"] == qid
            ]
            want = [
                (r["doc_id"], r["ctx_turn_idx"], r["is_hit"], r["text"])
                for r in single
            ]
            assert got == want, f"qid={qid}"


class TestSearchBatchKnobs:
    """search_batch's batch-level filter_cond/exclude and per-query msm
    must match the single-query path exactly (one shared join per
    constraint instead of Q)."""

    def test_batch_filter_exclude_msm_match_single(self, spark, tiny_index):
        from cuvs_lucene_spark.query import search, search_batch

        qs = ["world school student", "merge sort"]
        cond = F.col("role") == "user"
        batch = search_batch(
            spark, tiny_index, qs, k=8, filter_cond=cond, exclude="join",
            msm=[2, None], float32=False,
        ).collect()
        for qid, (q, m) in enumerate(zip(qs, [2, None])):
            single = search(
                spark, tiny_index, q, k=8, filter_cond=cond, exclude="join",
                msm=m, float32=False,
            ).collect()
            got = [(r["doc_id"], round(r["score"], 6)) for r in batch
                   if r["qid"] == qid]
            want = [(r["doc_id"], round(r["score"], 6)) for r in single]
            assert got == want, f"qid={qid}"


class TestSearchBatchValidation:
    def test_msm_validation_matches_single(self, spark, tiny_index):
        from cuvs_lucene_spark.query import search_batch

        with pytest.raises(ValueError, match="mode='or'"):
            search_batch(spark, tiny_index, ["world"], mode="and", msm=2)
        with pytest.raises(ValueError, match=">= 1"):
            search_batch(spark, tiny_index, ["world"], msm=0)
