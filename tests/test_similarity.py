"""Pluggable Similarity (IndexSearcher.setSimilarity analog).

``search(similarity=...)`` swaps the scoring function over the same stored
postings + quantized norms: "classic" (TFIDFSimilarity), "lmd"
(LMDirichletSimilarity) and "lmjm" (LMJelinekMercerSimilarity) beside the
default BM25. Each is pinned rank+score-identical to the numpy oracle's
independent mode, and the block-max pruned path (whose upper bound is
monotone in the same per-block stats) must stay exactly equal to
exhaustive under every Similarity.
"""

from __future__ import annotations

import pytest

from cuvs_lucene_spark.oracle import oracle_search
from cuvs_lucene_spark.query import search


@pytest.mark.parametrize(
    "q,mode,msm",
    [
        ("world school student", "or", None),
        ("the be to", "or", None),
        ("world the", "and", None),
        ("look only come its", "or", 2),
        ("w01746 people w01763", "or", None),
    ],
)
def test_classic_matches_oracle(spark, tiny_index, oracle_tiny, q, mode, msm):
    exp = oracle_search(oracle_tiny, q, k=10, mode=mode, msm=msm, similarity="classic")
    got = search(
        spark, tiny_index, q, k=10, mode=mode, msm=msm, similarity="classic"
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert float(r["score"]) == pytest.approx(s, rel=1e-6)


def test_classic_pruned_equals_exhaustive(spark, tiny_index):
    q = "world school student the"
    ex = search(spark, tiny_index, q, k=10, similarity="classic", prune=False).collect()
    pr = search(spark, tiny_index, q, k=10, similarity="classic", prune=True).collect()
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in pr
    ]


def test_classic_actually_differs_from_bm25(spark, tiny_index):
    # same query, different Similarity → different score scale (and usually
    # different order); proves the knob reaches the kernel
    q = "world school student"
    bm = search(spark, tiny_index, q, k=10).collect()
    cl = search(spark, tiny_index, q, k=10, similarity="classic").collect()
    assert [r["score"] for r in bm] != [r["score"] for r in cl]


def test_unknown_similarity_raises(spark, tiny_index):
    with pytest.raises(ValueError, match="similarity"):
        search(spark, tiny_index, "world", k=5, similarity="dfr")


@pytest.mark.parametrize(
    "q,mode,msm",
    [
        ("world school student", "or", None),
        ("the be to", "or", None),
        ("world the", "and", None),
        ("look only come its", "or", 2),
        ("w01746 people w01763", "or", None),
    ],
)
def test_lmd_matches_oracle(spark, tiny_index, oracle_tiny, q, mode, msm):
    """LMDirichletSimilarity: rank+score-identical to the numpy oracle's
    independent float32 transliteration (p_c from collection tf totals)."""
    exp = oracle_search(oracle_tiny, q, k=10, mode=mode, msm=msm, similarity="lmd")
    got = search(
        spark, tiny_index, q, k=10, mode=mode, msm=msm, similarity="lmd"
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert float(r["score"]) == pytest.approx(s, rel=1e-6, abs=1e-6)


def test_lmd_pruned_equals_exhaustive(spark, tiny_index):
    # the lmd block bound (max_tf, min_dl_d monotonicity + clamp) must be
    # lossless exactly like bm25/classic
    q = "world school student the"
    ex = search(spark, tiny_index, q, k=10, similarity="lmd", prune=False).collect()
    pr = search(spark, tiny_index, q, k=10, similarity="lmd", prune=True).collect()
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in pr
    ]


@pytest.mark.parametrize(
    "q,mode,msm",
    [
        ("world school student", "or", None),
        ("the be to", "or", None),
        ("world the", "and", None),
        ("look only come its", "or", 2),
    ],
)
def test_lmjm_matches_oracle(spark, tiny_index, oracle_tiny, q, mode, msm):
    """LMJelinekMercerSimilarity: rank+score-identical to the numpy
    oracle's independent transliteration (same p_c, mixture formula)."""
    exp = oracle_search(oracle_tiny, q, k=10, mode=mode, msm=msm, similarity="lmjm")
    got = search(
        spark, tiny_index, q, k=10, mode=mode, msm=msm, similarity="lmjm"
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert float(r["score"]) == pytest.approx(s, rel=1e-6, abs=1e-6)


def test_lmjm_pruned_equals_exhaustive(spark, tiny_index):
    q = "world school student the"
    ex = search(spark, tiny_index, q, k=10, similarity="lmjm", prune=False).collect()
    pr = search(spark, tiny_index, q, k=10, similarity="lmjm", prune=True).collect()
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in pr
    ]


@pytest.mark.parametrize("k1,b", [(0.9, 0.4), (2.0, 0.0), (1.2, 1.0)])
def test_bm25_tuned_params_match_oracle(spark, tiny_index, oracle_tiny, k1, b):
    """BM25Similarity(k1, b) parametrization: engine == oracle at the same
    non-default constants (b=0 disables length normalization entirely;
    b=1 is full normalization)."""
    q = "world school student"
    exp = oracle_search(oracle_tiny, q, k=10, k1=k1, b=b)
    got = search(spark, tiny_index, q, k=10, k1=k1, b=b).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert float(r["score"]) == pytest.approx(s, rel=1e-6)


def test_bm25_tuned_pruned_equals_exhaustive(spark, tiny_index):
    # the tuned constants must reach the block bound too, or pruning would
    # compare default-constant bounds against tuned-constant scores
    q = "world school student the"
    ex = search(spark, tiny_index, q, k=10, k1=0.9, b=0.4, prune=False).collect()
    pr = search(spark, tiny_index, q, k=10, k1=0.9, b=0.4, prune=True).collect()
    assert [(r["doc_id"], r["score"]) for r in ex] == [
        (r["doc_id"], r["score"]) for r in pr
    ]


def test_bm25_default_params_unchanged(spark, tiny_index):
    q = "world school"
    base = search(spark, tiny_index, q, k=10).collect()
    expl = search(spark, tiny_index, q, k=10, k1=1.2, b=0.75).collect()
    assert [(r["doc_id"], r["score"]) for r in base] == [
        (r["doc_id"], r["score"]) for r in expl
    ]


@pytest.mark.parametrize(
    "sim_kw",
    [
        {"similarity": "classic"},
        {"similarity": "lmd"},
        {"similarity": "lmjm"},
        {"k1": 0.9, "b": 0.4},
    ],
    ids=["classic", "lmd", "lmjm", "bm25tuned"],
)
def test_batch_matches_sequential_under_similarity(spark, tiny_index, sim_kw):
    """search_batch honors the Similarity knobs: batched results equal the
    per-query search() results under every non-default Similarity."""
    from cuvs_lucene_spark.query import search_batch

    qs = ["world school", "the student people", "w01746"]
    batch = search_batch(spark, tiny_index, qs, k=8, **sim_kw).collect()
    got = {}
    for r in batch:
        got.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    for qi, q in enumerate(qs):
        want = [
            (r["doc_id"], r["score"])
            for r in search(spark, tiny_index, q, k=8, **sim_kw).collect()
        ]
        assert got.get(qi, []) == want, (q, sim_kw)


def test_lmd_common_term_scores_clamp_to_zero(spark, tiny_index):
    # a very common term in a long doc drives ln(mu/(dl+mu)) + ln(1+tf/..)
    # negative for low-tf matches; Lucene clamps per-term scores at 0, so
    # every returned score must be >= 0 (and the engine must not rank pure
    # clamped-zero docs above genuine positives)
    got = search(spark, tiny_index, "the world", k=20, similarity="lmd").collect()
    assert got and all(float(r["score"]) >= 0.0 for r in got)
