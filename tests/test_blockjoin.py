"""Block-join search (Lucene join-module ToParentBlockJoinQuery analog).

`search(..., parent_by="conv_id", score_mode=...)` rolls child (turn) hits up
to their parent (conversation) under Lucene ScoreMode semantics and returns
the top-k parents. Pinned against the independent numpy oracle: the parent
ranking must equal a pandas rollup of the FULL oracle child ranking.
Reference parity surface: the Lucene join module sits beside the codec
surface the reference plugs into via its Lucene dependency (pom.xml:42-43).
"""

from __future__ import annotations

import pandas as pd
import pytest

from cuvs_lucene_spark.oracle import oracle_search
from cuvs_lucene_spark.query import IndexReader, search

Q = "world school student"
ALL = 10**6


def _conv_of(spark, tiny_index) -> pd.Series:
    rd = IndexReader(spark, tiny_index)
    return (
        rd.cat.read_doc_dim(spark)
        .select("doc_id", "conv_id", "role")
        .toPandas()
        .set_index("doc_id")
    )


def _expected_parents(meta, full, score_mode, k, doc_filter=None):
    """Roll the oracle child ranking up to parents; top-k (score desc,
    conv_id asc)."""
    rows = [
        (meta.loc[d, "conv_id"], float(s))
        for d, s in full
        if doc_filter is None or doc_filter(d)
    ]
    df = pd.DataFrame(rows, columns=["conv_id", "s"])
    agg = {
        "max": ("s", "max"),
        "min": ("s", "min"),
        "total": ("s", "sum"),
        "avg": ("s", "mean"),
    }[score_mode]
    g = df.groupby("conv_id").agg(score=agg, n_hits=("s", "size")).reset_index()
    g = g.sort_values(["score", "conv_id"], ascending=[False, True]).head(k)
    return list(g.itertuples(index=False, name=None))


@pytest.mark.parametrize("score_mode", ["max", "min", "total", "avg"])
def test_parent_rollup_matches_oracle(spark, tiny_index, oracle_tiny, score_mode):
    meta = _conv_of(spark, tiny_index)
    full = oracle_search(oracle_tiny, Q, k=ALL)
    exp = _expected_parents(meta, full, score_mode, k=8)

    got = search(
        spark, tiny_index, Q, k=8, parent_by="conv_id",
        score_mode=score_mode, float32=False,
    ).collect()
    assert [r["conv_id"] for r in got] == [c for c, _s, _n in exp]
    assert [r["n_hits"] for r in got] == [n for _c, _s, n in exp]
    for r, (_c, s, _n) in zip(got, exp):
        # decimal(38,10) child quantization bounds the sum drift at
        # ~n_children * 1e-10 absolute
        assert r["score"] == pytest.approx(s, rel=1e-7, abs=1e-6)


def test_parent_rollup_composes_with_filter(spark, tiny_index, oracle_tiny):
    meta = _conv_of(spark, tiny_index)
    full = oracle_search(oracle_tiny, Q, k=ALL)
    user_docs = set(meta.index[meta["role"] == "user"])
    exp = _expected_parents(
        meta, full, "total", k=5, doc_filter=lambda d: d in user_docs
    )
    got = search(
        spark, tiny_index, Q, k=5, parent_by="conv_id", score_mode="total",
        filter_cond="role = 'user'", float32=False,
    ).collect()
    assert [(r["conv_id"], r["n_hits"]) for r in got] == [
        (c, n) for c, _s, n in exp
    ]
    for r, (_c, s, _n) in zip(got, exp):
        assert r["score"] == pytest.approx(s, rel=1e-7, abs=1e-6)


def test_parent_rollup_guards_and_empty(spark, tiny_index):
    with pytest.raises(ValueError, match="score_mode"):
        search(spark, tiny_index, Q, parent_by="conv_id", score_mode="nope")
    with pytest.raises(ValueError, match="prune=True"):
        search(spark, tiny_index, Q, parent_by="conv_id", prune=True)
    with pytest.raises(ValueError, match="after"):
        search(spark, tiny_index, Q, parent_by="conv_id", after=(1.0, 0))
    with pytest.raises(ValueError, match="mutually exclusive"):
        search(spark, tiny_index, Q, parent_by="conv_id", group_by="role")
    # absent term → empty frame with the parent schema
    out = search(spark, tiny_index, "zzzzqqqq", parent_by="conv_id")
    assert out.columns == ["conv_id", "score", "n_hits"]
    assert out.count() == 0


def test_children_fetch_matches_spec(spark, tiny_index, oracle_tiny):
    """search_children == (top-k_parents via the parent path) x doc_dim
    children, parent score propagated to every child; child_filter honored;
    ordering (score desc, parent asc, doc_id asc)."""
    from pyspark.sql import functions as F

    from cuvs_lucene_spark.query import search_children

    kp = 4
    parents = search(
        spark, tiny_index, Q, k=kp, parent_by="conv_id",
        score_mode="total", float32=False,
    ).collect()
    pscore = {r["conv_id"]: r["score"] for r in parents}
    meta = _conv_of(spark, tiny_index)
    want = sorted(
        (
            (-pscore[row["conv_id"]], row["conv_id"], d)
            for d, row in meta.iterrows()
            if row["conv_id"] in pscore and row["role"] == "user"
        ),
    )
    got = search_children(
        spark, tiny_index, Q, parent_by="conv_id", k=ALL, k_parents=kp,
        score_mode="total", child_filter=F.col("role") == "user",
        float32=False,
    ).collect()
    assert [(r["doc_id"], r["conv_id"]) for r in got] == [
        (d, c) for _, c, d in want
    ]
    for r in got:
        assert abs(r["score"] - pscore[r["conv_id"]]) < 1e-9  # parent score
    # k truncation applies after ordering
    got3 = search_children(
        spark, tiny_index, Q, parent_by="conv_id", k=3, k_parents=kp,
        score_mode="total", child_filter=F.col("role") == "user",
        float32=False,
    ).collect()
    assert [(r["doc_id"], r["conv_id"]) for r in got3] == [
        (d, c) for _, c, d in want[:3]
    ]
    # absent term -> no parents -> no children
    assert (
        search_children(spark, tiny_index, "zzqqneverterm", k_parents=3).count()
        == 0
    )
