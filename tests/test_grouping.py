"""Grouped search (Lucene grouping module analog) and field-sorted search
(IndexSearcher.search(query, k, Sort) analog).

Both are pinned against the independent numpy oracle: the grouped result must
be exactly the per-group partition of the FULL oracle ranking, and the sorted
result must be the oracle match set ordered by the doc_dim field. Reference
parity surface: the Lucene grouping + Sort APIs sit beside the codec surface
the reference plugs into via its Lucene dependency (pom.xml:42-43).
"""

from __future__ import annotations

import pandas as pd
import pytest

from cuvs_lucene_spark.oracle import oracle_search
from cuvs_lucene_spark.query import IndexReader, search, search_sorted

Q = "world school student"
ALL = 10**6  # k larger than any tiny-tier match count → full ranking


def _doc_meta(spark, tiny_index) -> pd.DataFrame:
    rd = IndexReader(spark, tiny_index)
    return (
        rd.cat.read_doc_dim(spark)
        .select("doc_id", "role", "ts")
        .toPandas()
        .set_index("doc_id")
    )


def test_grouped_equals_partitioned_oracle_ranking(spark, tiny_index, oracle_tiny):
    meta = _doc_meta(spark, tiny_index)
    full = oracle_search(oracle_tiny, Q, k=ALL)  # [(doc_id, score)] desc
    k = 3
    exp: dict[str, list[tuple[int, float]]] = {}
    for doc_id, score in full:  # already (score desc, doc_id asc)
        role = meta.loc[doc_id, "role"]
        exp.setdefault(role, [])
        if len(exp[role]) < k:
            exp[role].append((doc_id, float(score)))

    got = search(
        spark, tiny_index, Q, k=k, group_by="role", float32=True
    ).collect()
    # output ordered (group asc, grp_rank asc); rebuild the per-group lists
    got_by_role: dict[str, list[tuple[int, float]]] = {}
    for r in got:
        got_by_role.setdefault(r["role"], []).append(
            (r["doc_id"], float(r["score"]))
        )
        assert r["grp_rank"] == len(got_by_role[r["role"]])
    assert set(got_by_role) == set(exp)
    for role in exp:
        assert [d for d, _ in got_by_role[role]] == [d for d, _ in exp[role]]
        for (_, g), (_, e) in zip(got_by_role[role], exp[role]):
            assert g == pytest.approx(e, rel=1e-6)
    # global order of the returned frame: group asc, then rank
    roles = [r["role"] for r in got]
    assert roles == sorted(roles)


def test_grouped_guards(spark, tiny_index):
    with pytest.raises(ValueError, match="after"):
        search(spark, tiny_index, Q, k=3, group_by="role", after=(1.0, 0))
    with pytest.raises(ValueError, match="prune"):
        search(spark, tiny_index, Q, k=3, group_by="role", prune=True)
    # prune="auto" silently degrades to exhaustive instead of raising
    assert (
        search(spark, tiny_index, Q, k=1, group_by="role", prune="auto").count()
        > 0
    )


def test_grouped_no_match_is_empty_with_schema(spark, tiny_index):
    res = search(spark, tiny_index, "zzznope", k=3, group_by="role")
    assert res.count() == 0
    assert res.columns == [
        "role", "grp_rank", "doc_id", "score", "conv_id", "turn_idx"
    ]


def test_sorted_matches_oracle_match_set_ordered_by_ts(
    spark, tiny_index, oracle_tiny
):
    meta = _doc_meta(spark, tiny_index)
    match_ids = [d for d, _ in oracle_search(oracle_tiny, Q, k=ALL)]
    exp = (
        meta.loc[match_ids]
        .sort_values("ts", ascending=False, kind="stable")
        .index.tolist()
    )
    k = 10
    got = search_sorted(
        spark, tiny_index, Q, sort_by="ts", ascending=False, k=k
    ).collect()
    assert [r["doc_id"] for r in got] == exp[:k]
    # ascending variant + clause surface passthrough (mode='and')
    and_ids = {d for d, _ in oracle_search(oracle_tiny, "world the", k=ALL, mode="and")}
    got_asc = search_sorted(
        spark, tiny_index, "world the", sort_by="ts", ascending=True,
        k=len(and_ids) + 5, mode="and",
    ).collect()
    assert {r["doc_id"] for r in got_asc} == and_ids
    ts_vals = [r["ts"] for r in got_asc]
    assert ts_vals == sorted(ts_vals)


def test_sorted_no_match_is_empty(spark, tiny_index):
    res = search_sorted(spark, tiny_index, "zzznope", k=5)
    assert res.count() == 0
    assert res.columns == ["doc_id", "conv_id", "turn_idx", "ts"]


def test_collapse_equals_first_per_key_of_oracle_ranking(
    spark, tiny_index, oracle_tiny
):
    rd = IndexReader(spark, tiny_index)
    conv_of = dict(
        rd.cat.read_doc_dim(spark).select("doc_id", "conv_id").collect()
    )
    full = oracle_search(oracle_tiny, Q, k=ALL)  # (score desc, doc_id asc)
    seen: set[str] = set()
    exp: list[tuple[int, float]] = []
    for doc_id, score in full:
        c = conv_of[doc_id]
        if c not in seen:
            seen.add(c)
            exp.append((doc_id, float(score)))
    k = 7
    got = search(
        spark, tiny_index, Q, k=k, collapse_by="conv_id", float32=True
    ).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in exp[:k]]
    for r, (_, e) in zip(got, exp):
        assert float(r["score"]) == pytest.approx(e, rel=1e-6)
    # representatives are one-per-conversation
    assert len({r["conv_id"] for r in got}) == len(got)


def test_collapse_pagination_and_guards(spark, tiny_index):
    p1 = search(spark, tiny_index, Q, k=4, collapse_by="conv_id").collect()
    cur = (float(p1[-1]["score"]), int(p1[-1]["doc_id"]))
    p2 = search(
        spark, tiny_index, Q, k=4, collapse_by="conv_id", after=cur
    ).collect()
    both = search(spark, tiny_index, Q, k=8, collapse_by="conv_id").collect()
    assert [r["doc_id"] for r in p1 + p2] == [r["doc_id"] for r in both]
    with pytest.raises(ValueError, match="prune"):
        search(spark, tiny_index, Q, k=3, collapse_by="conv_id", prune=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        search(
            spark, tiny_index, Q, k=3, collapse_by="conv_id", group_by="role"
        )
    # non-base collapse key appends its column; prune='auto' degrades quietly
    r = search(
        spark, tiny_index, Q, k=3, collapse_by="role", prune="auto"
    )
    assert r.columns == [
        "doc_id", "score", "conv_id", "turn_idx", "role"
    ]
    assert r.count() == 3  # three roles exist, each yields a representative


def test_collapse_no_match_is_empty_with_schema(spark, tiny_index):
    res = search(spark, tiny_index, "zzznope", k=3, collapse_by="conv_id")
    assert res.count() == 0
    assert res.columns == ["doc_id", "score", "conv_id", "turn_idx"]


def test_sorted_pagination_matches_single_page(spark, tiny_index):
    s1 = search_sorted(spark, tiny_index, Q, sort_by="ts", k=6).collect()
    s2 = search_sorted(
        spark, tiny_index, Q, sort_by="ts", k=6,
        after=(s1[-1]["ts"], s1[-1]["doc_id"]),
    ).collect()
    s12 = search_sorted(spark, tiny_index, Q, sort_by="ts", k=12).collect()
    assert [r["doc_id"] for r in s1 + s2] == [r["doc_id"] for r in s12]
    # ascending variant
    a1 = search_sorted(
        spark, tiny_index, Q, sort_by="ts", ascending=True, k=6
    ).collect()
    a2 = search_sorted(
        spark, tiny_index, Q, sort_by="ts", ascending=True, k=6,
        after=(a1[-1]["ts"], a1[-1]["doc_id"]),
    ).collect()
    a12 = search_sorted(
        spark, tiny_index, Q, sort_by="ts", ascending=True, k=12
    ).collect()
    assert [r["doc_id"] for r in a1 + a2] == [r["doc_id"] for r in a12]
