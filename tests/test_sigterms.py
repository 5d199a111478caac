"""Significant terms (ES significant_terms / JLH analog): engine result over
the built tiny index must equal an independent pandas/numpy computation over
the oracle index — foreground from the same top-k feedback set, fg/bg dfs
recounted from oracle postings, same JLH formula."""

import numpy as np
import pytest

from cuvs_lucene_spark.oracle import oracle_search
from cuvs_lucene_spark.sigterms import significant_terms

FG_K, TOP = 25, 15


def _independent_sigterms(oracle_tiny, query_terms):
    fg = {
        d for d, _ in oracle_search(
            oracle_tiny, " ".join(query_terms), k=FG_K, mode="or"
        )
    }
    fg_n = len(fg)
    n_docs = oracle_tiny.n_docs
    rows = []
    for t, p in oracle_tiny.postings.items():
        if t in query_terms:
            continue
        docs = set(int(d) for d in p[0])
        fg_df = len(docs & fg)
        if fg_df < 1:
            continue
        bg_df = len(docs)
        fgp, bgp = fg_df / fg_n, bg_df / n_docs
        rows.append((t, fg_df, bg_df, (fgp - bgp) * fgp / bgp))
    rows.sort(key=lambda r: (-round(r[3], 6), r[0]))
    return rows[:TOP]


def test_sigterms_matches_independent(spark, tiny_index, oracle_tiny):
    # two frequent fixture terms as the feedback query
    by_df = sorted(oracle_tiny.postings, key=lambda t: -len(oracle_tiny.postings[t][0]))
    q_terms = [by_df[0], by_df[2]]
    exp = _independent_sigterms(oracle_tiny, set(q_terms))
    got = significant_terms(
        spark, tiny_index, " ".join(q_terms),
        fg_k=FG_K, top_terms=TOP, float32=False,
    ).collect()
    assert [(r["term"], r["fg_df"], r["bg_df"]) for r in got] == [
        (t, f, b) for t, f, b, _ in exp
    ]
    for r, (_, _, _, s) in zip(got, exp):
        assert abs(r["score"] - round(s, 6)) < 1e-6


def test_sigterms_empty_and_exclusion(spark, tiny_index, oracle_tiny):
    assert (
        significant_terms(spark, tiny_index, "zzqqxxnotaterm", fg_k=10).count()
        == 0
    )
    by_df = sorted(oracle_tiny.postings, key=lambda t: -len(oracle_tiny.postings[t][0]))
    big = 10**6  # uncapped: the query term scores low (common), but must appear
    with_q = significant_terms(
        spark, tiny_index, by_df[0], fg_k=10, top_terms=big,
        exclude_query_terms=False, float32=False,
    ).collect()
    terms = {r["term"] for r in with_q}
    assert by_df[0] in terms  # raw ES behavior keeps the query term
    # and with exclusion (default) it disappears
    without = {
        r["term"] for r in significant_terms(
            spark, tiny_index, by_df[0], fg_k=10, top_terms=big, float32=False
        ).collect()
    }
    assert by_df[0] not in without
    assert terms - without == {by_df[0]}
