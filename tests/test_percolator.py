"""Percolator (lucene-monitor / percolate analog): engine matches == an
independent python evaluation of the same boolean clause semantics, plus
guard rails and Q-tree registration."""

import pytest

from cuvs_lucene_spark.analysis import tokenize_py
from cuvs_lucene_spark.booleanq import Q
from cuvs_lucene_spark.percolator import (
    percolate,
    percolate_sql,
    register_queries,
)

DOCS = [
    (0, "merge sort the table"),
    (1, "stream and spark together"),
    (2, "stream spark window all three"),
    (3, "join with hash partition"),
    (4, "join without that word"),
    (5, "scan"),
    (6, "table key"),
    (7, "table alone"),
    (8, None),
    (9, ""),
]

QUERIES = {
    "ms": {"must": ["merge", "sort"]},
    "ssw2": {"should": ["stream", "spark", "window"], "msm": 2},
    "jnh": {"must": ["join"], "must_not": ["hash"]},
    "sb": {"should": ["scan", "batch"]},
    "tk1": {"must": ["table"], "should": ["key", "index"], "msm": 1},
    "t_opt": {"must": ["table"], "should": ["key", "index"]},  # msm 0
}


def _spec_matches():
    out = []
    for did, text in DOCS:
        toks = set(tokenize_py(text))
        for qid, q in QUERIES.items():
            must = set(q.get("must", ()))
            should = set(q.get("should", ()))
            notc = set(q.get("must_not", ()))
            msm = q.get("msm", 0)
            req = msm if must else max(msm, 1)
            if (
                must <= toks
                and len(should & toks) >= req
                and not (notc & toks)
            ):
                out.append((did, qid))
    return sorted(out)


def test_matches_independent_spec_and_duckdb(spark):
    import duckdb

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    terms, meta = register_queries(spark, QUERIES)
    got = sorted(
        (r["doc_id"], r["query_id"])
        for r in percolate(df, terms, meta).collect()
    )
    assert got == _spec_matches()
    # the semantics the spec encodes, spot-pinned:
    assert (0, "ms") in got and (0, "tk1") not in got  # no should hit
    assert (0, "t_opt") in got  # msm=0 with MUST: should optional
    assert (1, "ssw2") in got and (2, "ssw2") in got
    assert (3, "jnh") not in got and (4, "jnh") in got  # must_not veto
    assert (5, "sb") in got  # SHOULD-only needs >= 1
    assert all(d not in (8, 9) for d, _q in got)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", DOCS)
    want = sorted(tuple(r) for r in con.sql(percolate_sql("t", QUERIES)).fetchall())
    assert got == want


def test_q_tree_registration_and_guards(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    qtrees = {
        "ms": Q.boolean(must=[Q.term("merge"), Q.term("sort")]),
        "ssw2": Q.boolean(
            should=[Q.term("stream"), Q.term("spark"), Q.term("window")], msm=2
        ),
    }
    terms, meta = register_queries(spark, qtrees)
    got = sorted(
        (r["doc_id"], r["query_id"])
        for r in percolate(df, terms, meta).collect()
    )
    want = sorted(
        (d, q) for d, q in _spec_matches() if q in ("ms", "ssw2")
    )
    assert got == want
    with pytest.raises(ValueError, match="term"):
        register_queries(
            spark, {"p": Q.boolean(must=[Q.phrase("merge sort")])}
        )
    with pytest.raises(ValueError, match="MUST or SHOULD"):
        register_queries(spark, {"n": {"must_not": ["x"]}})
    with pytest.raises(ValueError, match="msm"):
        register_queries(spark, {"m": {"should": ["a"], "msm": 2}})
