"""End-to-end engine ↔ oracle rank-identity gate (SURVEY.md §5.2 items 1-3).

Every query in the frozen 60-query reference set must return EXACTLY the
oracle's top-k docIDs (rank-identical, docID tie-break) with scores within
1e-5 (target bit-equal float32). Exercised on the tiny tier for both the
exhaustive and the block-max-pruned paths — pruned == exhaustive is the
BM-WAND losslessness gate (SURVEY §4.3.6).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.fixtures import build_query_set
from cuvs_lucene_spark.oracle import oracle_search
from cuvs_lucene_spark.query import IndexReader, search


@pytest.fixture(scope="module")
def queries(oracle_tiny):
    term_df = {t: len(p[0]) for t, p in oracle_tiny.postings.items()}
    return build_query_set(term_df, oracle_tiny.n_docs)


def _filter_args(q, oracle_tiny):
    """(engine filter_cond, oracle accept mask) for filtered queries."""
    if "filter" not in q:
        return None, None
    meta = oracle_tiny.meta
    if q["filter"] == "role = 'user'":
        return F.col("role") == "user", (meta["role"] == "user").to_numpy()
    # ts range: first half of the corpus timeline
    cut = meta["ts"].quantile(0.5)
    return F.col("ts") <= F.lit(cut), (meta["ts"] <= cut).to_numpy()


def _run_and_compare(spark, tiny_index, oracle_tiny, q, prune):
    cond, accept = _filter_args(q, oracle_tiny)
    exp = oracle_search(oracle_tiny, q["text"], k=q["k"], mode=q["mode"], accept=accept)
    got_df = search(
        spark, tiny_index, q["text"], k=q["k"], mode=q["mode"],
        filter_cond=cond, prune=prune,
    )
    got = [(r["doc_id"], r["score"]) for r in got_df.collect()]
    assert [d for d, _ in got] == [d for d, _ in exp], (
        f"{q['qid']} prune={prune}: docIDs {got} != {exp}"
    )
    for (gd, gs), (ed, es) in zip(got, exp):
        assert abs(gs - es) < 1e-5, f"{q['qid']}: score {gs} vs {es} for doc {gd}"


def test_all_queries_exhaustive(spark, tiny_index, oracle_tiny, queries):
    assert len(queries) == 60
    for q in queries:
        _run_and_compare(spark, tiny_index, oracle_tiny, q, prune=False)


def test_all_queries_pruned(spark, tiny_index, oracle_tiny, queries):
    for q in queries:
        _run_and_compare(spark, tiny_index, oracle_tiny, q, prune=True)


def test_global_stats_match_oracle(spark, tiny_index, oracle_tiny):
    rd = IndexReader(spark, tiny_index)
    assert rd.n_docs == oracle_tiny.n_docs
    assert abs(rd.avgdl - oracle_tiny.avgdl) < 1e-12


def test_dictionary_df_matches_oracle(spark, tiny_index, oracle_tiny):
    rd = IndexReader(spark, tiny_index)
    some = sorted(oracle_tiny.postings)[::97]  # sample of terms
    stats = rd.term_stats(some)
    for t in some:
        assert stats[t][0] == len(oracle_tiny.postings[t][0]), t


def test_per_row_invariant(spark, tiny_index, tiny_pdf):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering
    (BASELINE.json.input_hint): doc_dim doc_ids enumerate the sorted corpus."""
    rd = IndexReader(spark, tiny_index)
    dd = rd.cat.read_doc_dim(spark).orderBy("doc_id").collect()
    src = tiny_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    assert len(dd) == len(src)
    for i in [0, 1, len(dd) // 2, len(dd) - 1]:
        assert dd[i]["doc_id"] == i
        assert dd[i]["conv_id"] == src["conv_id"][i]
        assert int(dd[i]["turn_idx"]) == int(src["turn_idx"][i])
    # dense, gapless
    ids = np.array([r["doc_id"] for r in dd])
    np.testing.assert_array_equal(ids, np.arange(len(dd)))


def test_flush_kernel_null_tail_batch():
    """Regression: an Arrow batch ending in NULL-text rows, whose last
    non-null doc ends alphanumeric, used to desync dl from the kept token
    rows (clipped reduceat) and crash the flush with IndexError."""
    import pandas as pd

    from cuvs_lucene_spark.codec import unpack_u64_blocks
    from cuvs_lucene_spark.operators.build import make_flush_kernel

    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            # doc0 starts with punctuation → forces the ""-token path;
            # doc1 ends alphanumeric; docs 2-4 are the NULL tail.
            "text": [" punct leads", "tail ends alnum", None, "", None],
        }
    )
    kern = make_flush_kernel(buckets=8, salt_buckets=4, hot_terms=[])
    out = pd.concat(list(kern(iter([pdf]))), ignore_index=True)
    # 2 distinct terms in doc0 + 3 in doc1 = 5 postings total
    assert int(out["doc_count"].sum()) == 5
    dls, _ = unpack_u64_blocks(list(out["dls"]))
    # every posting carries its doc's exact (quantized) dl: doc0→2, doc1→3
    from collections import Counter

    assert Counter(dls.tolist()) == {2: 2, 3: 3}
    docs_seen = set()
    gaps, counts = unpack_u64_blocks(list(out["doc_gaps"]))
    off = 0
    for i, c in enumerate(counts):
        first = int(out["first_doc"].iloc[i])
        docs_seen.update((first + np.cumsum(gaps[off:off + c])).tolist())
        off += c
    assert docs_seen == {0, 1}


def test_flush_kernel_all_null_batch():
    import pandas as pd

    from cuvs_lucene_spark.operators.build import make_flush_kernel

    pdf = pd.DataFrame({"doc_id": [7, 8], "text": [None, " ,;"]})
    kern = make_flush_kernel(buckets=8, salt_buckets=4, hot_terms=[])
    outs = list(kern(iter([pdf])))
    assert sum(int(o["doc_count"].sum()) for o in outs) == 0


def test_assign_doc_ids_fallback_on_nondeterministic_plan(spark):
    """A plan containing an exchange (repartition) must take the persisted
    fallback even when a probe would observe sorted partitions."""
    from cuvs_lucene_spark.operators.doc_ids import (
        _plan_is_stable_scan,
        assign_doc_ids,
    )

    rows = [(f"c{i:03d}", j, f"text {i} {j}") for i in range(6) for j in range(4)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    assert not _plan_is_stable_scan(df.repartition(3))
    out, handle = assign_doc_ids(df.repartition(3), return_cached=True)
    got = {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in out.collect()}
    expect = {
        (c, t): i for i, (c, t) in enumerate(sorted((c, t) for c, t, _ in rows))
    }
    assert got == expect
    handle.unpersist()


def test_assign_doc_ids_duplicate_keys_fallback(spark, tmp_path):
    """Duplicate (conv_id, turn_idx) keys disqualify the uncached fast path
    (within-partition order would be ambiguous across re-executions)."""
    import pandas as pd

    from cuvs_lucene_spark.operators.doc_ids import assign_doc_ids

    p = str(tmp_path / "dup.parquet")
    pd.DataFrame(
        {"conv_id": ["a", "a", "b"], "turn_idx": [1, 1, 2],
         "text": ["x", "y", "z"]}
    ).to_parquet(p)
    df = spark.read.parquet(p)
    out, handle = assign_doc_ids(df, return_cached=True)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 1, 2]
    # fallback persisted something → the handle is a real cache
    assert handle.storageLevel.useMemory or handle.storageLevel.useDisk
    handle.unpersist()


def test_search_after_pagination(spark, tiny_index):
    """searchAfter analog: page-2 via the last hit of page-1 must equal rows
    k..2k of a single top-2k search (same ranking, same tie-breaks), pages
    are disjoint, and the PRUNED page-2 (block-max with a page-local θ —
    see _prune_blocks' searchAfter composition) matches the exhaustive one
    exactly."""
    from cuvs_lucene_spark.query import search

    q = "world school student"
    top20 = search(spark, tiny_index, q, k=20).collect()
    page1 = search(spark, tiny_index, q, k=10).collect()
    last = page1[-1]
    cursor = (float(last["score"]), int(last["doc_id"]))
    page2 = search(spark, tiny_index, q, k=10, after=cursor).collect()
    key = lambda r: (r["doc_id"], round(float(r["score"]), 5))
    assert [key(r) for r in page1 + page2] == [key(r) for r in top20]
    assert {r["doc_id"] for r in page1}.isdisjoint({r["doc_id"] for r in page2})

    # pruned paging == exhaustive paging, for both a mid-index cursor and a
    # deep one (few provable page members → the sound-θ fallback branch)
    page2_pruned = search(spark, tiny_index, q, k=10, prune=True, after=cursor).collect()
    assert [key(r) for r in page2_pruned] == [key(r) for r in page2]
    deep = top20[-1]
    deep_cursor = (float(deep["score"]), int(deep["doc_id"]))
    tail_ex = search(spark, tiny_index, q, k=10, after=deep_cursor).collect()
    tail_pr = search(spark, tiny_index, q, k=10, prune=True, after=deep_cursor).collect()
    assert [key(r) for r in tail_pr] == [key(r) for r in tail_ex]


def test_must_not_and_msm_match_oracle(spark, tiny_index, oracle_tiny):
    """BooleanQuery MUST_NOT (exclude=) and minimum_should_match (msm=):
    engine == numpy oracle with the equivalent accept mask; exclusion under
    prune=True equals exhaustive (θ must ignore excluded docs)."""
    import numpy as np

    from cuvs_lucene_spark.oracle import oracle_search
    from cuvs_lucene_spark.query import search

    q = "world school student"
    n = len(oracle_tiny.doc_ids)

    # MUST_NOT: exclude docs containing 'the' or 'water'
    ex_terms = ["the", "water"]
    banned = np.zeros(n, dtype=bool)
    for t in ex_terms:
        d, _tf = oracle_tiny.postings.get(t, (np.array([], dtype=int), None))
        banned[d] = True
    want = oracle_search(oracle_tiny, q, k=10, accept=~banned)
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in search(
            spark, tiny_index, q, k=10, exclude=" ".join(ex_terms)
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-5)
    got_p = [
        (int(r["doc_id"]), float(r["score"]))
        for r in search(
            spark, tiny_index, q, k=10, exclude=" ".join(ex_terms), prune=True
        ).collect()
    ]
    assert got_p == got

    # msm=2: docs matching >= 2 distinct query terms; scores unchanged
    matched = np.zeros(n, dtype=np.int32)
    for t in set(q.split()):
        d, _tf = oracle_tiny.postings.get(t, (np.array([], dtype=int), None))
        matched[d] += 1
    want2 = oracle_search(oracle_tiny, q, k=10, accept=matched >= 2)
    got2 = [
        (int(r["doc_id"]), float(r["score"]))
        for r in search(spark, tiny_index, q, k=10, msm=2).collect()
    ]
    assert [d for d, _ in got2] == [d for d, _ in want2]
    for (_, gs), (_, ws) in zip(got2, want2):
        assert gs == pytest.approx(ws, abs=1e-5)

    # guards: msm over the term count → empty; prune=True+msm rejected;
    # msm with AND rejected
    assert search(spark, tiny_index, q, k=10, msm=4).count() == 0
    with pytest.raises(ValueError, match="unsound"):
        search(spark, tiny_index, q, k=10, msm=2, prune=True)
    with pytest.raises(ValueError, match="mode='or'"):
        search(spark, tiny_index, q, k=10, msm=2, mode="and")


def test_count_matches_equals_exhaustive(spark, tiny_index):
    """count == number of rows an exhaustive search returns at k=N, for both
    boolean modes and under a filter; absent terms count 0."""
    from cuvs_lucene_spark.query import count_matches, search

    for q, mode in [("world school student", "or"), ("world the", "and")]:
        n = count_matches(spark, tiny_index, q, mode=mode)
        full = search(spark, tiny_index, q, k=10**9, mode=mode).count()
        assert n == full > 0
    f = F.col("role") == "user"
    nf = count_matches(spark, tiny_index, "world", filter_cond=f)
    assert nf == search(spark, tiny_index, "world", k=10**9, filter_cond=f).count()
    assert count_matches(spark, tiny_index, "zzzzqqqq") == 0
    assert count_matches(spark, tiny_index, "world zzzzqqqq", mode="and") == 0
    # MUST_NOT and msm mirror the search() clause surface exactly
    q = "world school student"
    ne = count_matches(spark, tiny_index, q, exclude="the water")
    assert ne == search(spark, tiny_index, q, k=10**9, exclude="the water").count()
    nm = count_matches(spark, tiny_index, q, msm=2)
    assert nm == search(spark, tiny_index, q, k=10**9, msm=2).count()
    assert 0 < nm < count_matches(spark, tiny_index, q)
    assert count_matches(spark, tiny_index, q, msm=4) == 0


def test_facet_counts_match_search_partition(spark, tiny_index):
    """Facet counts == exhaustive match set grouped by the facet column;
    per-facet totals sum to count_matches; clause surface and ordering
    (n_docs DESC, facet ASC) pinned; absent term → empty."""
    from collections import Counter

    from cuvs_lucene_spark.query import (
        IndexReader,
        count_matches,
        facet_counts,
        search,
    )

    q = "world school student"
    rows = facet_counts(spark, tiny_index, q, facet="role").collect()
    got = {r["facet"]: r["n_docs"] for r in rows}
    full = search(spark, tiny_index, q, k=10**9).collect()
    rd = IndexReader(spark, tiny_index)
    dd = {
        r["doc_id"]: r["role"]
        for r in rd.cat.read_doc_dim(spark).select("doc_id", "role").collect()
    }
    assert got == dict(Counter(dd[r["doc_id"]] for r in full))
    assert sum(got.values()) == count_matches(spark, tiny_index, q)
    assert rows == sorted(rows, key=lambda r: (-r["n_docs"], r["facet"]))
    # clause surface composes (filter + exclude), top_n caps categories
    f = F.col("role") != "tool"
    rows_f = facet_counts(
        spark, tiny_index, q, facet="role", filter_cond=f, exclude="the"
    ).collect()
    full_f = search(
        spark, tiny_index, q, k=10**9, filter_cond=f, exclude="the"
    ).collect()
    assert {r["facet"]: r["n_docs"] for r in rows_f} == dict(
        Counter(dd[r["doc_id"]] for r in full_f)
    )
    assert len(facet_counts(spark, tiny_index, q, facet="role", top_n=1).collect()) == 1
    assert facet_counts(spark, tiny_index, "zzzzqqqq", facet="role").count() == 0


def test_rescore_matches_manual_two_pass(spark, tiny_index):
    """QueryRescorer analog: top-window of q1 combined with q2's scores on
    exactly those docs (0 where unmatched), top-k of w1·s1 + w2·s2; docs
    outside the window never return regardless of their q2 score; window
    cap raises loudly."""
    from cuvs_lucene_spark.query import RESCORE_MAX_WINDOW, rescore, search

    q1, q2, window, w1, w2 = "world school student", "world school", 25, 1.0, 2.0
    got = rescore(
        spark, tiny_index, q1, q2, k=10, window=window,
        query_weight=w1, rescore_weight=w2, rescore_mode="and", float32=False,
    ).collect()

    first = search(spark, tiny_index, q1, k=window, float32=False).collect()
    second = {
        r["doc_id"]: r["score"]
        for r in search(
            spark, tiny_index, q2, k=10**9, mode="and", float32=False
        ).collect()
    }
    exp = sorted(
        (
            (r["doc_id"], w1 * r["score"] + w2 * second.get(r["doc_id"], 0.0))
            for r in first
        ),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, es) in zip(got, exp):
        assert r["score"] == pytest.approx(es, abs=1e-9)
    # window semantics: a doc q2 matches but q1 ranks below the window stays out
    window_ids = {r["doc_id"] for r in first}
    assert all(r["doc_id"] in window_ids for r in got)

    with pytest.raises(ValueError, match="RESCORE_MAX_WINDOW"):
        rescore(spark, tiny_index, q1, q2, window=RESCORE_MAX_WINDOW + 1)
    assert rescore(spark, tiny_index, "zzzznoterm", q2, k=5).count() == 0


def test_boost_by_reranks_and_matches_manual_boost(spark, tiny_index):
    """FunctionScoreQuery analog: boost_by multiplies the float64 total per
    doc BEFORE top-k — equal to manually boosting the exhaustive unboosted
    match set; prune=True raises; `after` paginates the BOOSTED ranking."""
    from cuvs_lucene_spark.query import IndexReader, search

    q = "world school student"
    boost = "1.0 + cast(turn_idx as double) / 10.0"
    got = search(spark, tiny_index, q, k=12, float32=False, boost_by=boost).collect()

    full = search(spark, tiny_index, q, k=10**9, float32=False).collect()
    rd = IndexReader(spark, tiny_index)
    ti = {
        r["doc_id"]: r["turn_idx"]
        for r in rd.cat.read_doc_dim(spark).select("doc_id", "turn_idx").collect()
    }
    exp = sorted(
        ((r["doc_id"], r["score"] * (1.0 + ti[r["doc_id"]] / 10.0)) for r in full),
        key=lambda t: (-t[1], t[0]),
    )[:12]
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, es) in zip(got, exp):
        assert r["score"] == pytest.approx(es, abs=1e-9)
    # the boost genuinely re-ranks (not a monotone relabel) on this corpus
    assert [r["doc_id"] for r in got] != [r["doc_id"] for r in full[:12]]

    with pytest.raises(ValueError, match="boost_by"):
        search(spark, tiny_index, q, k=5, prune=True, boost_by=boost)

    # pagination addresses the boosted ranking
    pg1 = got[:6]
    pg2 = search(
        spark, tiny_index, q, k=6, float32=False, boost_by=boost,
        after=(pg1[-1]["score"], pg1[-1]["doc_id"]),
    ).collect()
    assert [r["doc_id"] for r in pg2] == [r["doc_id"] for r in got[6:12]]


def test_facet_pivot_matches_search_partition(spark, tiny_index):
    """Pivot facet == exhaustive match set grouped by the dim tuple; NULL
    dim values form their own bucket; totals sum to count_matches; top_n
    caps rows; absent term → empty."""
    from collections import Counter

    from cuvs_lucene_spark.query import count_matches, facet_pivot, IndexReader, search

    q = "world school student"
    rows = facet_pivot(spark, tiny_index, q, dims=["role", "turn_idx"]).collect()
    got = {(r["role"], r["turn_idx"]): r["n_docs"] for r in rows}
    full = search(spark, tiny_index, q, k=10**9).collect()
    rd = IndexReader(spark, tiny_index)
    dd = {
        r["doc_id"]: (r["role"], r["turn_idx"])
        for r in rd.cat.read_doc_dim(spark)
        .select("doc_id", "role", "turn_idx")
        .collect()
    }
    assert got == dict(Counter(dd[r["doc_id"]] for r in full))
    assert sum(got.values()) == count_matches(spark, tiny_index, q)
    assert len(facet_pivot(spark, tiny_index, q, dims=["role"], top_n=2).collect()) == 2
    assert facet_pivot(spark, tiny_index, "zzzzqqqq", dims=["role"]).count() == 0
    with pytest.raises(ValueError):
        facet_pivot(spark, tiny_index, q, dims=[])


def test_facet_stats_matches_search_partition(spark, tiny_index):
    """Stats facet == per-facet min/max/sum/avg of the value column over the
    exhaustive match set, all from one pass; absent term → empty."""
    from cuvs_lucene_spark.query import facet_stats, IndexReader, search

    q = "world school student"
    rows = facet_stats(spark, tiny_index, q, on="turn_idx", by="role").collect()
    full = search(spark, tiny_index, q, k=10**9).collect()
    rd = IndexReader(spark, tiny_index)
    dd = {
        r["doc_id"]: (r["role"], r["turn_idx"])
        for r in rd.cat.read_doc_dim(spark)
        .select("doc_id", "role", "turn_idx")
        .collect()
    }
    by_role: dict[str, list[int]] = {}
    for r in full:
        role, ti = dd[r["doc_id"]]
        by_role.setdefault(role, []).append(ti)
    assert len(rows) == len(by_role)
    for r in rows:
        vals = by_role[r["facet"]]
        assert r["n_docs"] == len(vals)
        assert r["min_v"] == min(vals)
        assert r["max_v"] == max(vals)
        assert r["sum_v"] == sum(vals)
        assert r["avg_v"] == pytest.approx(sum(vals) / len(vals), abs=1e-9)
    assert facet_stats(spark, tiny_index, "zzzzqqqq", on="turn_idx").count() == 0


def test_facet_ranges_match_search_partition(spark, tiny_index):
    """Range facets == independent per-range counts over the exhaustive
    match set (half-open [lo, hi) semantics, overlap counted in BOTH ranges,
    open bounds, caller ordering, zero-count labels preserved)."""
    from cuvs_lucene_spark.query import facet_ranges, search

    q = "world school student"
    full = search(spark, tiny_index, q, k=10**9).collect()
    ids = [r["doc_id"] for r in full]
    from cuvs_lucene_spark.query import IndexReader

    rd = IndexReader(spark, tiny_index)
    ts_of = {
        r["doc_id"]: r["ts"]
        for r in rd.cat.read_doc_dim(spark).select("doc_id", "ts").collect()
    }
    vals = sorted(ts_of[i] for i in ids)
    assert len(vals) >= 4  # non-degenerate fixture
    mid, hi_b = vals[len(vals) // 2], vals[-2]
    ranges = [
        ("lo_half", None, mid),
        ("hi_half", mid, None),
        ("overlap_all", None, None),  # overlaps both halves entirely
        ("upper_slice", hi_b, None),
        ("empty", vals[-1].replace(year=2099), None),
    ]
    rows = facet_ranges(
        spark, tiny_index, q, ranges=ranges, on="ts"
    ).collect()
    # caller order preserved, one row per range including zero counts
    assert [r["facet"] for r in rows] == [lbl for lbl, _, _ in ranges]
    got = {r["facet"]: r["n_docs"] for r in rows}
    exp = {
        lbl: sum(
            1
            for v in vals
            if (lo is None or v >= lo) and (hi is None or v < hi)
        )
        for lbl, lo, hi in ranges
    }
    assert got == exp
    assert got["overlap_all"] == len(ids)  # overlap counts independently
    assert got["lo_half"] + got["hi_half"] == len(ids)
    assert got["empty"] == 0
    # absent term → all labels present with zero counts
    z = facet_ranges(
        spark, tiny_index, "zzzzqqqq", ranges=ranges[:2], on="ts"
    ).collect()
    assert [(r["facet"], r["n_docs"]) for r in z] == [
        ("lo_half", 0),
        ("hi_half", 0),
    ]


def test_search_batch_equals_per_query(spark, tiny_index):
    """One-job batch == the per-query search results (same docs, same
    rounded scores, same order), absent-term queries silently empty, and an
    AND query agrees with its single-query twin."""
    from cuvs_lucene_spark.query import search, search_batch

    qs = ["world school", "student country help", "zzzzqqqq", "world the"]
    modes = {3: "and"}  # qid 3 checked via its own single-query AND run
    batch = search_batch(spark, tiny_index, qs, k=10).collect()
    by_qid = {}
    for r in batch:
        by_qid.setdefault(r["qid"], []).append(
            (r["doc_id"], round(float(r["score"]), 4))
        )
    assert 2 not in by_qid  # absent term → no rows for that qid
    for qi in (0, 1):
        single = [
            (r["doc_id"], round(float(r["score"]), 4))
            for r in search(spark, tiny_index, qs[qi], k=10).collect()
        ]
        assert by_qid[qi] == single
    # OR batch ranks 'world the' by OR semantics; compare with OR single
    single3 = [
        (r["doc_id"], round(float(r["score"]), 4))
        for r in search(spark, tiny_index, qs[3], k=10).collect()
    ]
    assert by_qid[3] == single3
    # AND mode batch
    and_batch = search_batch(spark, tiny_index, ["world the"], k=10, mode="and").collect()
    and_single = search(spark, tiny_index, "world the", k=10, mode="and").collect()
    assert [(r["doc_id"], round(float(r["score"]), 4)) for r in and_batch] == [
        (r["doc_id"], round(float(r["score"]), 4)) for r in and_single
    ]


def test_explain_matches_search_score(spark, tiny_index):
    """Explanation analog: per-term contributions sum to exactly the score
    search() computes (float64 oracle-parity mode); unmatched docs report
    matched=False."""
    from cuvs_lucene_spark.query import explain, search

    q = "world school student"
    top = search(spark, tiny_index, q, k=3, float32=False).collect()
    for r in top:
        ex = explain(spark, tiny_index, q, int(r["doc_id"]))
        assert ex["matched"]
        assert abs(ex["score"] - float(r["score"])) < 1e-12
        assert abs(sum(t["contribution"] for t in ex["terms"].values()) - ex["score"]) < 1e-15
    assert explain(spark, tiny_index, q, 10**9)["matched"] is False
    assert explain(spark, tiny_index, "zzzzqqqq", 0)["matched"] is False


def test_pruned_query_leaves_no_cache(spark, tiny_index):
    """Regression (round-1 VERDICT): the pruned path persists a bounds frame
    and must unpersist it on BOTH the early-return and success paths —
    repeated pruned queries may not grow the session's persistent-RDD set."""
    from cuvs_lucene_spark.query import search

    def persistent_ids():
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())

    search(spark, tiny_index, "world school", k=5, prune=True).collect()  # settle
    before = persistent_ids()
    for _ in range(3):
        search(spark, tiny_index, "world school", k=5, prune=True).collect()
        search(spark, tiny_index, "zzzzqqqq", k=5, prune=True).collect()  # early return
    assert persistent_ids() <= before


def test_drill_sideways_matches_per_dim_facets(spark, tiny_index):
    """DrillSideways == per-dim facet_counts with every OTHER dim's
    constraint as filter_cond (the N-query spec the one-pass plan replaces);
    drill_down == search with the combined AND filter."""
    from cuvs_lucene_spark.query import (
        drill_down,
        drill_sideways,
        facet_counts,
        search,
    )

    q = "world school"
    dims = {"role": ["user", "tool"], "turn_idx": [0, 1, 2, 3, 4]}
    got = drill_sideways(spark, tiny_index, q, dims=dims).collect()
    by_dim: dict = {}
    for r in got:
        by_dim.setdefault(r["dim"], {})[r["facet"]] = r["n_docs"]

    # spec: for each dim, facet over match set filtered by the other dims
    role_spec = {
        r["facet"]: r["n_docs"]
        for r in facet_counts(
            spark, tiny_index, q, facet="role",
            filter_cond=F.col("turn_idx").isin([0, 1, 2, 3, 4]),
        ).collect()
    }
    turn_spec = {
        str(r["facet"]): r["n_docs"]
        for r in facet_counts(
            spark, tiny_index, q,
            facet=F.col("turn_idx").cast("string"),
            filter_cond=F.col("role").isin(["user", "tool"]),
        ).collect()
    }
    assert by_dim["role"] == role_spec
    assert by_dim["turn_idx"] == turn_spec
    # ordering contract: dim asc, n_docs desc, facet asc
    key = [(r["dim"], -r["n_docs"], r["facet"]) for r in got]
    assert key == sorted(key)

    # drill_down == search with the ANDed dim filter
    dd = drill_down(spark, tiny_index, q, dims=dims, k=10, float32=False)
    cond = F.col("role").isin(["user", "tool"]) & F.col("turn_idx").isin(
        [0, 1, 2, 3, 4]
    )
    want = search(spark, tiny_index, q, k=10, filter_cond=cond, float32=False)
    assert [(r["doc_id"], r["score"]) for r in dd.collect()] == [
        (r["doc_id"], r["score"]) for r in want.collect()
    ]

    # empty dims rejected; absent term -> empty frame with the schema
    with pytest.raises(ValueError):
        drill_sideways(spark, tiny_index, q, dims={})
    assert (
        drill_sideways(spark, tiny_index, "zzqqneverterm", dims=dims).count()
        == 0
    )


class TestSearchWithContext:
    """Context retrieval (search_with_context): every hit carries its
    ±window conversation neighborhood, pinned against an independent
    pandas spec over the same corpus."""

    def test_context_matches_pandas_spec(self, spark, tiny_index, tiny_df, tiny_pdf):
        from cuvs_lucene_spark.query import search, search_with_context

        q, w = "world school", 2
        hits = [
            (r["doc_id"], r["score"], r["conv_id"], r["turn_idx"])
            for r in search(spark, tiny_index, q, k=5).collect()
        ]
        got = [
            (r["doc_id"], r["conv_id"], r["ctx_turn_idx"], r["offset"],
             r["is_hit"], r["role"], r["text"])
            for r in search_with_context(
                spark, tiny_index, tiny_df, q, k=5, window=w
            ).collect()
        ]
        # independent spec: pandas range scan per hit, same ordering
        pdf = tiny_pdf
        want = []
        for did, _s, cid, tix in hits:  # hits are (score desc, doc_id asc)
            conv = pdf[pdf["conv_id"] == cid].sort_values("turn_idx")
            win = conv[(conv["turn_idx"] >= tix - w) & (conv["turn_idx"] <= tix + w)]
            for r in win.itertuples():
                want.append(
                    (did, cid, int(r.turn_idx), int(r.turn_idx) - tix,
                     int(r.turn_idx) == tix, r.role, r.text)
                )
        assert got == want and got
        # exactly one anchor row per hit; offsets bounded
        anchors = [g for g in got if g[4]]
        assert len(anchors) == len(hits)
        assert all(-w <= g[3] <= w for g in got)

    def test_window_zero_is_hits_only(self, spark, tiny_index, tiny_df):
        from cuvs_lucene_spark.query import search, search_with_context

        got = search_with_context(
            spark, tiny_index, tiny_df, "world school", k=5, window=0
        ).collect()
        base = search(spark, tiny_index, "world school", k=5).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in base
        ]
        assert all(r["is_hit"] and r["offset"] == 0 for r in got)

    def test_negative_window_rejected(self, spark, tiny_index, tiny_df):
        import pytest as _pt

        from cuvs_lucene_spark.query import search_with_context

        with _pt.raises(ValueError, match="window"):
            search_with_context(
                spark, tiny_index, tiny_df, "world", k=5, window=-1
            )
