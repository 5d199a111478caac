"""Highlighter (Lucene Highlighter analog) — original-text snippet pinned
against an independently-written reference implementation.

The driver gate (`fts_highlight`) hash-matches the ANALYZED-token snippet
against DuckDB; this module pins the part SQL cannot reproduce — the
original-text fragment with casing/punctuation preserved and matched token
spans tag-wrapped — using a reference highlighter built on a DIFFERENT
strategy (re.split with capturing separators + running offsets) than the
engine's finditer kernel.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.highlight import highlight


@pytest.fixture(scope="module")
def punct_index(spark, tmp_path_factory):
    """Micro corpus with real casing/punctuation (the tiny tier is
    lowercase/space-only, so it cannot exercise offset reconstruction)."""
    from cuvs_lucene_spark.operators.build import build_index

    rows = [
        ("c0", 0, "user", "Merge Sort, then JOIN! A merge-join beats nested loops.", None, "2026-01-01 00:00:00"),
        ("c0", 1, "assistant", "The sort phase: quick-sort first, MERGE second; join last.", None, "2026-01-01 00:00:05"),
        ("c1", 0, "user", "No relevant terms here at all — just filler words only.", None, "2026-01-01 00:01:00"),
        ("c1", 1, "assistant", "join", None, "2026-01-01 00:01:05"),
        ("c2", 0, "user", "sort sort sort sort sort sort sort sort sort sort sort merge", None, "2026-01-01 00:02:00"),
        ("c2", 1, "tool", "   Leading spaces, then Merge(x, y) -> sorted output?! ", None, "2026-01-01 00:02:30"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path_factory.mktemp("hlidx") / "punct")
    build_index(spark, df, d, buckets=4, salt_buckets=2, hot_df_ratio=0.5)
    return d, df


def _ref_highlight(text, q_terms, window_size, lead, pre="<em>", post="</em>"):
    """Independent reference: re.split with a CAPTURING separator pattern,
    offsets tracked by accumulation (vs the engine's finditer spans)."""
    parts = re.split(r"([^a-zA-Z0-9]+)", text)  # tokens and separators alternate
    toks, spans, off = [], [], 0
    for p in parts:
        if p and not re.match(r"[^a-zA-Z0-9]+$", p):
            toks.append(p.lower())
            spans.append((off, off + len(p)))
        off += len(p)
    matched = [i for i, t in enumerate(toks) if t in q_terms]
    start = max(0, matched[0] - lead) if matched else 0
    end = min(len(toks), start + window_size)
    if end <= start:
        return start, 0, ""
    n_match = sum(1 for i in matched if start <= i < end)
    out, cur = [], spans[start][0]
    for i in range(start, end):
        a, b = spans[i]
        out.append(text[cur:a])
        w = text[a:b]
        out.append(pre + w + post if toks[i] in q_terms else w)
        cur = b
    return start, n_match, "".join(out)


def test_snippets_match_independent_reference(spark, punct_index):
    idx, df = punct_index
    q = "merge sort join"
    got = highlight(
        spark, idx, df, q, k=10, window_size=6, lead=2
    ).collect()
    assert len(got) == 5  # five docs contain at least one query term
    text_of = {(r["conv_id"], r["turn_idx"]): r["text"] for r in df.collect()}
    qset = frozenset(q.split())
    for r in got:
        start, n_match, snip = _ref_highlight(
            text_of[(r["conv_id"], r["turn_idx"])], qset, 6, 2
        )
        assert r["start_pos"] == start
        assert r["n_match"] == n_match
        assert r["snippet"] == snip
    # scores strictly ordered (desc, doc_id tiebreak) and every snippet wraps
    # at least one term
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    assert all("<em>" in r["snippet"] for r in got)


def test_window_anchoring_and_casing(spark, punct_index):
    idx, df = punct_index
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in highlight(
            spark, idx, df, "merge join", k=10, window_size=4, lead=1
        ).collect()
    }
    r = got[("c0", 0)]
    # first match is 'Merge' at position 0 → start stays 0; window of 4
    assert r["start_pos"] == 0
    assert r["snippet"].startswith("<em>Merge</em> Sort, then <em>JOIN</em>")
    # original casing preserved, punctuation between tokens intact
    assert "Sort," in r["snippet"]
    # c2 turn 0: 'merge' is the 12th token; lead=1 anchors at position 10
    r2 = got[("c2", 0)]
    assert r2["start_pos"] == 10
    assert r2["snippet"] == "sort <em>merge</em>"


def test_single_token_doc_and_no_match(spark, punct_index):
    idx, df = punct_index
    got = {
        (r["conv_id"], r["turn_idx"]): r
        for r in highlight(spark, idx, df, "join", k=10).collect()
    }
    r = got[("c1", 1)]
    assert r["snippet"] == "<em>join</em>"
    assert r["n_match"] == 1 and r["start_pos"] == 0
    assert highlight(spark, idx, df, "zzznope", k=5).count() == 0


def test_highlight_respects_search_knobs(spark, punct_index):
    idx, df = punct_index
    # AND mode: only docs containing BOTH terms
    got = highlight(spark, idx, df, "merge join", k=10, mode="and").collect()
    keys = {(r["conv_id"], r["turn_idx"]) for r in got}
    assert keys == {("c0", 0), ("c0", 1)}
    # exclude knocks out c0 turn 0 ('nested' appears there)
    got2 = highlight(
        spark, idx, df, "merge join", k=10, mode="and", exclude="nested"
    ).collect()
    assert {(r["conv_id"], r["turn_idx"]) for r in got2} == {("c0", 1)}


# ---------------------------------------------------------------------------
# span-accurate highlighting (WeightedSpanTermExtractor analog): only
# positions inside SURVIVING spans are marked — a query-term occurrence
# outside every matching span stays unmarked
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def span_hl_index(spark, tmp_path_factory):
    from cuvs_lucene_spark.operators.build import build_index

    rows = [
        # positions: merge@0 sort@2 ... merge@8 — the second merge is >2
        # away from any sort, so "merge sort"~2 marks ONLY merge@0,sort@2
        ("s0", 0, "user",
         "Merge the sort now; nothing then a lone merge appears later.",
         None, "2026-01-01 00:00:00"),
        # two spans in one doc: merge@0 sort@1, merge@5 sort@7
        ("s0", 1, "assistant",
         "merge sort wins; always merge before sort friends!",
         None, "2026-01-01 00:00:05"),
        # sort precedes merge — matches only unordered
        ("s1", 0, "user",
         "sort it, merge it, and stop worrying about the rest.",
         None, "2026-01-01 00:01:00"),
        ("s1", 1, "assistant",
         "no relevant words in this row at all, purely filler text.",
         None, "2026-01-01 00:01:05"),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    d = str(tmp_path_factory.mktemp("hlidx") / "spanpos")
    build_index(
        spark, df, d, buckets=4, salt_buckets=2, hot_df_ratio=0.5,
        positions=True,
    )
    return d, df


class TestChainConsistency:
    """The match-position helpers are pinned to the scoring kernels:
    recomputing pf from the returned chains/states must equal the pf the
    engine scores with, on randomized inputs including every filter."""

    @pytest.mark.parametrize("seed", range(25))
    def test_ordered_chains_reproduce_pf(self, seed):
        import random

        import numpy as np

        from cuvs_lucene_spark.spans import (
            ordered_span_chains, ordered_span_pf,
        )

        rng = random.Random(4200 + seed)
        n = rng.randint(1, 4)
        pos = [
            np.array(sorted(rng.sample(range(40), rng.randint(0, 8))),
                     dtype=np.int64)
            for _ in range(n)
        ]
        slop = rng.randint(0, 10)
        end = rng.choice([None, rng.randint(1, 45)])
        excl = np.array(sorted(rng.sample(range(40), rng.randint(0, 5))),
                        dtype=np.int64)
        pre, post = rng.randint(0, 2), rng.randint(0, 2)
        chains = ordered_span_chains(
            pos, slop, max_end=end, excl=excl, pre=pre, post=post
        )
        pf_from_chains = sum(
            1.0 / (1.0 + (c[-1] - c[0] - (len(c) - 1))) for c in chains
        )
        if n == 1:
            # single width-0 spans: each chain contributes exactly 1
            pf_from_chains = float(len(chains))
        if n >= 2:
            got = ordered_span_pf(
                pos, slop, max_end=end, excl=excl, pre=pre, post=post
            )
            assert pf_from_chains == pytest.approx(got)

    @pytest.mark.parametrize("seed", range(25))
    def test_unordered_states_reproduce_pf(self, seed):
        import random

        import numpy as np

        from cuvs_lucene_spark.spans import (
            unordered_span_pf, unordered_span_states,
        )

        rng = random.Random(5200 + seed)
        n = rng.randint(2, 4)
        sample = rng.sample(range(50), 16)
        pools, at = [], 0
        for _ in range(n):
            take = rng.randint(1, 5)
            pools.append(
                np.array(sorted(sample[at:at + take]), dtype=np.int64)
            )
            at += take
        slop = rng.randint(0, 10)
        end = rng.choice([None, rng.randint(1, 55)])
        excl = np.array(sorted(rng.sample(range(50), rng.randint(0, 5))),
                        dtype=np.int64)
        pre, post = rng.randint(0, 2), rng.randint(0, 2)
        states = unordered_span_states(
            pools, slop, max_end=end, excl=excl, pre=pre, post=post
        )
        pf_from_states = sum(
            1.0 / (1.0 + (max(s) - min(s))) for s in states
        )
        got = unordered_span_pf(
            pools, slop, max_end=end, excl=excl, pre=pre, post=post
        )
        assert pf_from_states == pytest.approx(got)


class TestHighlightSpans:
    def test_only_span_positions_marked(self, spark, span_hl_index):
        from cuvs_lucene_spark.highlight import highlight_spans

        d, df = span_hl_index
        rows = {
            (r["conv_id"], r["turn_idx"]): r
            for r in highlight_spans(
                spark, d, df, "merge sort", slop=2, k=10, window_size=30,
                lead=0,
            ).collect()
        }
        # s0/0: span merge@0..sort@2; the lone merge@8 stays UNMARKED
        r = rows[("s0", 0)]
        assert r["snippet_tokens"].startswith("<em>merge</em> the <em>sort</em>")
        assert "lone merge appears" in r["snippet_tokens"]  # unmarked merge
        assert r["n_match"] == 2
        # s0/1: BOTH spans mark (4 marked positions)
        r2 = rows[("s0", 1)]
        assert r2["n_match"] == 4
        assert r2["snippet_tokens"].count("<em>") == 4
        # s1/0 (sort before merge) matches only unordered
        assert ("s1", 0) not in rows
        uno = {
            (r["conv_id"], r["turn_idx"])
            for r in highlight_spans(
                spark, d, df, "merge sort", slop=2, k=10, in_order=False
            ).collect()
        }
        assert ("s1", 0) in uno

    def test_marks_subset_of_bag_of_words(self, spark, span_hl_index):
        from cuvs_lucene_spark.highlight import highlight, highlight_spans

        d, df = span_hl_index
        span_r = {
            (r["conv_id"], r["turn_idx"]): r["snippet_tokens"].count("<em>")
            for r in highlight_spans(
                spark, d, df, "merge sort", slop=2, k=10, window_size=30,
                lead=0,
            ).collect()
        }
        bow_r = {
            (r["conv_id"], r["turn_idx"]): r["snippet_tokens"].count("<em>")
            for r in highlight(
                spark, d, df, "merge sort", k=10, window_size=30, lead=0,
                mode="and",
            ).collect()
        }
        assert span_r
        for key, n in span_r.items():
            assert n <= bow_r[key], key
        # the span-accuracy witness: s0/0 has 3 query-term occurrences but
        # only 2 participate in a span
        assert span_r[("s0", 0)] == 2 and bow_r[("s0", 0)] == 3

    def test_scores_and_order_match_span_search(self, spark, span_hl_index):
        from cuvs_lucene_spark.highlight import highlight_spans
        from cuvs_lucene_spark.spans import search_span_near

        d, df = span_hl_index
        hl = [
            (r["doc_id"], round(float(r["score"]), 6))
            for r in highlight_spans(
                spark, d, df, "merge sort", slop=2, k=10, float32=False
            ).collect()
        ]
        se = [
            (r["doc_id"], round(float(r["score"]), 6))
            for r in search_span_near(
                spark, d, "merge sort", slop=2, k=10, float32=False
            ).collect()
        ]
        assert hl and hl == se

    def test_exclusion_unmarks_vetoed_span(self, spark, span_hl_index):
        from cuvs_lucene_spark.highlight import highlight_spans

        d, df = span_hl_index
        # exclude 'the': s0/0's only span (merge THE sort) is vetoed → the
        # doc disappears; s0/1 keeps both spans (no 'the' inside them)
        rows = {
            (r["conv_id"], r["turn_idx"]): r
            for r in highlight_spans(
                spark, d, df, "merge sort", slop=2, k=10, exclude="the",
            ).collect()
        }
        assert ("s0", 0) not in rows
        assert rows[("s0", 1)]["n_match"] == 4

    def test_spanfirst_end_bound_respected(self, spark, span_hl_index):
        from cuvs_lucene_spark.highlight import highlight_spans

        d, df = span_hl_index
        # end=4: s0/1's first span [0,2) survives, the second (ends at 8)
        # is filtered → only 2 positions marked
        rows = {
            (r["conv_id"], r["turn_idx"]): r
            for r in highlight_spans(
                spark, d, df, "merge sort", slop=2, k=10, end=4,
                window_size=30, lead=0,
            ).collect()
        }
        assert rows[("s0", 1)]["n_match"] == 2
        assert ("s0", 0) in rows  # its span ends at 3 <= 4
