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
