"""Query-term highlighting — the Lucene Highlighter analog.

Lucene's default ``Highlighter`` re-analyzes the STORED field text of each
hit and extracts a best fragment with the query terms wrapped in formatter
tags (SimpleHTMLFormatter/SimpleFragmenter). Our index — like the reference's
(raw values delegated to the flat store, ``CuVS2510GPUVectorsFormat.java:54-56``)
— never duplicates the source text, so the caller supplies the source-of-truth
transcripts DataFrame and the highlighter joins the top-k hits back to it.

Fragment semantics (pinned, deterministic, oracle-checkable):

  toks      = analyzer tokens of the text (the engine's single tokenizer)
  matched   = positions i with toks[i] ∈ query terms
  start_pos = max(0, min(matched) − lead)       (0 when nothing matched)
  window    = toks[start_pos : start_pos + window_size]
  n_match   = count of matched positions inside the window
  snippet_tokens = space-joined ANALYZED tokens of the window, matches
                   wrapped in pre/post tags — byte-reproducible in SQL from
                   the token stream, so the DuckDB oracle hash-matches it
  snippet   = the ORIGINAL text span of the window (casing/punctuation
              preserved, matched token spans wrapped) — the user-facing
              fragment, pinned by pytest against an independent
              implementation (SQL cannot recover original char offsets)

This is SimpleFragmenter-shaped (one fixed-size fragment anchored at the
first match) rather than best-of-N fragment scoring; the window always
contains the document's FIRST query-term occurrence.

Plan shape at scale: the k hits are collected (k rows — the same bounded
driver collect every searchAfter page does), their (conv_id, turn_idx) keys
pushed into the corpus scan as an IN-filter (partition/row-group pruning on a
conv-sorted layout), and the snippet kernel runs as an Arrow-batched
mapInPandas over exactly k joined rows. No full-corpus work anywhere.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# finditer twin of analysis.TOKEN_PATTERN ("[^a-z0-9]+" split): runs of token
# chars over the lowercased text give exactly the split's non-empty tokens,
# plus the char spans the split throws away.
_TOKEN_RUN = re.compile(r"[a-z0-9]+")

HIGHLIGHT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("score", DoubleType()),
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("start_pos", IntegerType()),
        StructField("n_match", IntegerType()),
        StructField("snippet_tokens", StringType()),
        StructField("snippet", StringType()),
    ]
)


def _make_snippet_kernel(
    matched_of, window_size: int, lead: int, pre: str, post: str,
    text_col: str,
):
    """matched_of(toks) -> set[int]: the token positions to tag. Term
    highlighting marks every query-term occurrence; span highlighting marks
    exactly the positions participating in a surviving span match."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                text = getattr(r, text_col) or ""
                low = text.lower()
                spans = [(m.start(), m.end()) for m in _TOKEN_RUN.finditer(low)]
                toks = [low[a:b] for a, b in spans]
                matched = sorted(matched_of(toks))
                start = max(0, matched[0] - lead) if matched else 0
                end = min(len(toks), start + window_size)
                mset = set(matched)
                n_match = sum(1 for i in matched if start <= i < end)
                snip_toks = " ".join(
                    (pre + toks[i] + post) if i in mset else toks[i]
                    for i in range(start, end)
                )
                if end > start:
                    pieces, cur = [], spans[start][0]
                    for i in range(start, end):
                        a, b = spans[i]
                        pieces.append(text[cur:a])
                        w = text[a:b]
                        pieces.append((pre + w + post) if i in mset else w)
                        cur = b
                    snippet = "".join(pieces)
                else:
                    snippet = ""
                out.append(
                    (
                        int(r.doc_id), float(r.score), r.conv_id,
                        int(r.turn_idx), int(start), int(n_match),
                        snip_toks, snippet,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in HIGHLIGHT_SCHEMA.fields]
            )

    return kernel


def highlight(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    query: str,
    k: int = 10,
    window_size: int = 12,
    lead: int = 3,
    pre: str = "<em>",
    post: str = "</em>",
    text_col: str = "text",
    mode: str = "or",
    filter_cond: Column | str | None = None,
    prune: bool | str = False,
    exclude: str | None = None,
    msm: int | None = None,
    float32: bool = True,
) -> DataFrame:
    """Top-k BM25 search + per-hit highlighted fragment.

    ``corpus`` is the source-of-truth transcripts DataFrame the index was
    built from (must carry conv_id, turn_idx and ``text_col``); the index
    stores no text, exactly like the reference's raw-value delegation.

    Returns (doc_id, score, conv_id, turn_idx, start_pos, n_match,
    snippet_tokens, snippet) in (score desc, doc_id asc) order — see module
    docstring for the pinned fragment semantics.
    """
    from cuvs_lucene_spark.analysis import tokenize_py
    from cuvs_lucene_spark.query import IndexReader, search

    rd = IndexReader(spark, index_dir)
    if rd.analyzer != "standard":
        raise NotImplementedError(
            "highlighting on a non-standard-analyzed index is not supported:"
            " snippet offsets are raw-token based, but the hits match"
            f" {rd.analyzer!r}-chain terms"
        )
    hits = search(
        spark, index_dir, query, k=k, mode=mode, filter_cond=filter_cond,
        prune=prune, exclude=exclude, msm=msm, float32=float32, reader=rd,
    ).collect()  # ≤ k rows — the bounded collect every searchAfter page does
    if not hits:
        return spark.createDataFrame([], HIGHLIGHT_SCHEMA)
    q_terms = frozenset(tokenize_py(query))

    hits_df = spark.createDataFrame(
        [(r["doc_id"], float(r["score"]), r["conv_id"], r["turn_idx"])
         for r in hits],
        "doc_id long, score double, conv_id string, turn_idx int",
    )
    # key pushdown: the k conv_ids reach the corpus scan as an IN filter
    # (partition / row-group pruning on a conv-clustered layout); the exact
    # (conv_id, turn_idx) pairing happens in the broadcast join below.
    convs = sorted({r["conv_id"] for r in hits})
    src = (
        corpus.where(F.col("conv_id").isin(convs))
        .select("conv_id", "turn_idx", text_col)
    )
    joined = src.join(F.broadcast(hits_df), ["conv_id", "turn_idx"])

    def matched_of(toks: list[str]) -> set[int]:
        return {i for i, t in enumerate(toks) if t in q_terms}

    out = joined.mapInPandas(
        _make_snippet_kernel(matched_of, window_size, lead, pre, post, text_col),
        HIGHLIGHT_SCHEMA,
    )
    return out.orderBy(F.desc("score"), F.asc("doc_id"))


def highlight_spans(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    query: str | list[str],
    slop: int = 0,
    k: int = 10,
    in_order: bool = True,
    window_size: int = 12,
    lead: int = 3,
    pre: str = "<em>",
    post: str = "</em>",
    text_col: str = "text",
    filter_cond: Column | str | None = None,
    exclude: str | None = None,
    span_pre: int = 0,
    span_post: int = 0,
    start: int = 0,
    end: int | None = None,
    float32: bool = True,
) -> DataFrame:
    """Span-accurate highlighting — the position-aware highlighter Lucene's
    span-aware highlighters provide (WeightedSpanTermExtractor /
    UnifiedHighlighter OffsetsEnum): top-k span-near hits, fragment anchored
    at the FIRST position participating in a SURVIVING span, and ONLY the
    positions inside surviving spans tag-wrapped — a query-term occurrence
    outside every matching span stays unmarked, which is exactly what
    distinguishes this from the bag-of-words highlight().

    Accepts the full span surface: ``query`` as a list for per-clause
    SpanOr alternatives, ``in_order``, the SpanNot exclusion
    (``exclude``/``span_pre``/``span_post`` — named apart from the
    ``pre``/``post`` TAG strings), and the SpanPositionRange
    ``start``/``end`` bounds. Returns
    the HIGHLIGHT_SCHEMA columns; snippet_tokens is SQL-reproducible from
    the token stream (gate-oracle-checkable), snippet preserves original
    casing/punctuation. Same bounded plan as highlight(): k-row collect,
    conv-key IN-filter pushdown, Arrow kernel over exactly k joined rows."""
    from cuvs_lucene_spark.query import IndexReader
    from cuvs_lucene_spark.spans import (
        _parse_clauses,
        ordered_span_chains,
        search_span_near,
        search_span_range,
        unordered_span_states,
    )

    rd = IndexReader(spark, index_dir)
    if rd.analyzer != "standard":
        raise NotImplementedError(
            "highlighting on a non-standard-analyzed index is not supported:"
            " snippet offsets are raw-token based, but the hits match"
            f" {rd.analyzer!r}-chain terms"
        )
    if end is not None or start > 0:
        hits = search_span_range(
            spark, index_dir, query, start=start, end=end, slop=slop, k=k,
            in_order=in_order, filter_cond=filter_cond, reader=rd,
            float32=float32, exclude=exclude, pre=span_pre, post=span_post,
        ).collect()
    else:
        hits = search_span_near(
            spark, index_dir, query, slop=slop, k=k, in_order=in_order,
            filter_cond=filter_cond, reader=rd, float32=float32,
            exclude=exclude, pre=span_pre, post=span_post,
        ).collect()
    if not hits:
        return spark.createDataFrame([], HIGHLIGHT_SCHEMA)
    clause_sets = [frozenset(c) for c in _parse_clauses(rd, query)]
    excl_set = frozenset(rd.analyze(exclude)) if exclude else frozenset()

    import numpy as np

    def matched_of(toks: list[str]) -> set[int]:
        pos = [
            np.array(
                [i for i, t in enumerate(toks) if t in cs], dtype=np.int64
            )
            for cs in clause_sets
        ]
        excl = np.array(
            [i for i, t in enumerate(toks) if t in excl_set], dtype=np.int64
        )
        kw = dict(
            max_end=end, excl=excl, pre=span_pre, post=span_post,
            min_start=start if start > 0 else None,
        )
        if len(clause_sets) == 1:
            # width-0 term/or spans: each surviving position is its own match
            chains = ordered_span_chains(pos, 0, **kw)
        elif in_order:
            chains = ordered_span_chains(pos, slop, **kw)
        else:
            chains = unordered_span_states(pos, slop, **kw)
        return {p for c in chains for p in c}

    hits_df = spark.createDataFrame(
        [(r["doc_id"], float(r["score"]), r["conv_id"], r["turn_idx"])
         for r in hits],
        "doc_id long, score double, conv_id string, turn_idx int",
    )
    convs = sorted({r["conv_id"] for r in hits})
    src = (
        corpus.where(F.col("conv_id").isin(convs))
        .select("conv_id", "turn_idx", text_col)
    )
    joined = src.join(F.broadcast(hits_df), ["conv_id", "turn_idx"])
    out = joined.mapInPandas(
        _make_snippet_kernel(matched_of, window_size, lead, pre, post, text_col),
        HIGHLIGHT_SCHEMA,
    )
    return out.orderBy(F.desc("score"), F.asc("doc_id"))
