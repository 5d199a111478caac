"""Ordered span-near queries — the Lucene ``SpanNearQuery(inOrder=true)``
analog over the positional postings payload.

Semantics implemented (the published NearSpansOrdered enumeration for
single-term clauses [Lucene 10.2.0 ``queries`` module — the span surface
sits beside the codec API the reference plugs into via its Lucene
dependency, ``pom.xml:42-43``]):

- clause terms must appear in the GIVEN order, each strictly after the
  previous one (next start >= previous end; terms occupy one position, so
  positions are strictly increasing),
- one candidate match per position of the FIRST clause: each later clause
  stretches to its MINIMAL position past the previous clause's end,
- the match width is the sum of the gaps between consecutive matched
  positions; a candidate matches iff width <= slop,
- scoring is Lucene's SpanScorer shape: the span behaves as a pseudo-term
  with float frequency ``pf = Σ_matches sloppyFreq(width)`` where
  ``sloppyFreq(d) = 1/(1+d)`` (BM25Similarity.SimScorer), idf = SUM of the
  clause terms' idfs, and the document's usual BM25 length norm:
      score = Σ idf(t_i) · pf / (pf + k1·(1-b+b·dl/avgdl))

Unordered span-near (``in_order=False``) is the published
NearSpansUnordered enumeration — and it is NOT the sloppy PhraseQuery:
the two surfaces enumerate different match sets and weight them
differently (SloppyPhraseMatcher minimizes a matchLength per completed
window and weights 1/(1+matchLength); NearSpansUnordered checks every
state of a merge walk over the clause position lists and weights
1/(1+spanWidth)). Semantics implemented:

- state = one current position per clause, all starting at their first
  occurrence; the walk repeatedly advances the clause holding the MINIMUM
  current position, stopping when that clause is exhausted,
- every visited state is checked once: with single-position term clauses
  the candidate interval is [min, max+1), and it matches iff
  ``(max+1) - min - n <= slop`` (Lucene's
  ``maxEnd - minStart - totalSpanLength <= allowedSlop``),
- each matching state contributes ``sloppyFreq(width)`` with
  ``width = max - min`` (NearSpansUnordered.width() is
  maxEndPositionCell.start - minPositionCell.start), and scoring is the
  same pseudo-term BM25 as the ordered case.

SpanNear with repeated clause terms is rejected loudly in both modes
(Lucene routes repeats through dedicated machinery; silent wrong answers
are worse than a ValueError).

Plan shape at scale (identical to the two-phase sloppy phrase — Lucene's
own approximation pattern): postings scan #1 WITHOUT the position payload →
docs containing every clause term (the conjunction approximation); only
those docs' occurrence rows are repartitioned and swept per-doc in an
Arrow-batched kernel; the driver only ever collects the final top-k.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.query import (
    BM25_B,
    BM25_K1,
    PHRASE_OCC_SCHEMA,
    SLOPPY_PF_SCHEMA,
    IndexReader,
    _accepted_doc_ids,
    make_phrase_occ_kernel,
    make_sloppy_sweep_kernel,
)


def ordered_span_pf(pos_by_slot: list[np.ndarray], slop: int) -> float:
    """NearSpansOrdered float frequency from per-clause sorted RAW position
    arrays: one candidate per first-clause position, minimal stretch of each
    later clause, ``Σ 1/(1+width)`` over candidates with width <= slop.

    Vectorized across all first-clause positions at once (np.searchsorted
    per later clause), so a doc with f occurrences of the first term costs
    O(n·f·log) regardless of how many candidates complete."""
    first = np.asarray(pos_by_slot[0], dtype=np.int64)
    if not len(first):
        return 0.0
    prev_end = first + 1
    width = np.zeros(len(first), dtype=np.int64)
    alive = np.ones(len(first), dtype=bool)
    for raw in pos_by_slot[1:]:
        arr = np.asarray(raw, dtype=np.int64)
        if not len(arr):
            return 0.0
        j = np.searchsorted(arr, prev_end, side="left")
        ok = j < len(arr)
        alive &= ok
        j = np.minimum(j, len(arr) - 1)
        q = arr[j]
        width = width + (q - prev_end)  # garbage where ~alive; masked below
        prev_end = q + 1
    m = alive & (width <= slop)
    if not m.any():
        return 0.0
    return float(np.sum(1.0 / (1.0 + width[m].astype(np.float64))))


def unordered_span_pf(pos_by_slot: list[np.ndarray], slop: int) -> float:
    """NearSpansUnordered float frequency from per-clause sorted RAW
    position arrays: the merge walk over the clause lists, one match check
    per visited state, ``Σ 1/(1+(max-min))`` over states with
    ``max - min - (n-1) <= slop``.

    n=2 is fully vectorized via the walk's order-theoretic twin: with all
    positions distinct (one term per position), the walk visits state
    (i, j) iff every consumed position precedes every current one —
    ``A[i-1] < B[j] and B[j-1] < A[i]`` — which two np.searchsorted calls
    enumerate without stepping. n>=3 runs the walk directly (clause counts
    are tiny; docs are independent and swept in parallel upstream)."""
    n = len(pos_by_slot)
    lists = [np.asarray(a, dtype=np.int64) for a in pos_by_slot]
    if any(len(a) == 0 for a in lists):
        return 0.0
    if n == 2:
        a, b = lists
        lo = np.searchsorted(a, np.concatenate(([-1], b[:-1])), side="right")
        hi = np.minimum(np.searchsorted(a, b, side="left"), len(a) - 1)
        counts = hi - lo + 1
        valid = counts > 0
        if not valid.any():
            return 0.0
        cnt = counts[valid]
        j_idx = np.repeat(np.flatnonzero(valid), cnt)
        offs = np.concatenate(([0], np.cumsum(cnt)))[:-1]
        i_idx = (
            np.arange(int(cnt.sum())) - np.repeat(offs, cnt)
            + np.repeat(lo[valid], cnt)
        )
        w = np.abs(a[i_idx] - b[j_idx])
        m = (w - 1) <= slop
        if not m.any():
            return 0.0
        return float(np.sum(1.0 / (1.0 + w[m].astype(np.float64))))
    ptr = [0] * n
    heads = [int(a[0]) for a in lists]
    total = 0.0
    while True:
        mn = min(heads)
        mx = max(heads)
        if mx - mn - (n - 1) <= slop:
            total += 1.0 / (1.0 + (mx - mn))
        i = heads.index(mn)
        ptr[i] += 1
        if ptr[i] >= len(lists[i]):
            return total
        heads[i] = int(lists[i][ptr[i]])


def _adjusted_ordered_pf(slop: int):
    """Adapter for make_sloppy_sweep_kernel's freq_of contract: the occ
    kernel ships ADJUSTED positions (adj = pos - slot index), so slot i's
    raw positions are adj + i. Adjusted arrays are sorted ⇒ raw arrays are
    sorted (per-slot constant shift)."""

    def pf(pos_by_slot: list[np.ndarray], s: int) -> float:
        raw = [np.asarray(a, dtype=np.int64) + i for i, a in enumerate(pos_by_slot)]
        return ordered_span_pf(raw, slop)

    return pf


def _adjusted_unordered_pf(slop: int):
    """Same adjusted→raw adapter for the unordered walk."""

    def pf(pos_by_slot: list[np.ndarray], s: int) -> float:
        raw = [np.asarray(a, dtype=np.int64) + i for i, a in enumerate(pos_by_slot)]
        return unordered_span_pf(raw, slop)

    return pf


def span_near_doc_scores(
    spark: SparkSession,
    rd: IndexReader,
    terms: list[str],
    fld: str,
    slop: int,
    del_ids: DataFrame | None = None,
    filter_cond: Column | str | None = None,
    in_order: bool = True,
) -> DataFrame | None:
    """Per-doc float64 span-near BM25 scores (doc_id, score_d), matching
    docs only; None when a clause term is absent (the span provably matches
    nothing). Mirrors query.phrase_doc_scores' two-phase sloppy plan with
    the NearSpansOrdered (or, for in_order=False, NearSpansUnordered)
    frequency swapped into the sweep kernel."""
    n = len(terms)
    if n < 2:
        raise ValueError("span_near needs >= 2 clause terms")
    if len(set(terms)) != n:
        raise ValueError(
            "span_near with repeated clause terms is not supported "
            "(Lucene's repeats machinery; rephrase or use sloppy phrase)"
        )
    if not all(s.get("positions", False) for s in rd.manifest["segments"]):
        raise ValueError(
            "span search requires an index built with positions=True"
        )
    f_docs, _f_sdl, f_avgdl = rd.field_stats_of(fld)
    if f_docs == 0:
        return None
    stats = rd.term_stats(terms, fld)
    if any(stats.get(t, (0, 0))[0] == 0 for t in terms):
        return None
    idf_sum = float(sum(rd.idf(stats[t][0], f_docs) for t in terms))

    postings = rd.cat.read_postings(spark).where(
        F.col("bucket").isin(sorted({stats[t][1] for t in terms}))
        & (F.col("field") == fld)
        & F.col("term").isin(terms)
    )
    occ = postings.mapInPandas(
        make_phrase_occ_kernel(
            {t: [i] for i, t in enumerate(terms)}, keep_negative_adj=True
        ),
        PHRASE_OCC_SCHEMA,
    )
    if del_ids is not None:
        occ = occ.join(F.broadcast(del_ids), "doc_id", "left_anti")
    if filter_cond is not None:
        occ = occ.join(_accepted_doc_ids(rd, filter_cond), "doc_id", "left_semi")

    # phase 1 — the conjunction approximation, positions never decoded
    from cuvs_lucene_spark.operators.merge import decode_postings

    cand = (
        decode_postings(postings)
        .select("doc_id", "term")
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("_nt"))
        .where(F.col("_nt") == F.lit(n))
        .select("doc_id")
    )
    pf = (
        occ.join(cand, "doc_id", "left_semi")
        .repartition("doc_id")
        .sortWithinPartitions("doc_id")
        .mapInPandas(
            make_sloppy_sweep_kernel(
                n,
                slop,
                freq_of=(
                    _adjusted_ordered_pf(slop)
                    if in_order
                    else _adjusted_unordered_pf(slop)
                ),
            ),
            SLOPPY_PF_SCHEMA,
        )
    )
    kf = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl_d") / F.lit(f_avgdl)
    )
    return pf.select(
        "doc_id",
        (F.lit(idf_sum) * F.col("pf").cast("double")
         / (F.col("pf").cast("double") + kf)).alias("score_d"),
    )


def search_span_near(
    spark: SparkSession,
    index_dir: str,
    query: str,
    slop: int = 0,
    k: int = 10,
    in_order: bool = True,
    filter_cond: Column | str | None = None,
    reader: IndexReader | None = None,
    float32: bool = True,
    field: str | None = None,
) -> DataFrame:
    """Top-k span-near BM25 search. in_order=True (default): the analyzed
    terms of ``query`` must occur in the given order within ``slop`` total
    gap positions (NearSpansOrdered). in_order=False: the terms may occur
    in ANY order within the slop window (NearSpansUnordered — a genuinely
    different surface from the sloppy PhraseQuery: different match
    enumeration AND a different per-match weight, see module docstring).
    Returns (doc_id, score, conv_id, turn_idx); composes with filter_cond
    and tombstones like every other search surface."""
    if slop < 0:
        raise ValueError("slop must be >= 0")
    rd = reader or IndexReader(spark, index_dir)
    out_t = "float" if float32 else "double"
    empty = spark.createDataFrame(
        [], f"doc_id long, score {out_t}, conv_id string, turn_idx int"
    )
    terms = rd.analyze(query)
    if k <= 0 or not terms or not rd.manifest["segments"]:
        return empty
    if len(terms) == 1:
        # SpanNear of one clause degenerates to the clause itself; a single
        # term's span frequency is its tf (every occurrence matches with
        # width 0), which is exactly the pseudo-term phrase score.
        from cuvs_lucene_spark.query import search_phrase

        return search_phrase(
            spark, index_dir, query, k=k, filter_cond=filter_cond,
            reader=rd, float32=float32, field=field,
        )
    fld = rd.resolve_field(field)
    f_docs, _f_sdl, _f_avgdl = rd.field_stats_of(fld)
    if f_docs == 0:
        return empty
    k = min(k, f_docs)

    from cuvs_lucene_spark.operators.deletes import deleted_doc_ids

    scored = span_near_doc_scores(
        spark, rd, terms, fld, slop,
        del_ids=deleted_doc_ids(spark, index_dir), filter_cond=filter_cond,
        in_order=in_order,
    )
    if scored is None:
        return empty
    topk = (
        scored.select("doc_id", F.col("score_d").cast(out_t).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    dd = rd.cat.read_doc_dim(spark).select("doc_id", "conv_id", "turn_idx")
    return (
        F.broadcast(topk)
        .join(dd, "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
