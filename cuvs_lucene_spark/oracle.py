"""Pure numpy/pandas Lucene-BM25 oracle (the correctness gate).

Analog of the reference's exact-scoring oracle
(``TestCuVSRandomizedVectorSearch.java:154-183`` computes exhaustive exact
results in pure Java and bounds the engine against them). BM25 is
deterministic, so unlike the reference's ANN ±tolerance we demand exact rank
identity and <1e-5 score agreement (SURVEY.md §5.2).

Semantics replicated (SURVEY.md §4.3):
  * tokenizer contract from analysis.tokenize_py
  * doc length quantized with SmallFloat intToByte4, scored with the
    DEQUANTIZED length
  * N (docCount) and avgdl are INDEX-WIDE (IndexSearcher-level), computed
    over docs with >= 1 token
  * per-term scores in float32, summed in float64, final cast to float32
    (DisjunctionSumScorer float-summation shape)
  * tie-break: equal scores order by ascending doc_id
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from cuvs_lucene_spark.analysis import (
    BM25_B,
    BM25_K1,
    analyze_py,
    LMD_MU,
    LMJM_LAMBDA,
    dequantize_dl_np,
    quantize_dl_np,
    tokenize_py,
)


@dataclass
class OracleIndex:
    doc_ids: np.ndarray                 # int64, sorted — stable (conv_id, turn_idx) order
    dl_d: np.ndarray                    # dequantized doc lengths, aligned with doc_ids
    postings: dict[str, tuple[np.ndarray, np.ndarray]]  # term -> (doc_idx, tf)
    n_docs: int = 0
    avgdl: float = 0.0
    meta: pd.DataFrame = field(default=None, repr=False)  # doc_id, conv_id, turn_idx, role, ts
    sum_dl: int = 0                     # sumTotalTermFreq (true lengths) — LM Dirichlet p_c
    analyzer: str = "standard"          # analysis chain; queries reuse it


def build_oracle_index(pdf: pd.DataFrame, analyzer: str = "standard") -> OracleIndex:
    """pdf: transcripts with columns conv_id, turn_idx, role, text, tool, ts.

    doc_id = row_number over (conv_id, turn_idx) ascending, 0-based — the
    per-row invariant ordering from BASELINE.json.input_hint. ``analyzer``
    selects the analysis chain (analysis.analyze_py twin of the engine's
    pinned chain); queries against this index are analyzed with the same
    chain, exactly like IndexReader reuses the build's analyzer.
    """
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    doc_ids = np.arange(len(pdf), dtype=np.int64)

    tokens = [analyze_py(t, analyzer) for t in pdf["text"]]
    dl = np.array([len(t) for t in tokens], dtype=np.int64)
    dl_d = dequantize_dl_np(quantize_dl_np(dl))

    has_tokens = dl > 0
    n_docs = int(has_tokens.sum())
    sum_dl = int(dl[has_tokens].sum())  # sumTotalTermFreq uses TRUE lengths
    avgdl = sum_dl / n_docs if n_docs else 0.0

    postings: dict[str, list[list[int]]] = {}
    for i, toks in enumerate(tokens):
        if not toks:
            continue
        for term, tf in Counter(toks).items():
            postings.setdefault(term, [[], []])
            postings[term][0].append(i)
            postings[term][1].append(tf)
    packed = {
        t: (np.array(d, dtype=np.int64), np.array(f, dtype=np.int64))
        for t, (d, f) in postings.items()
    }
    meta = pdf[["conv_id", "turn_idx", "role", "ts"]].copy()
    meta.insert(0, "doc_id", doc_ids)
    return OracleIndex(
        doc_ids, dl_d, packed, n_docs, avgdl, meta, sum_dl=sum_dl,
        analyzer=analyzer,
    )


def oracle_idf(idx: OracleIndex, term: str) -> float:
    df = len(idx.postings.get(term, ((), ()))[0])
    if df == 0:
        return 0.0
    return float(np.log(1.0 + (idx.n_docs - df + 0.5) / (df + 0.5)))


def oracle_term_weight(idx: OracleIndex, term: str, similarity: str) -> float:
    """Similarity-parametrized term weight (engine twin of
    IndexReader.term_weight): bm25 idf, or classic idf'² with
    idf' = 1 + ln((N+1)/(df+1))."""
    if similarity == "bm25":
        return oracle_idf(idx, term)
    df = len(idx.postings.get(term, ((), ()))[0])
    if df == 0:
        return 0.0
    i = 1.0 + float(np.log((idx.n_docs + 1) / (df + 1)))
    return i * i


def oracle_search(
    idx: OracleIndex,
    query: str,
    k: int = 10,
    mode: str = "or",
    accept: np.ndarray | None = None,
    exclude: str | None = None,
    msm: int | None = None,
    similarity: str = "bm25",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> list[tuple[int, float]]:
    """Top-k (doc_id, score) with Lucene float semantics.

    accept: optional boolean mask over doc index positions (pre-filter,
    the analog of Bits acceptDocs — ``CuVS2510GPUVectorsReader.java:313``).
    mode='and' keeps only docs matching ALL distinct query terms.
    exclude: terms whose presence disqualifies a doc (BooleanQuery MUST_NOT).
    msm: minimum distinct matching terms for mode='or' (minimum_should_match).
    """
    q_terms = analyze_py(query, idx.analyzer)
    if k <= 0 or not q_terms or idx.n_docs == 0:
        return []
    # duplicate query terms each contribute a scorer occurrence (Lucene
    # BooleanQuery SHOULD-clause semantics): weight = occurrence count
    weights = Counter(q_terms)
    distinct = list(weights)

    acc = np.zeros(len(idx.doc_ids), dtype=np.float64)
    matched = np.zeros(len(idx.doc_ids), dtype=np.int32)
    # sorted-term accumulation order — the engine's _finish sums per-doc
    # scores in sorted(present) order, and float64 addition order must match
    # exactly or last-ULP noise splits exact ties at the k boundary
    for term in sorted(distinct):
        if term not in idx.postings:
            continue
        d, tf = idx.postings[term]
        dl32 = idx.dl_d[d].astype(np.float32)
        tf32 = tf.astype(np.float32)
        if similarity in ("lmd", "lmjm"):
            # LM-Similarity twins of make_score_kernel's lmd/lmjm branches:
            # same float32 per-term arithmetic, same p_c, same ≥0 clamp
            pc = np.float32(
                (int(tf.sum()) + 1.0) / (idx.sum_dl + 1.0)
            )
            if similarity == "lmd":
                mu = np.float32(LMD_MU)
                s = np.log1p(tf32 / (mu * pc)) + np.log(mu / (dl32 + mu))
                s = np.maximum(s, np.float32(0.0)).astype(np.float32)
            else:
                lam = np.float32(LMJM_LAMBDA)
                s = np.log1p(
                    ((np.float32(1.0) - lam) * tf32 / dl32) / (lam * pc)
                ).astype(np.float32)
            acc[d] += s.astype(np.float64) * weights[term]
            matched[d] += 1
            continue
        idf = np.float32(oracle_term_weight(idx, term, similarity))
        if similarity == "classic":
            s = (idf * np.sqrt(tf32) / np.sqrt(dl32)).astype(np.float32)
        else:
            kf = np.float32(k1) * (
                np.float32(1.0 - b)
                + np.float32(b) * dl32 / np.float32(idx.avgdl)
            )
            s = (idf * tf32 / (tf32 + kf)).astype(np.float32)
        acc[d] += s.astype(np.float64) * weights[term]
        matched[d] += 1
    n_present = sum(1 for t in distinct if t in idx.postings)
    if mode == "and":
        if n_present < len(distinct):
            return []
        hit = matched == len(distinct)
    elif msm is not None and msm > 1:
        hit = matched >= msm
    else:
        hit = matched > 0
    if exclude:
        for term in set(analyze_py(exclude, idx.analyzer)):
            if term in idx.postings:
                hit = hit.copy()
                hit[idx.postings[term][0]] = False
    if accept is not None:
        hit = hit & accept
    cand = np.flatnonzero(hit)
    if len(cand) == 0:
        return []
    scores = acc[cand].astype(np.float32)
    order = np.lexsort((idx.doc_ids[cand], -scores))[: min(k, len(cand))]
    return [(int(idx.doc_ids[cand[i]]), float(scores[i])) for i in order]


def oracle_synonym_search(
    idx: OracleIndex, terms: list[str], k: int = 10
) -> list[tuple[int, float]]:
    """SynonymQuery twin of query.search_synonym (float64 path):
    per-doc freq = Σ tf over the synonym set (exact integer sum), idf from
    the MAX member docFreq (Lucene SynonymQuery merged collection stats:
    docFreq = max, so two rare synonyms never double-idf), ONE BM25
    saturation over the blended freq."""
    present = [t for t in sorted(set(terms)) if t in idx.postings]
    if k <= 0 or not present or idx.n_docs == 0:
        return []
    df_max = max(len(idx.postings[t][0]) for t in present)
    idf = float(np.log(1.0 + (idx.n_docs - df_max + 0.5) / (df_max + 0.5)))
    tf_sum = np.zeros(len(idx.doc_ids), dtype=np.int64)
    for t in present:
        d, tf = idx.postings[t]
        tf_sum[d] += tf
    cand = np.flatnonzero(tf_sum > 0)
    if len(cand) == 0:
        return []
    tf64 = tf_sum[cand].astype(np.float64)
    kf = BM25_K1 * (1.0 - BM25_B + BM25_B * idx.dl_d[cand].astype(np.float64) / idx.avgdl)
    scores = idf * tf64 / (tf64 + kf)
    order = np.lexsort((idx.doc_ids[cand], -scores))[: min(k, len(cand))]
    return [(int(idx.doc_ids[cand[i]]), float(scores[i])) for i in order]
