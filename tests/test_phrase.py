"""Exact-phrase search over positional postings (SURVEY §2 L7).

Engine vs a self-contained pandas oracle implementing Lucene PhraseQuery
(slop=0) semantics: pf = number of exact phrase occurrences, idf summed per
slot, the doc's usual dl norm. Also pins: positions survive compaction,
and a positions-less index refuses phrase queries loudly.
"""

import math

import numpy as np
import pytest

from cuvs_lucene_spark.analysis import (
    dequantize_dl_np,
    quantize_dl_np,
    tokenize_py,
)
from cuvs_lucene_spark.operators.build import build_index
from cuvs_lucene_spark.operators.merge import compact
from cuvs_lucene_spark.query import search_phrase

K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def pos_index(spark, tiny_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "pos")
    build_index(
        spark, tiny_df, d, buckets=8, salt_buckets=4, hot_df_ratio=0.10,
        positions=True,
    )
    return d


@pytest.fixture(scope="module")
def corpus_toks(tiny_pdf):
    """[(conv_id, turn_idx, tokens)] in global docID order."""
    pdf = tiny_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    return [
        (r.conv_id, int(r.turn_idx), tokenize_py(r.text))
        for r in pdf.itertuples()
    ]


def oracle_phrase(corpus_toks, phrase: str, k: int):
    """[(conv_id, turn_idx, score)] top-k, score desc / docID asc."""
    slots = tokenize_py(phrase)
    if not slots:
        return []
    docs_with_dl = [(c, t, toks, len(toks)) for c, t, toks in corpus_toks]
    n_docs = sum(1 for *_, dl in docs_with_dl if dl > 0)
    avgdl = sum(dl for *_, dl in docs_with_dl) / n_docs
    df = {
        s: sum(1 for *_, toks, _ in docs_with_dl if s in set(toks))
        for s in set(slots)
    }
    if any(df[s] == 0 for s in set(slots)):
        return []
    idf_sum = sum(
        math.log(1.0 + (n_docs - df[s] + 0.5) / (df[s] + 0.5)) for s in slots
    )
    scored = []
    for doc_id, (c, t, toks, dl) in enumerate(docs_with_dl):
        pf = sum(
            1
            for i in range(len(toks) - len(slots) + 1)
            if toks[i : i + len(slots)] == slots
        )
        if pf:
            # the engine norms by the SmallFloat-quantized dl (L4), not raw dl
            dl_d = float(
                dequantize_dl_np(quantize_dl_np(np.array([dl], dtype=np.int64)))[0]
            )
            score = idf_sum * pf / (pf + K1 * (1 - B + B * dl_d / avgdl))
            scored.append((doc_id, c, t, score))
    scored.sort(key=lambda r: (-r[3], r[0]))
    return [(c, t, s) for _, c, t, s in scored[:k]]


def find_phrases(corpus_toks):
    """A few bigrams/trigrams that actually occur, incl. a repeated-term one."""
    from collections import Counter

    big = Counter()
    tri = Counter()
    for _, _, toks in corpus_toks:
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            tri[(a, b, c)] += 1
    picks = []
    # a mid-frequency bigram, the hottest bigram, a repeated-term trigram
    mids = [p for p, n in big.items() if 3 <= n <= 30]
    picks.append(" ".join(mids[0]))
    picks.append(" ".join(big.most_common(1)[0][0]))
    rep = next((p for p, n in tri.items() if len(set(p)) < 3 and n >= 2), None)
    if rep:
        picks.append(" ".join(rep))
    return picks


class TestPhraseOracle:
    def test_topk_matches_pandas_oracle(self, spark, pos_index, corpus_toks):
        for phrase in find_phrases(corpus_toks):
            exp = oracle_phrase(corpus_toks, phrase, 10)
            got = [
                (r["conv_id"], r["turn_idx"], float(r["score"]))
                for r in search_phrase(
                    spark, pos_index, phrase, k=10, float32=False
                ).collect()
            ]
            assert [(c, t) for c, t, _ in got] == [(c, t) for c, t, _ in exp], phrase
            for (_, _, g), (_, _, e) in zip(got, exp):
                assert g == pytest.approx(e, rel=1e-9), phrase

    def test_absent_adjacency_returns_empty(self, spark, pos_index, corpus_toks):
        # both terms exist somewhere, but never adjacent in this order
        vocab = sorted({t for _, _, toks in corpus_toks for t in toks})
        bigrams = {
            (a, b) for _, _, toks in corpus_toks for a, b in zip(toks, toks[1:])
        }
        pair = next(
            (a, b)
            for a in vocab[:20]
            for b in vocab[-20:]
            if (a, b) not in bigrams
        )
        assert search_phrase(spark, pos_index, " ".join(pair), k=5).count() == 0

    def test_degenerate(self, spark, pos_index):
        assert search_phrase(spark, pos_index, "zzzqqq xyzzy", k=5).count() == 0
        assert search_phrase(spark, pos_index, "", k=5).count() == 0
        assert search_phrase(spark, pos_index, "world school", k=0).count() == 0

    def test_single_term_phrase_matches_oracle(
        self, spark, pos_index, corpus_toks
    ):
        exp = oracle_phrase(corpus_toks, "world", 10)
        got = [
            (r["conv_id"], r["turn_idx"])
            for r in search_phrase(
                spark, pos_index, "world", k=10, float32=False
            ).collect()
        ]
        assert got == [(c, t) for c, t, _ in exp]


class TestPhraseLifecycle:
    def test_positions_survive_compaction(
        self, spark, tiny_df, corpus_toks, tmp_path_factory
    ):
        from pyspark.sql import functions as F

        from cuvs_lucene_spark.operators.build import build_segment

        d = str(tmp_path_factory.mktemp("idx") / "pos2seg")
        cut = "conv-00000100"
        build_segment(
            spark, tiny_df.where(F.col("conv_id") < cut), d, 0,
            buckets=8, salt_buckets=4, hot_df_ratio=0.10, positions=True,
        )
        build_segment(
            spark, tiny_df.where(F.col("conv_id") >= cut), d, 1,
            buckets=8, salt_buckets=4, hot_df_ratio=0.10, positions=True,
        )
        phrase = find_phrases(corpus_toks)[0]
        before = [
            (r["conv_id"], r["turn_idx"], round(float(r["score"]), 6))
            for r in search_phrase(spark, d, phrase, k=10).collect()
        ]
        assert before  # the picked phrase occurs
        compact(spark, d)
        after = [
            (r["conv_id"], r["turn_idx"], round(float(r["score"]), 6))
            for r in search_phrase(spark, d, phrase, k=10).collect()
        ]
        assert after == before

    def test_positionless_index_refuses(self, spark, tiny_index):
        with pytest.raises(ValueError, match="positions=True"):
            search_phrase(spark, tiny_index, "world school", k=5)
