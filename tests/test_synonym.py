"""SynonymQuery analog (query.search_synonym).

Lucene SynonymQuery [Lucene-10.2.0, via the reference's pom.xml:42-43 — the
rewrite target of analysis-time synonym expansion] scores a term SET as one
pseudo-term: within-doc freq is the SUM of the members' freqs, idf comes
from the MAX member docFreq, and exactly one BM25 saturation runs over the
blended freq. That is observably different from a BooleanQuery OR of the
same terms (sum of per-term saturations), which is what these tests pin.
"""

import numpy as np
import pytest

from cuvs_lucene_spark.oracle import (
    oracle_search,
    oracle_synonym_search,
)
from cuvs_lucene_spark.query import search_synonym


def _rows(df):
    return [(int(r.doc_id), float(r.score)) for r in df.collect()]


@pytest.fixture(scope="module")
def syn_terms(oracle_tiny):
    """Two mid-frequency terms that co-occur in at least one doc (so the
    blend-before-saturation distinction is observable)."""
    post = oracle_tiny.postings
    by_df = sorted(post, key=lambda t: (-len(post[t][0]), t))
    for i, a in enumerate(by_df[:40]):
        for b in by_df[i + 1 : 40]:
            if np.intersect1d(post[a][0], post[b][0]).size > 0:
                return [a, b]
    pytest.skip("no co-occurring term pair in tiny corpus")


class TestSynonym:
    def test_matches_oracle_exact(self, spark, tiny_index, oracle_tiny, syn_terms):
        got = _rows(
            search_synonym(spark, tiny_index, syn_terms, k=15, float32=False)
        )
        exp = oracle_synonym_search(oracle_tiny, syn_terms, k=15)
        assert [d for d, _ in got] == [d for d, _ in exp]
        for (_, gs), (_, es) in zip(got, exp):
            assert gs == pytest.approx(es, abs=1e-9)

    def test_differs_from_boolean_or(self, oracle_tiny, syn_terms):
        # on a doc containing BOTH terms, OR sums two saturations while
        # SynonymQuery saturates the summed tf — strictly smaller for docs
        # with both terms (concavity), unless idfs differ enough to mask it.
        syn = dict(oracle_synonym_search(oracle_tiny, syn_terms, k=10_000))
        both = set(
            np.intersect1d(
                oracle_tiny.postings[syn_terms[0]][0],
                oracle_tiny.postings[syn_terms[1]][0],
            ).tolist()
        )
        doc = int(oracle_tiny.doc_ids[sorted(both)[0]])
        or_scores = dict(
            oracle_search(oracle_tiny, " ".join(syn_terms), k=10_000)
        )
        assert doc in syn and doc in or_scores
        assert syn[doc] != pytest.approx(or_scores[doc], abs=1e-7)

    def test_single_and_absent_members(self, spark, tiny_index, oracle_tiny, syn_terms):
        t = syn_terms[0]
        # unknown member is ignored (df=0 never wins the max, contributes
        # no postings); an all-unknown set returns empty
        with_ghost = _rows(
            search_synonym(
                spark, tiny_index, [t, "zzzznotaterm"], k=5, float32=False
            )
        )
        alone = _rows(search_synonym(spark, tiny_index, [t], k=5, float32=False))
        assert with_ghost == alone
        assert (
            search_synonym(spark, tiny_index, ["zzzznotaterm"], k=5).count() == 0
        )

    def test_filter_composes(self, spark, tiny_index, oracle_tiny, syn_terms):
        from pyspark.sql import functions as F

        got = search_synonym(
            spark, tiny_index, syn_terms, k=8, float32=False,
            filter_cond=F.col("role") == "user",
        )
        meta = oracle_tiny.meta
        accept = (meta["role"] == "user").to_numpy()
        # oracle twin with an accept mask: recompute over accepted docs only
        exp_all = oracle_synonym_search(oracle_tiny, syn_terms, k=10_000)
        acc_ids = set(meta.loc[accept, "doc_id"].tolist())
        exp = [(d, s) for d, s in exp_all if d in acc_ids][:8]
        assert [d for d, _ in _rows(got)] == [d for d, _ in exp]
