"""MultiTermQuery family (prefix/wildcard/fuzzy/regexp) + nested BooleanQuery AST.

Expansion is pinned against a pure-Python enumeration of the corpus
vocabulary (startswith / fnmatch / DP Levenshtein — independent of the
engine's dictionary-scan predicates); the rewritten disjunction is pinned
against the numpy oracle (oracle_search over the same expanded terms), the
same rank-identity + 1e-5 score bar as the flat query suite. The boolean AST
is pinned against an independent numpy tree evaluator implementing the
documented Lucene BooleanWeight semantics.
"""

import fnmatch

import numpy as np
import pytest

from cuvs_lucene_spark.analysis import tokenize_py
from cuvs_lucene_spark.booleanq import Q, search_boolean
from cuvs_lucene_spark.multiterm import (
    TooManyClauses,
    expand_terms,
    search_multiterm,
)
from cuvs_lucene_spark.oracle import oracle_idf, oracle_search
from cuvs_lucene_spark.query import IndexReader


@pytest.fixture(scope="module")
def vocab(oracle_tiny):
    return sorted(oracle_tiny.postings)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestExpansion:
    def test_prefix_expansion_matches_vocab(self, spark, tiny_index, vocab):
        rd = IndexReader(spark, tiny_index)
        # NOT "w": the synthetic w##### vocabulary tail makes that prefix
        # trip the maxClauseCount cap (pinned in test_too_many_clauses)
        for p in ["th", "wo", "sch", "zzzz"]:
            exp = sorted(t for t in vocab if t.startswith(p))
            got = expand_terms(rd, prefix=p)
            assert got == exp, p

    def test_wildcard_expansion_matches_vocab(self, spark, tiny_index, vocab):
        rd = IndexReader(spark, tiny_index)
        for pat in ["w*k", "*ork", "s?y", "t*e*e"]:
            exp = sorted(t for t in vocab if fnmatch.fnmatchcase(t, pat))
            got = expand_terms(rd, wildcard=pat)
            assert got == exp, pat

    def test_fuzzy_expansion_matches_vocab(self, spark, tiny_index, vocab):
        rd = IndexReader(spark, tiny_index)
        for q, d in [("worl", 1), ("scool", 2), ("believ", 1)]:
            exp = sorted(t for t in vocab if _lev(q, t) <= d)
            got = expand_terms(rd, fuzzy=q, max_edits=d)
            assert got == exp, (q, d)

    def test_regexp_expansion_matches_vocab(self, spark, tiny_index, vocab):
        import re

        rd = IndexReader(spark, tiny_index)
        # anchored whole-term semantics (Lucene RegExp): Python fullmatch is
        # the independent enumeration
        for pat in ["s[a-z]*n", "w.rld?", "(work|world)s?", "t[eo]+l"]:
            exp = sorted(t for t in vocab if re.fullmatch(pat, t))
            got = expand_terms(rd, regexp=pat)
            assert got == exp, pat

    def test_term_range_expansion_matches_vocab(self, spark, tiny_index, vocab):
        rd = IndexReader(spark, tiny_index)
        cases = [
            (("sa", "so"), True, False),
            (("th", "tz"), True, True),
            ((None, "b"), True, False),
            (("sa", "sa"), True, True),  # single-point inclusive range
            (("sz", "sa"), True, True),  # inverted → empty
            (("sa", "sa"), True, False),  # empty half-open point
        ]
        for (lo, hi), inc_lo, inc_hi in cases:
            exp = sorted(
                t
                for t in vocab
                if (lo is None or (t >= lo if inc_lo else t > lo))
                and (hi is None or (t <= hi if inc_hi else t < hi))
            )
            got = expand_terms(
                rd,
                term_range=(lo, hi),
                include_lower=inc_lo,
                include_upper=inc_hi,
            )
            assert got == exp, (lo, hi, inc_lo, inc_hi)
        with pytest.raises(ValueError):
            expand_terms(rd, term_range=(None, None))

    def test_too_many_clauses(self, spark, tiny_index):
        rd = IndexReader(spark, tiny_index)
        with pytest.raises(TooManyClauses):
            expand_terms(rd, prefix="wo", max_expansions=2)
        # the default cap trips on the full synthetic w##### tail
        with pytest.raises(TooManyClauses):
            expand_terms(rd, prefix="w")

    def test_validation(self, spark, tiny_index):
        rd = IndexReader(spark, tiny_index)
        with pytest.raises(ValueError, match="exactly one"):
            expand_terms(rd, prefix="a", fuzzy="b")
        with pytest.raises(ValueError, match="exactly one"):
            expand_terms(rd)
        with pytest.raises(ValueError, match="one analyzer token"):
            expand_terms(rd, prefix="two words")
        with pytest.raises(ValueError, match="wildcard"):
            expand_terms(rd, wildcard="a%b")


class TestMultiTermSearch:
    @pytest.mark.parametrize(
        "kwargs",
        [
            {"prefix": "th"},
            {"prefix": "sch"},
            {"wildcard": "w*k"},
            {"wildcard": "*ork"},
            {"fuzzy": "worl", "max_edits": 1},
            {"fuzzy": "scool", "max_edits": 2},
            {"regexp": "s[a-z]*n"},
            {"regexp": "w.rld?"},
            {"term_range": ("sa", "so"), "include_upper": False},
            {"term_range": (None, "b"), "include_upper": False},
        ],
    )
    def test_matches_oracle_over_expansion(
        self, spark, tiny_index, oracle_tiny, vocab, kwargs
    ):
        # independent expansion → the numpy oracle scores the disjunction
        if "prefix" in kwargs:
            terms = [t for t in vocab if t.startswith(kwargs["prefix"])]
        elif "wildcard" in kwargs:
            terms = [t for t in vocab if fnmatch.fnmatchcase(t, kwargs["wildcard"])]
        elif "regexp" in kwargs:
            import re

            terms = [t for t in vocab if re.fullmatch(kwargs["regexp"], t)]
        elif "term_range" in kwargs:
            lo, hi = kwargs["term_range"]
            inc_lo = kwargs.get("include_lower", True)
            inc_hi = kwargs.get("include_upper", True)
            terms = [
                t
                for t in vocab
                if (lo is None or (t >= lo if inc_lo else t > lo))
                and (hi is None or (t <= hi if inc_hi else t < hi))
            ]
        else:
            terms = [
                t for t in vocab if _lev(kwargs["fuzzy"], t) <= kwargs["max_edits"]
            ]
        assert terms, kwargs  # the picked patterns must be non-degenerate
        exp = oracle_search(oracle_tiny, " ".join(sorted(terms)), k=10)
        got = [
            (r["doc_id"], r["score"])
            for r in search_multiterm(spark, tiny_index, k=10, **kwargs).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp], kwargs
        for (gd, gs), (_ed, es) in zip(got, exp):
            assert abs(gs - es) < 1e-5, (kwargs, gd)

    def test_absent_pattern_returns_empty(self, spark, tiny_index):
        assert search_multiterm(spark, tiny_index, prefix="zzzz").count() == 0


class TestMoreLikeThis:
    LIKE = (
        "the world of world data and the school student country help "
        "world school zzzznotaterm"
    )

    def _independent_selection(self, vocab, oracle, text, mqt, mtf, mdf):
        import re as _re

        toks = [t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t]
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        cands = []
        for t, c in tf.items():
            if c < mtf or t not in oracle.postings:
                continue
            df = len(oracle.postings[t][0])
            if df < mdf:
                continue
            cands.append((-c, df, t))
        cands.sort()
        return [t for _c, _d, t in cands[:mqt]]

    @pytest.mark.parametrize("mqt,mtf,mdf", [(5, 1, 2), (3, 2, 1), (25, 1, 1)])
    def test_mlt_matches_oracle_over_selection(
        self, spark, tiny_index, oracle_tiny, vocab, mqt, mtf, mdf
    ):
        from cuvs_lucene_spark.mlt import more_like_this, select_like_terms
        from cuvs_lucene_spark.query import IndexReader

        rd = IndexReader(spark, tiny_index)
        want_terms = self._independent_selection(
            vocab, oracle_tiny, self.LIKE, mqt, mtf, mdf
        )
        assert want_terms, (mqt, mtf, mdf)
        got_terms = select_like_terms(
            rd, self.LIKE, max_query_terms=mqt,
            min_term_freq=mtf, min_doc_freq=mdf,
        )
        assert got_terms == want_terms, (mqt, mtf, mdf)
        exp = oracle_search(oracle_tiny, " ".join(sorted(want_terms)), k=10)
        got = [
            (r["doc_id"], r["score"])
            for r in more_like_this(
                spark, tiny_index, self.LIKE, k=10, max_query_terms=mqt,
                min_term_freq=mtf, min_doc_freq=mdf,
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp]
        for (gd, gs), (_ed, es) in zip(got, exp):
            assert abs(gs - es) < 1e-5, gd

    def test_mlt_nothing_qualifies_returns_empty(self, spark, tiny_index):
        from cuvs_lucene_spark.mlt import more_like_this

        # every candidate below min_term_freq → empty result, no job planned
        assert (
            more_like_this(
                spark, tiny_index, "world school data", min_term_freq=5
            ).count()
            == 0
        )


def _eval_tree_numpy(q: Q, idx) -> list[tuple[int, float]]:
    """Independent evaluator: per-term float32 BM25 arrays (the oracle's
    arithmetic), tree walked with float64 adds in clause-list order."""
    from cuvs_lucene_spark.analysis import BM25_B, BM25_K1

    n = len(idx.doc_ids)

    def term_arrays(t: str):
        present = np.zeros(n, dtype=bool)
        score = np.zeros(n, dtype=np.float64)
        if t in idx.postings:
            d, tf = idx.postings[t]
            idf = np.float32(oracle_idf(idx, t))
            dl32 = idx.dl_d[d].astype(np.float32)
            tf32 = tf.astype(np.float32)
            kf = np.float32(BM25_K1) * (
                np.float32(1.0 - BM25_B)
                + np.float32(BM25_B) * dl32 / np.float32(idx.avgdl)
            )
            present[d] = True
            score[d] = (idf * tf32 / (tf32 + kf)).astype(np.float32).astype(np.float64)
        return present, score

    def walk(node: Q):
        if node.kind == "term":
            p, s = term_arrays(node.token)
            return p, node.boost * s
        if node.kind == "const":
            m, _s = walk(node.must[0])
            return m, np.full(n, node.boost, dtype=np.float64)
        musts = [walk(c) for c in node.must]
        shoulds = [walk(c) for c in node.should]
        nots = [walk(c)[0] for c in node.must_not]
        filts = [walk(c)[0] for c in node.filter]
        match = np.ones(n, dtype=bool)
        for m, _s in musts:
            match &= m
        for m in filts:
            match &= m
        for m in nots:
            match &= ~m
        need = node.msm if node.msm > 0 else (
            0 if (node.must or node.filter) else 1
        )
        if need > 0:
            n_sh = np.zeros(n, dtype=np.int32)
            for m, _s in shoulds:
                n_sh += m
            match &= n_sh >= need
        total = np.zeros(n, dtype=np.float64)
        for _m, s in musts:
            total = total + s
        for m, s in shoulds:
            total = total + np.where(m, s, 0.0)
        return match, node.boost * total

    match, total = walk(q)
    cand = np.flatnonzero(match)
    sc = total[cand].astype(np.float32)
    order = np.lexsort((idx.doc_ids[cand], -sc))
    return [(int(idx.doc_ids[cand[i]]), float(sc[i])) for i in order[:10]]


class TestBooleanAST:
    TREES = [
        # (A AND (B OR C^2)) NOT D — the verdict's canonical nested shape
        Q.boolean(
            must=[Q.term("the"), Q.boolean(should=[Q.term("work"), Q.term("world", boost=2.0)])],
            must_not=[Q.term("school")],
        ),
        # SHOULD-only with msm=2 and a boosted sub-boolean
        Q.boolean(
            should=[Q.term("time"), Q.term("people"), Q.boolean(should=[Q.term("year"), Q.term("good")], boost=0.5)],
            msm=2,
        ),
        # must + optional should scorers (Lucene default: should optional)
        Q.boolean(must=[Q.term("know")], should=[Q.term("take"), Q.term("way")]),
        # term with absent token inside a disjunction
        Q.boolean(should=[Q.term("zzzzabsent"), Q.term("think")]),
        # depth-3 nesting with boosts and msm at an inner level — the
        # compiler and both walkers are fully recursive, no depth cap
        Q.boolean(
            must=[
                Q.term("the"),
                Q.boolean(
                    should=[
                        Q.term("work"),
                        Q.boolean(
                            must=[Q.term("world"), Q.term("school")],
                            boost=2.0,
                        ),
                        Q.boolean(
                            should=[Q.term("time"), Q.term("people"),
                                    Q.term("year")],
                            msm=2, boost=0.5,
                        ),
                    ],
                ),
            ],
            must_not=[Q.boolean(should=[Q.term("country"), Q.term("help")])],
        ),
        # FILTER occur: required for matching, contributes nothing to the
        # score — scores must equal the should-only tree over filter-passing
        # docs
        Q.boolean(
            should=[Q.term("work"), Q.term("world", boost=2.0)],
            filter=[Q.term("the")],
        ),
        # filter-only node (Lucene wraps it in a constant-score of 0) with
        # a nested filter clause
        Q.boolean(filter=[Q.boolean(should=[Q.term("time"), Q.term("year")])]),
        # ConstantScoreQuery: matches where the child matches, scores the
        # boost — nested as a SHOULD scorer next to a live BM25 term
        Q.boolean(
            should=[
                Q.const(Q.boolean(must=[Q.term("world")]), boost=3.5),
                Q.term("people"),
            ],
        ),
        # const wrapping a disjunction, used as a MUST with should scorers
        Q.boolean(
            must=[Q.const(Q.boolean(should=[Q.term("the"), Q.term("know")]))],
            should=[Q.term("take")],
        ),
    ]

    @pytest.mark.parametrize("tree", TREES)
    def test_matches_numpy_evaluator(self, spark, tiny_index, oracle_tiny, tree):
        exp = _eval_tree_numpy(tree, oracle_tiny)
        got = [
            (r["doc_id"], r["score"])
            for r in search_boolean(spark, tiny_index, tree, k=10).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in exp]
        for (gd, gs), (_ed, es) in zip(got, exp):
            assert abs(gs - es) < 1e-5, (gd, gs, es)

    def test_flat_or_equals_search(self, spark, tiny_index):
        """A flat SHOULD tree must equal the plain OR surface exactly."""
        from cuvs_lucene_spark.query import search

        tree = Q.boolean(should=[Q.term("merge"), Q.term("people"), Q.term("time")])
        a = [
            (r["doc_id"], round(float(r["score"]), 6))
            for r in search_boolean(spark, tiny_index, tree, k=10).collect()
        ]
        b = [
            (r["doc_id"], round(float(r["score"]), 6))
            for r in search(spark, tiny_index, "merge people time", k=10).collect()
        ]
        assert a == b

    def test_validation(self):
        with pytest.raises(ValueError, match="SHOULD, MUST or FILTER"):
            Q.boolean(must_not=[Q.term("a")])
        with pytest.raises(TypeError):
            Q.const("a")
        with pytest.raises(ValueError, match="one analyzer token"):
            Q.term("two words")
        with pytest.raises(ValueError, match="msm"):
            Q.boolean(should=[Q.term("a")], msm=5)
        with pytest.raises(TypeError):
            Q.boolean(should=["a"])


class TestSuggest:
    """DirectSpellChecker analog: pinned against an independent
    brute-force dictionary scan over the oracle index."""

    def test_matches_bruteforce_comparator(self, spark, tiny_index, oracle_tiny):
        from cuvs_lucene_spark.multiterm import suggest_terms

        def lev(a: str, b: str) -> int:
            # independent DP implementation (vs Spark's builtin)
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        word, e, n = "scool", 2, 6
        cand = [
            (lev(t, word), -len(idx_posting[0]), t)
            for t, idx_posting in oracle_tiny.postings.items()
            if t != word and lev(t, word) <= e
        ]
        exp = [
            (t, d, -negdf) for d, negdf, t in sorted(cand)[:n]
        ]
        got = [
            (r["term"], r["distance"], r["df"])
            for r in suggest_terms(
                spark, tiny_index, word, max_edits=e, top_n=n
            ).collect()
        ]
        assert got == exp
        assert any(t == "school" for t, _, _ in got)

    def test_frequency_guard_and_guards(self, spark, tiny_index):
        import pytest

        from cuvs_lucene_spark.multiterm import suggest_terms

        # 'the' is the hottest term — treated as correctly spelled
        assert (
            suggest_terms(
                spark, tiny_index, "the", max_edits=1, max_query_df_ratio=0.01
            ).count()
            == 0
        )
        # but without the guard it still suggests neighbors
        assert (
            suggest_terms(spark, tiny_index, "the", max_edits=1).count() > 0
        )
        with pytest.raises(ValueError):
            suggest_terms(spark, tiny_index, "not a token!")
        assert suggest_terms(spark, tiny_index, "zz", top_n=0).count() == 0


def _match_mask_numpy(q: Q, idx) -> "np.ndarray":
    """Independent MATCH evaluator over the oracle index (presence only —
    the IndexSearcher.count(BooleanQuery) spec): a doc matches a term leaf
    iff the term's posting list contains it; bool nodes apply the documented
    BooleanWeight must/must_not/msm rules. No scores anywhere."""
    n = len(idx.doc_ids)

    def walk(node: Q) -> np.ndarray:
        if node.kind == "term":
            m = np.zeros(n, dtype=bool)
            if node.token in idx.postings:
                m[idx.postings[node.token][0]] = True
            return m
        if node.kind == "phrase":
            raise NotImplementedError  # count tests use term-only trees here
        if node.kind == "const":
            return walk(node.must[0])
        match = np.ones(n, dtype=bool)
        for c in node.must:
            match &= walk(c)
        for c in node.filter:
            match &= walk(c)
        for c in node.must_not:
            match &= ~walk(c)
        need = node.msm if node.msm > 0 else (
            0 if (node.must or node.filter) else 1
        )
        if need > 0:
            n_sh = np.zeros(n, dtype=np.int32)
            for c in node.should:
                n_sh += walk(c)
            match &= n_sh >= need
        return match

    return walk(q)


class TestBooleanCount:
    @pytest.mark.parametrize("tree", TestBooleanAST.TREES)
    def test_count_matches_numpy_evaluator(
        self, spark, tiny_index, oracle_tiny, tree
    ):
        from cuvs_lucene_spark.booleanq import count_boolean

        exp = int(_match_mask_numpy(tree, oracle_tiny).sum())
        assert count_boolean(spark, tiny_index, tree) == exp

    def test_count_equals_search_row_count(self, spark, tiny_index, oracle_tiny):
        """count(tree) must agree with the search surface it shares a
        compiled predicate with — exhaustive k pages the whole match set."""
        from cuvs_lucene_spark.booleanq import count_boolean

        tree = TestBooleanAST.TREES[0]
        n = len(oracle_tiny.doc_ids)
        rows = search_boolean(spark, tiny_index, tree, k=n).count()
        assert count_boolean(spark, tiny_index, tree) == rows

    def test_count_absent_everything_is_zero(self, spark, tiny_index):
        from cuvs_lucene_spark.booleanq import count_boolean

        tree = Q.boolean(should=[Q.term("zzzzabsent")])
        assert count_boolean(spark, tiny_index, tree) == 0


class TestBooleanExplain:
    def test_explain_matches_search_score(self, spark, tiny_index):
        from cuvs_lucene_spark.booleanq import explain_boolean

        for tree in (
            TestBooleanAST.TREES[0], TestBooleanAST.TREES[4],
            TestBooleanAST.TREES[5], TestBooleanAST.TREES[7],
        ):
            hits = search_boolean(
                spark, tiny_index, tree, k=3, float32=False
            ).collect()
            assert hits
            for h in hits:
                ex = explain_boolean(spark, tiny_index, tree, h["doc_id"])
                assert ex["matched"] is True
                assert abs(ex["score"] - float(h["score"])) < 1e-9, (
                    h["doc_id"], ex["score"], h["score"],
                )

    def test_explain_unmatched_doc(self, spark, tiny_index, oracle_tiny):
        from cuvs_lucene_spark.booleanq import explain_boolean

        tree = TestBooleanAST.TREES[0]
        mask = _match_mask_numpy(tree, oracle_tiny)
        unmatched = int(oracle_tiny.doc_ids[np.flatnonzero(~mask)[0]])
        ex = explain_boolean(spark, tiny_index, tree, unmatched)
        assert ex["matched"] is False and ex["score"] == 0.0
        # the breakdown still reports WHY: the nested explanation is present
        assert ex["explanation"] is not None
        assert ex["explanation"]["matched"] is False

    def test_explain_must_not_recorded(self, spark, tiny_index, oracle_tiny):
        from cuvs_lucene_spark.booleanq import explain_boolean

        # a doc rejected ONLY by the MUST_NOT clause: must+should match
        pos = _match_mask_numpy(
            Q.boolean(
                must=[Q.term("the")],
                should=[Q.term("work"), Q.term("world")],
                msm=1,
            ),
            oracle_tiny,
        )
        neg = _match_mask_numpy(Q.boolean(should=[Q.term("school")]), oracle_tiny)
        cand = np.flatnonzero(pos & neg)
        assert len(cand)
        doc = int(oracle_tiny.doc_ids[cand[0]])
        ex = explain_boolean(
            spark, tiny_index, TestBooleanAST.TREES[0], doc
        )
        assert ex["matched"] is False
        mn = ex["explanation"]["clauses"]["must_not"][0]
        assert mn["matched"] is True  # the veto clause fired


class TestCommonTerms:
    """CommonTermsQuery analog: df-gated must/should split at query time."""

    def _dfs(self, oracle_tiny):
        return {t: len(p[0]) for t, p in oracle_tiny.postings.items()}

    def _expected(self, oracle_tiny, toks, ratio, k):
        """Independent rollout: docs matching every rare term, scored by the
        sum of ALL matched query-term BM25 contributions (float64, clause
        order low-then-high in query order), top-k (score desc, doc asc)."""
        import numpy as np

        dfs = self._dfs(oracle_tiny)
        cutoff = ratio * oracle_tiny.n_docs
        low = [t for t in toks if dfs.get(t, 0) <= cutoff]
        acc = np.zeros(len(oracle_tiny.doc_ids), dtype=np.float64)
        matched_low = np.zeros(len(oracle_tiny.doc_ids), dtype=np.int64)
        for t in low + [t for t in toks if dfs.get(t, 0) > cutoff]:
            if t not in oracle_tiny.postings:
                return []
            d, tf = oracle_tiny.postings[t]
            idf = np.float32(oracle_idf(oracle_tiny, t))
            dl32 = oracle_tiny.dl_d[d].astype(np.float32)
            tf32 = tf.astype(np.float32)
            s = (idf * tf32 / (tf32 + np.float32(1.2)
                 * (np.float32(0.25) + np.float32(0.75) * dl32
                    / np.float32(oracle_tiny.avgdl)))).astype(np.float32)
            acc[d] += s.astype(np.float64)
            if t in low:
                matched_low[d] += 1
        ok = matched_low == len(low)
        ids = np.where(ok)[0]
        order = sorted(ids, key=lambda i: (-acc[i], oracle_tiny.doc_ids[i]))
        return [(int(oracle_tiny.doc_ids[i]), float(acc[i])) for i in order[:k]]

    def test_split_matches_independent_rollout(
        self, spark, tiny_index, oracle_tiny
    ):
        from cuvs_lucene_spark.multiterm import search_common

        toks, ratio = ["world", "the", "of"], 0.5
        exp = self._expected(oracle_tiny, toks, ratio, k=10)
        assert exp, "fixture must have world rare + the/of common"
        dfs = self._dfs(oracle_tiny)
        assert dfs["world"] <= ratio * oracle_tiny.n_docs < dfs["the"]
        got = search_common(
            spark, tiny_index, " ".join(toks), k=10,
            max_term_frequency=ratio, float32=False,
        ).collect()
        assert [r["doc_id"] for r in got] == [d for d, _ in exp]
        for r, (_d, s) in zip(got, exp):
            assert r["score"] == pytest.approx(s, rel=1e-6)

    def test_all_common_degenerates_to_or(self, spark, tiny_index):
        from cuvs_lucene_spark.multiterm import search_common
        from cuvs_lucene_spark.query import search

        got = search_common(
            spark, tiny_index, "world school", k=8,
            max_term_frequency=1.0, float32=False,
        ).collect()
        ref = search(
            spark, tiny_index, "world school", k=8, float32=False
        ).collect()
        assert [(r["doc_id"], r["score"]) for r in got] == [
            (r["doc_id"], r["score"]) for r in ref
        ]

    def test_absent_rare_term_matches_nothing(self, spark, tiny_index):
        from cuvs_lucene_spark.multiterm import search_common

        out = search_common(
            spark, tiny_index, "zzzzqqq world", k=5, max_term_frequency=0.5
        )
        assert out.count() == 0


class TestSuggestCompletions:
    def test_matches_vocab_rollout(self, spark, tiny_index, tiny_pdf):
        from collections import Counter

        from cuvs_lucene_spark.multiterm import suggest_completions

        dfs: Counter = Counter()
        for txt in tiny_pdf["text"]:
            dfs.update(set(tokenize_py(txt)))
        prefix = "s"
        exp = sorted(
            ((t, n) for t, n in dfs.items() if t.startswith(prefix)),
            key=lambda x: (-x[1], x[0]),
        )[:5]
        got = suggest_completions(spark, tiny_index, prefix, top_n=5).collect()
        assert [(r["term"], r["weight"]) for r in got] == exp

    def test_guards(self, spark, tiny_index):
        from cuvs_lucene_spark.multiterm import suggest_completions

        assert suggest_completions(spark, tiny_index, "s", top_n=0).count() == 0
        with pytest.raises(ValueError):
            suggest_completions(spark, tiny_index, "not a token!")
