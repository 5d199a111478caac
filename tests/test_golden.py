"""Golden fixed-seed regression gate (FIXTURES.md §4, SURVEY §5.2 item 2).

``tests/golden/topk_seed42.json`` freezes the engine's exact top-k
``(doc_id, score)`` results for ~20 queries spanning every query surface
(OR/AND/NOT/msm/filtered/pruned/searchAfter/phrase/slop/field/multifield/
prefix/wildcard/fuzzy/regexp/boolean/dismax/mlt) over the deterministic tiny tier — the analog
of the reference's frozen expected-docID set
(``TestCagraToHnswSerializationAndSearch.java:133-151``). Any silent drift in
the analyzer, codec, norms quantization, idf, summation order, or tie-break
trips this test without needing the numpy oracle.

Regeneration is deliberate: run ``pytest tests/test_golden.py
--regen-golden`` and REVIEW the JSON diff before committing (the test never
rewrites the file on its own).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "topk_seed42.json")


@pytest.fixture(scope="module")
def golden_index(spark, tiny_df, tmp_path_factory):
    """Positional, two-field index over the tiny tier — one index serves
    every golden surface (phrase/slop need positions, field/multifield need
    the second field)."""
    from cuvs_lucene_spark.operators.build import build_index

    d = str(tmp_path_factory.mktemp("idx") / "golden")
    build_index(
        spark, tiny_df, d, buckets=8, salt_buckets=4, hot_df_ratio=0.10,
        positions=True, fields=("text", "tool"),
    )
    return d


def _hits(df) -> list[list]:
    return [[int(r["doc_id"]), float(r["score"])] for r in df.collect()]


def golden_queries() -> dict:
    """qid → callable(spark, index_dir) → [[doc_id, score], ...].

    Every query text uses terms verified present in the tiny tier (hot-head
    words, two w-tail rare terms, tool names on the `tool` field)."""
    from cuvs_lucene_spark.booleanq import Q, search_boolean
    from cuvs_lucene_spark.mlt import more_like_this as _mlt
    from cuvs_lucene_spark.multiterm import search_multiterm
    from cuvs_lucene_spark.qparser import search_qstring as _qstr
    from cuvs_lucene_spark.query import (
        search, search_fields, search_phrase, search_sorted,
    )
    from cuvs_lucene_spark.spans import search_span_first as _spanfirst
    from cuvs_lucene_spark.spans import search_span_near as _spannear
    from cuvs_lucene_spark.spans import search_span_or as _spanor
    from cuvs_lucene_spark.spans import search_span_range as _spanrange

    def after_page2(s, d):
        page1 = search(s, d, "world school still try", k=10).collect()
        cur = (float(page1[-1]["score"]), int(page1[-1]["doc_id"]))
        return search(s, d, "world school still try", k=10, after=cur)

    tree = Q.boolean(
        must=[Q.term("the"), Q.boolean(should=[Q.term("work"), Q.term("world", boost=2.0)])],
        must_not=[Q.term("school")],
    )

    def _count_boolean_as_df(s, d):
        # freeze the nested-tree COUNT too (one [n, n] row in the golden
        # (doc_id, score) shape): analyzer/presence drift trips it even when
        # the top-10 happens to survive
        from cuvs_lucene_spark.booleanq import count_boolean

        n = count_boolean(s, d, tree)
        return s.createDataFrame([(n, float(n))], "doc_id long, score double")

    return {
        "or3_hot": lambda s, d: search(s, d, "the be to", k=10),
        "or4_mixed": lambda s, d: search(s, d, "world school still try", k=10),
        "or6": lambda s, d: search(s, d, "work first well way even new", k=10),
        "or_rare_mix": lambda s, d: search(s, d, "w01746 people w01763", k=10),
        "and2": lambda s, d: search(s, d, "time no", k=10, mode="and"),
        "and3": lambda s, d: search(s, d, "know take people", k=10, mode="and"),
        "not_must": lambda s, d: search(s, d, "make can like", k=10, exclude="time"),
        "msm2": lambda s, d: search(s, d, "look only come its", k=10, msm=2),
        "filter_role": lambda s, d: search(
            s, d, "think also back", k=10, filter_cond=F.col("role") == "user"
        ),
        "filter_ts": lambda s, d: search(
            s, d, "after use two", k=10,
            filter_cond=F.col("ts") <= F.lit("2026-01-04 00:00:00").cast("timestamp"),
        ),
        "hot_single_k20": lambda s, d: search(s, d, "the", k=20),
        "rare_single": lambda s, d: search(s, d, "w01746", k=10),
        "pruned_or": lambda s, d: search(s, d, "the be to", k=10, prune=True),
        "sim_lmd": lambda s, d: search(
            s, d, "world school student", k=10, similarity="lmd"
        ),
        "sim_lmjm": lambda s, d: search(
            s, d, "world school student", k=10, similarity="lmjm"
        ),
        "sim_bm25_tuned": lambda s, d: search(
            s, d, "world school student", k=10, k1=0.9, b=0.4
        ),
        "after_page2": after_page2,
        "phrase_exact": lambda s, d: search_phrase(s, d, "the w49999", k=10),
        "phrase_slop2": lambda s, d: search_phrase(s, d, "be to", k=10, slop=2),
        "field_tool": lambda s, d: search(s, d, "sql browser", k=10, field="tool"),
        "multifield": lambda s, d: search_fields(s, d, "sql the", k=10),
        "prefix_th": lambda s, d: search_multiterm(s, d, prefix="th", k=10),
        "wildcard_wk": lambda s, d: search_multiterm(s, d, wildcard="w*k", k=10),
        "fuzzy_scool": lambda s, d: search_multiterm(
            s, d, fuzzy="scool", max_edits=2, k=10
        ),
        "boolean_nested": lambda s, d: search_boolean(s, d, tree, k=10),
        "regexp_stn": lambda s, d: search_multiterm(s, d, regexp="s[a-z]*l", k=10),
        "dismax_tb03": lambda s, d: search_fields(
            s, d, "sql the", k=10, combine="dismax", tiebreak=0.3
        ),
        "mlt_cut5": lambda s, d: _mlt(
            s, d, "the world of world data and the school student country help",
            k=10, max_query_terms=5, min_term_freq=1, min_doc_freq=2,
        ),
        "collapse_conv": lambda s, d: search(
            s, d, "world school student", k=10, collapse_by="conv_id"
        ),
        "group_role_k2": lambda s, d: search(
            s, d, "world school student", k=2, group_by="role"
        ),
        # sorted search has no score column; freeze (doc_id, ts-epoch) pairs
        "sorted_ts_desc": lambda s, d: search_sorted(
            s, d, "world school student", sort_by="ts", k=10
        ).select("doc_id", F.col("ts").cast("double").alias("score")),
        # round-4 surfaces
        "trange_sa_so": lambda s, d: search_multiterm(
            s, d, term_range=("sa", "so"), include_upper=False, k=10
        ),
        "spannear_slop4": lambda s, d: _spannear(
            s, d, "the world", slop=4, k=10
        ),
        "spannear_unord_slop4": lambda s, d: _spannear(
            s, d, "the world", slop=4, k=10, in_order=False
        ),
        "count_boolean_nested": lambda s, d: _count_boolean_as_df(s, d),
        "qstring_range_mix": lambda s, d: _qstr(
            s, d, "[sa TO sd] OR world", k=10
        ),
        "spanfirst_end8": lambda s, d: _spanfirst(
            s, d, "the world", end=8, slop=4, k=10
        ),
        "spanfirst_term_end5": lambda s, d: _spanfirst(
            s, d, "world", end=5, k=10
        ),
        "spanrange_2_30": lambda s, d: _spanrange(
            s, d, "the world", start=2, end=30, slop=4, k=10
        ),
        "spanor_ws": lambda s, d: _spanor(s, d, "world school", k=10),
        "boolean_span_leaf": lambda s, d: search_boolean(
            s, d,
            Q.boolean(
                must=[Q.span_near("the world", slop=4)],
                should=[Q.term("help")],
                must_not=[Q.term("school")],
            ),
            k=10,
        ),
        "spannear_orclause": lambda s, d: _spannear(
            s, d, ["the", "world school"], slop=6, k=10
        ),
        "spannot_post2": lambda s, d: _spannear(
            s, d, "world school", slop=4, k=10, exclude="the", post=2
        ),
        # round-4 session surfaces, encoded into the (doc_id, score) shape:
        # children carry (doc_id, parent score) natively; sigterms freeze as
        # (fg_df*1e6+bg_df, JLH) so any term-set/count drift trips; drill-
        # sideways rows freeze as (crc32(dim|facet), n_docs).
        "children_bj": lambda s, d: __import__(
            "cuvs_lucene_spark.query", fromlist=["search_children"]
        ).search_children(
            s, d, "world school student", parent_by="conv_id",
            k=20, k_parents=3, score_mode="total", float32=False,
        ).select("doc_id", "score"),
        "sigterms_k10": lambda s, d: __import__(
            "cuvs_lucene_spark.sigterms", fromlist=["significant_terms"]
        ).significant_terms(
            s, d, "world school", fg_k=15, top_terms=10, float32=False
        ).select(
            (F.col("fg_df") * 1_000_000 + F.col("bg_df")).alias("doc_id"),
            F.col("score"),
        ),
        "drill_sideways_enc": lambda s, d: __import__(
            "cuvs_lucene_spark.query", fromlist=["drill_sideways"]
        ).drill_sideways(
            s, d, "world school",
            dims={"role": ["user", "tool"], "turn_idx": [0, 1, 2, 3, 4]},
        ).select(
            F.crc32(F.concat_ws("|", "dim", "facet")).cast("long").alias("doc_id"),
            F.col("n_docs").cast("double").alias("score"),
        ),
    }


def compare_to_golden(golden: dict, got: dict) -> list[str]:
    """Mismatch report between a golden dict and fresh results: docIDs must
    be rank-identical, scores within 1e-5 (the suite-wide float32 bar)."""
    problems = []
    for qid, exp_hits in golden.items():
        if qid not in got:
            problems.append(f"{qid}: query no longer runs")
            continue
        g = got[qid]
        if [h[0] for h in g] != [h[0] for h in exp_hits]:
            problems.append(
                f"{qid}: docIDs {[h[0] for h in g]} != golden {[h[0] for h in exp_hits]}"
            )
            continue
        for (gd, gs), (_ed, es) in zip(g, exp_hits):
            if abs(gs - es) >= 1e-5:
                problems.append(f"{qid}: doc {gd} score {gs} != golden {es}")
                break
    for qid in got:
        if qid not in golden:
            problems.append(f"{qid}: not in golden file (regen needed)")
    return problems


def _run_all(spark, golden_index) -> dict:
    return {
        qid: _hits(fn(spark, golden_index))
        for qid, fn in golden_queries().items()
    }


def test_golden_topk(request, spark, golden_index):
    got = _run_all(spark, golden_index)
    assert all(len(h) > 0 for h in got.values()), {
        q: len(h) for q, h in got.items() if not h
    }
    if request.config.getoption("--regen-golden"):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        pytest.skip(f"regenerated {GOLDEN_PATH} — review the diff")
    assert os.path.exists(GOLDEN_PATH), (
        f"golden file missing: {GOLDEN_PATH} — run with --regen-golden once"
    )
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    problems = compare_to_golden(golden, got)
    assert not problems, "\n".join(problems)


def test_golden_comparison_catches_drift():
    """The tripwire itself must trip: a 1-ULP-class score change, a swapped
    rank, a dropped hit, and a new query all register as mismatches (the
    'deliberate perturbation' check — an analyzer/codec change surfaces as
    exactly one of these shapes)."""
    golden = {"q": [[1, 2.5], [2, 1.25]], "r": [[3, 0.5]]}
    ok = {"q": [[1, 2.5], [2, 1.25]], "r": [[3, 0.5]]}
    assert compare_to_golden(golden, ok) == []
    assert compare_to_golden(golden, {"q": [[1, 2.5], [2, 1.2501]], "r": [[3, 0.5]]})
    assert compare_to_golden(golden, {"q": [[2, 1.25], [1, 2.5]], "r": [[3, 0.5]]})
    assert compare_to_golden(golden, {"q": [[1, 2.5]], "r": [[3, 0.5]]})
    assert compare_to_golden(golden, {"q": [[1, 2.5], [2, 1.25]]})
    assert compare_to_golden(
        golden, {"q": [[1, 2.5], [2, 1.25]], "r": [[3, 0.5]], "new": [[9, 1.0]]}
    )
