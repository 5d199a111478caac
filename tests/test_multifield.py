"""Multi-field indexing (per-field posting lists, dictionary, stats).

Reference analog: per-field index entries written by
``CuVS2510GPUVectorsWriter.java:335-352`` and the two-field coverage test
``TestCuVSVectorsFormat.java:92-129``. Our engine tags every posting block,
dictionary row and collection statistic with a `field` column; a query runs
against exactly one field (Lucene TermQuery = (field, term)) and scores with
THAT field's docCount/avgdl.

The oracle for the second field is the same numpy Lucene-BM25 oracle, built
over the `tool` column (swap it into the text slot): doc ids are assigned
from (conv_id, turn_idx) identically, so per-field results are directly
comparable.
"""

from __future__ import annotations

import pytest

from cuvs_lucene_spark.oracle import build_oracle_index, oracle_search
from cuvs_lucene_spark.query import IndexReader, count_matches, search

TOOL_QUERIES = ["bash", "python sql", "search browser editor", "calculator"]


@pytest.fixture(scope="module")
def mf_index(spark, tiny_df, tmp_path_factory):
    from cuvs_lucene_spark.operators.build import build_index

    d = str(tmp_path_factory.mktemp("idx") / "mf")
    build_index(
        spark, tiny_df, d,
        buckets=8, salt_buckets=4, hot_df_ratio=0.10,
        fields=("text", "tool"),
    )
    return d


@pytest.fixture(scope="module")
def oracle_tool(tiny_pdf):
    pdf = tiny_pdf.copy()
    pdf["text"] = pdf["tool"]
    return build_oracle_index(pdf)


def test_field_stats_per_field(spark, mf_index, oracle_tiny, oracle_tool):
    rd = IndexReader(spark, mf_index)
    assert rd.fields == ["text", "tool"]
    # primary field stats unchanged by indexing a second field
    assert (rd.n_docs, rd.avgdl) == (oracle_tiny.n_docs, oracle_tiny.avgdl)
    n, _sdl, avgdl = rd.field_stats_of("tool")
    assert n == oracle_tool.n_docs
    assert avgdl == pytest.approx(oracle_tool.avgdl)


def test_tool_field_search_matches_oracle(spark, mf_index, oracle_tool):
    rd = IndexReader(spark, mf_index)
    for q in TOOL_QUERIES:
        got = [
            (r["doc_id"], r["score"])
            for r in search(spark, mf_index, q, k=10, field="tool", reader=rd)
            .collect()
        ]
        want = oracle_search(oracle_tool, q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-5), q


def test_text_search_unaffected_by_second_field(
    spark, mf_index, tiny_index, oracle_tiny
):
    """Default-field results on a two-field index == single-field index
    results (per-field stats isolate the fields completely)."""
    for q in ["the merge", "school water company"]:
        a = [
            (r["doc_id"], r["score"])
            for r in search(spark, mf_index, q, k=10).collect()
        ]
        b = [
            (r["doc_id"], r["score"])
            for r in search(spark, tiny_index, q, k=10).collect()
        ]
        assert a == b, q
        want = oracle_search(oracle_tiny, q, k=10)
        assert [d for d, _ in a] == [d for d, _ in want], q


def test_tool_field_count_and_dictionary(spark, mf_index, oracle_tool):
    n = count_matches(spark, mf_index, "bash python", mode="or", field="tool")
    d_bash, _ = oracle_tool.postings.get("bash", ((), ()))
    d_py, _ = oracle_tool.postings.get("python", ((), ()))
    assert n == len(set(d_bash) | set(d_py))
    rd = IndexReader(spark, mf_index)
    st = rd.term_stats(["bash", "python"], field="tool")
    assert st["bash"][0] == len(d_bash)
    assert st["python"][0] == len(d_py)


def test_unknown_field_rejected(spark, mf_index):
    with pytest.raises(ValueError, match="not indexed"):
        search(spark, mf_index, "bash", field="nosuchfield")


# ---------------------------------------------------------------------------
# cross-field search (Lucene MultiFieldQueryParser analog)
# ---------------------------------------------------------------------------

def _field_acc(idx, query: str, boost: float = 1.0) -> dict[int, float]:
    """Per-doc float64 subtotal for one field, f64 per-term scores added in
    sorted-term order (the engine's float32=False grouping), boost folded
    into idf BEFORE the per-term product — exactly as search_fields does."""
    from collections import Counter

    from cuvs_lucene_spark.analysis import tokenize_py
    from cuvs_lucene_spark.oracle import oracle_idf

    K1, B = 1.2, 0.75
    weights = Counter(tokenize_py(query))
    acc: dict[int, float] = {}
    for term in sorted(set(weights)):
        if term not in idx.postings:
            continue
        d, tf = idx.postings[term]
        idf = oracle_idf(idx, term) * boost
        for di, f in zip(d, tf):
            dl = float(idx.dl_d[di])
            kf = K1 * (1 - B + B * dl / idx.avgdl)
            s = weights[term] * (idf * float(f) / (float(f) + kf))
            acc[int(di)] = acc.get(int(di), 0.0) + s
    return acc


def _combined_topk(accs: list[dict[int, float]], k: int):
    docs = sorted(set().union(*[a.keys() for a in accs]))
    totals = []
    for d in docs:
        t = 0.0
        for a in accs:
            t = t + a.get(d, 0.0)
        totals.append((d, t))
    totals.sort(key=lambda r: (-r[1], r[0]))
    return totals[:k]


def test_search_fields_matches_combined_oracle(
    spark, mf_index, oracle_tiny, oracle_tool
):
    from cuvs_lucene_spark.query import search_fields

    for q in ["bash merge", "python sql school", "search the window"]:
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in search_fields(
                spark, mf_index, q, k=10, float32=False
            ).collect()
        ]
        want = _combined_topk(
            [_field_acc(oracle_tiny, q), _field_acc(oracle_tool, q)], 10
        )
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), q


def _dismax_topk(accs: list[dict[int, float]], k: int, tiebreak: float):
    """Independent DisMax evaluator: per-field subtotals from the numpy
    oracle accumulators, combined as best + tiebreak·(sum − best)."""
    docs = sorted(set().union(*[a.keys() for a in accs]))
    totals = []
    for d in docs:
        subs = [a.get(d, 0.0) for a in accs]
        t = 0.0
        for s in subs:
            t = t + s
        best = max(subs)
        totals.append((d, best + tiebreak * (t - best)))
    totals.sort(key=lambda r: (-r[1], r[0]))
    return totals[:k]


@pytest.mark.parametrize("tiebreak", [0.0, 0.3, 1.0])
def test_search_fields_dismax(spark, mf_index, oracle_tiny, oracle_tool, tiebreak):
    """DisjunctionMaxQuery analog: combine='dismax' must equal the
    independent per-field max + tiebreak combination; tiebreak=1.0
    degenerates to the sum combiner exactly."""
    from cuvs_lucene_spark.query import search_fields

    for q in ["bash merge", "call data", "python sql school"]:
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in search_fields(
                spark, mf_index, q, k=10, float32=False,
                combine="dismax", tiebreak=tiebreak,
            ).collect()
        ]
        want = _dismax_topk(
            [_field_acc(oracle_tiny, q), _field_acc(oracle_tool, q)],
            10, tiebreak,
        )
        assert [d for d, _ in got] == [d for d, _ in want], (q, tiebreak)
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, rel=1e-12), (q, tiebreak)


def test_dismax_validation(spark, mf_index):
    from cuvs_lucene_spark.query import search_fields

    with pytest.raises(ValueError, match="combine"):
        search_fields(spark, mf_index, "bash", combine="max")
    with pytest.raises(ValueError, match="tiebreak"):
        search_fields(spark, mf_index, "bash", combine="sum", tiebreak=0.5)
    with pytest.raises(ValueError, match="tiebreak"):
        search_fields(spark, mf_index, "bash", combine="dismax", tiebreak=1.5)


def test_search_fields_boost(spark, mf_index, oracle_tiny, oracle_tool):
    from cuvs_lucene_spark.query import search_fields

    q = "bash data"
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in search_fields(
            spark, mf_index, q, k=10, weights=[1.0, 2.5], float32=False
        ).collect()
    ]
    want = _combined_topk(
        [_field_acc(oracle_tiny, q), _field_acc(oracle_tool, q, boost=2.5)], 10
    )
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_search_fields_single_field_degenerates(spark, mf_index):
    """fields=['text'] must equal the plain single-field search exactly."""
    from cuvs_lucene_spark.query import search_fields

    q = "school water company"
    a = [
        (r["doc_id"], float(r["score"]))
        for r in search_fields(
            spark, mf_index, q, k=10, fields=["text"], float32=False
        ).collect()
    ]
    b = [
        (r["doc_id"], float(r["score"]))
        for r in search(spark, mf_index, q, k=10, float32=False).collect()
    ]
    assert a == b


def test_multifield_survives_compaction_and_deletes(
    spark, tiny_df, tmp_path_factory
):
    """Two two-field segments → delete a tool-field hit → compact: per-field
    stats recompute per field, tool-field and cross-field results drop the
    victim and keep everyone else's scores."""
    from pyspark.sql import functions as F

    from cuvs_lucene_spark.operators.build import build_segment
    from cuvs_lucene_spark.operators.deletes import delete_docs
    from cuvs_lucene_spark.operators.merge import compact
    from cuvs_lucene_spark.query import search_fields

    d = str(tmp_path_factory.mktemp("idx") / "mf2seg")
    cut = "conv-00000100"
    for sid, cond in enumerate(
        [F.col("conv_id") < cut, F.col("conv_id") >= cut]
    ):
        build_segment(
            spark, tiny_df.where(cond), d, sid,
            buckets=8, salt_buckets=4, hot_df_ratio=0.10,
            fields=("text", "tool"),
        )
    q = "bash merge data"
    base = search(spark, d, "bash python", k=10, field="tool").collect()
    base_x = search_fields(spark, d, q, k=10, float32=False).collect()
    assert base and base_x
    victim = int(base[0]["doc_id"])
    rd = IndexReader(spark, d)
    n_before = rd.field_stats_of("tool")[0]  # BEFORE delete+compact: the
    # catalog re-reads the manifest on every stats call, so capture now
    keys = (
        rd.cat.read_doc_dim(spark)
        .where(F.col("doc_id") == victim)
        .select("conv_id", "turn_idx")
    )
    assert delete_docs(spark, d, keys) == 1
    compact(spark, d)
    rd2 = IndexReader(spark, d)
    assert rd2.fields == ["text", "tool"]
    after = search(spark, d, "bash python", k=10, field="tool").collect()
    after_x = search_fields(spark, d, q, k=10, float32=False).collect()
    assert victim not in {int(r["doc_id"]) for r in after}
    assert victim not in {int(r["doc_id"]) for r in after_x}
    # exact equivalence: compact-with-deletes == an index built from scratch
    # over the filtered corpus (same docIDs: stable (conv_id, turn_idx)
    # assignment is unaffected by dropping one row — M3/M4 invariant), on
    # BOTH the tool field and the cross-field path
    vrow = keys.collect()[0]
    d2 = str(tmp_path_factory.mktemp("idx") / "mfrebuild")
    build_segment(
        spark,
        tiny_df.where(
            ~((F.col("conv_id") == vrow["conv_id"])
              & (F.col("turn_idx") == vrow["turn_idx"]))
        ),
        d2, 0, buckets=8, salt_buckets=4, hot_df_ratio=0.10,
        fields=("text", "tool"),
    )
    def key(rows):
        return [(r["conv_id"], r["turn_idx"], round(float(r["score"]), 5)) for r in rows]
    assert key(after) == key(search(spark, d2, "bash python", k=10, field="tool").collect())
    assert key(after_x) == key(
        search_fields(spark, d2, q, k=10, float32=False).collect()
    )
    # tool-field stats recomputed over live docs only
    n_after = rd2.field_stats_of("tool")[0]
    assert n_after == n_before - 1


def test_search_fields_guards(spark, mf_index):
    from cuvs_lucene_spark.query import search_fields

    assert search_fields(spark, mf_index, "", k=10).count() == 0
    assert search_fields(spark, mf_index, "zzzqqq", k=10).count() == 0
    assert search_fields(spark, mf_index, "bash", k=0).count() == 0
    with pytest.raises(ValueError, match="duplicate"):
        search_fields(spark, mf_index, "bash", fields=["text", "text"])
    with pytest.raises(ValueError, match="align"):
        search_fields(spark, mf_index, "bash", weights=[1.0])
