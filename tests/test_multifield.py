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
