"""Per-document term vectors (TermVectorsReader analog).

Engine output (term, tf, positions) reconstructed from the inverted index
must equal the analyzer's view of the raw text — the same cross-check
Lucene's CheckIndex -crossCheckTermVectors performs between the forward
and inverted stores. Also pins: key-addressed deletes are masked, unknown
keys raise, a positions-less index still serves (term, tf) with empty
positions, and the secondary field serves its own vector.
"""

from collections import Counter

import pytest

from cuvs_lucene_spark.analysis import tokenize_py
from cuvs_lucene_spark.operators.build import build_index
from cuvs_lucene_spark.termvectors import term_vectors


@pytest.fixture(scope="module")
def tv_index(spark, tiny_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "tv")
    build_index(
        spark, tiny_df, d, buckets=8, salt_buckets=4, hot_df_ratio=0.10,
        positions=True, fields=("text", "tool"),
    )
    return d


def expected_tv(tiny_pdf, conv_id, turn_idx, col="text"):
    row = tiny_pdf[
        (tiny_pdf.conv_id == conv_id) & (tiny_pdf.turn_idx == turn_idx)
    ].iloc[0]
    toks = tokenize_py(row[col] or "")
    tf = Counter(toks)
    pos = {t: [i for i, x in enumerate(toks) if x == t] for t in tf}
    return sorted(
        (t, tf[t], ",".join(str(p) for p in pos[t])) for t in tf
    )


def got_tv(spark, d, conv_id, turn_idx, **kw):
    return [
        (r["term"], r["tf"], r["positions"])
        for r in term_vectors(spark, d, conv_id, turn_idx, **kw).collect()
    ]


class TestTermVectors:
    def test_matches_analyzer_view(self, spark, tv_index, tiny_pdf):
        # several docs, including a hot-term-salted one (tiny fixture uses
        # hot_df_ratio=0.10 so common terms are salted)
        keys = [
            (r.conv_id, int(r.turn_idx))
            for r in tiny_pdf.sample(5, random_state=42).itertuples()
        ]
        for conv_id, turn_idx in keys:
            assert got_tv(spark, tv_index, conv_id, turn_idx) == expected_tv(
                tiny_pdf, conv_id, turn_idx
            )

    def test_secondary_field(self, spark, tv_index, tiny_pdf):
        with_tool = tiny_pdf[tiny_pdf.tool.notna() & (tiny_pdf.tool != "")]
        r = with_tool.iloc[0]
        assert got_tv(
            spark, tv_index, r.conv_id, int(r.turn_idx), field="tool"
        ) == expected_tv(tiny_pdf, r.conv_id, int(r.turn_idx), col="tool")

    def test_unknown_key_raises(self, spark, tv_index):
        with pytest.raises(KeyError, match="no document"):
            term_vectors(spark, tv_index, "conv-nonexistent", 0)

    def test_deleted_key_masked(self, spark, tv_index, tiny_pdf, tmp_path_factory):
        from cuvs_lucene_spark.operators.build import build_index as bi
        from cuvs_lucene_spark.operators.deletes import delete_docs

        # dedicated copy: tv_index is module-shared
        d = str(tmp_path_factory.mktemp("idx") / "tvdel")
        src = tiny_pdf
        spark_df = spark.createDataFrame(src)
        bi(spark, spark_df, d, buckets=4, salt_buckets=2, hot_df_ratio=0.10,
           positions=True)
        victim = src.iloc[7]
        delete_docs(
            spark, d,
            spark.createDataFrame(
                [(victim.conv_id, int(victim.turn_idx))],
                "conv_id string, turn_idx int",
            ),
        )
        with pytest.raises(KeyError, match="deleted"):
            term_vectors(spark, d, victim.conv_id, int(victim.turn_idx))

    def test_positionless_index_serves_tf_only(
        self, spark, tiny_index, tiny_pdf
    ):
        r = tiny_pdf.iloc[3]
        got = got_tv(spark, tiny_index, r.conv_id, int(r.turn_idx))
        want = [
            (t, tf, "") for t, tf, _ in expected_tv(
                tiny_pdf, r.conv_id, int(r.turn_idx)
            )
        ]
        assert got == want
