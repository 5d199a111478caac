"""Cross-config conformance sweep (opt-in: ``pytest -m conformance``).

The reference inherits hundreds of contract cases across index configs from
Lucene's ``BaseKnnVectorsFormatTestCase`` (``TestCuVSVectorsFormat.java:40``
runs the whole inherited battery against the GPU codec). This is the analog
for the FTS engine: a matrix over

    buckets {2, 8} x positions {off, on} x analyzer {standard, english}
    x fields {1, 2} x salting {off, on}

(32 configs), each driven through the full lifecycle:

    build -> query battery vs the analyzer-aware numpy oracle
          -> delete a slice -> compact -> re-verify the same battery

The battery covers the boolean contract core (single / OR / AND / NOT / msm
/ filtered) plus a second-field probe on multi-field configs. Every config
must produce rank-identical docIDs and <1e-5 score agreement with the
oracle, before AND after compaction — the same bar as the default-config
engine==oracle tests, now swept across the config space.

The randomized-oracle battery (test_random_oracle.py) varies corpora under
one config; this sweep varies the CONFIG under one corpus — together they
approximate the reference's inherited-contract coverage.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.fixtures import generate_transcripts
from cuvs_lucene_spark.operators.build import build_index
from cuvs_lucene_spark.operators.deletes import delete_docs
from cuvs_lucene_spark.operators.merge import compact
from cuvs_lucene_spark.oracle import build_oracle_index, oracle_search
from cuvs_lucene_spark.query import search

pytestmark = pytest.mark.conformance

N_CONVS = 60  # ~1.3k docs: big enough for salting/pruning paths, fast builds

CONFIGS = [
    pytest.param(
        {
            "buckets": buckets,
            "positions": positions,
            "analyzer": analyzer,
            "fields": ("text", "tool") if two_fields else ("text",),
            "salt_buckets": 4 if salt else 1,
            "hot_df_ratio": 0.02 if salt else 0.05,
        },
        id=(
            f"b{buckets}-pos{int(positions)}-{analyzer}"
            f"-f{2 if two_fields else 1}-salt{int(salt)}"
        ),
    )
    for buckets, positions, analyzer, two_fields, salt in itertools.product(
        (2, 8), (False, True), ("standard", "english"), (False, True),
        (False, True),
    )
]

# the boolean contract core; every query runs against every config
BATTERY = [
    dict(q="merge", mode="or"),
    dict(q="merge sort join window", mode="or"),
    dict(q="merge sort", mode="and"),
    dict(q="merge sort window", mode="or", msm=2),
    dict(q="merge join", mode="or", exclude="sort"),
    dict(q="merge sort", mode="or", filter_role="user"),
    # english-analyzer discriminator: stemming + stopwords must agree AND
    # the query must be non-empty under the english chain (corpus terms
    # "always"/"his" stem to "alway"/"hi", "the" is a stopword) — a raw
    # standard-chain query against the stemmed postings returns nothing,
    # so an index that loses its analysis chain (e.g. across a compaction)
    # fails this row instead of passing vacuously
    dict(q="the always his", mode="or"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = generate_transcripts(N_CONVS).to_pandas()
    df = spark.createDataFrame(pdf)
    return pdf, df


def _oracle_accept(idx, role):
    if role is None:
        return None
    return (idx.meta["role"] == role).to_numpy()


def _run_battery(spark, d, idx, *, stage):
    for spec in BATTERY:
        role = spec.get("filter_role")
        exp = oracle_search(
            idx,
            spec["q"],
            k=10,
            mode=spec["mode"],
            msm=spec.get("msm"),
            exclude=spec.get("exclude"),
            accept=_oracle_accept(idx, role),
        )
        got = [
            (r["doc_id"], r["score"])
            for r in search(
                spark,
                d,
                spec["q"],
                k=10,
                mode=spec["mode"],
                msm=spec.get("msm"),
                exclude=spec.get("exclude"),
                filter_cond=(F.col("role") == role) if role else None,
            ).collect()
        ]
        assert [g for g, _ in got] == [e for e, _ in exp], (
            f"{stage} {spec}: docIDs {got} != {exp}"
        )
        for (gd, gs), (_ed, es) in zip(got, exp):
            assert abs(gs - es) < 1e-5, (
                f"{stage} {spec}: score {gs} vs {es} for doc {gd}"
            )


@pytest.mark.parametrize("cfg", CONFIGS)
def test_config_lifecycle_matches_oracle(spark, corpus, tmp_path, cfg):
    pdf, df = corpus
    d = str(tmp_path / "idx")
    build_index(spark, df, d, **cfg)
    idx = build_oracle_index(pdf, analyzer=cfg["analyzer"])
    _run_battery(spark, d, idx, stage="fresh")

    if len(cfg["fields"]) > 1:
        # second-field probe: the tool column indexed as its own field must
        # score against ITS stats — oracle = an index whose text IS the tool
        # column (per-field isolation contract)
        tool_pdf = pdf.copy()
        tool_pdf["text"] = tool_pdf["tool"].fillna("")
        tool_idx = build_oracle_index(tool_pdf, analyzer=cfg["analyzer"])
        exp = oracle_search(tool_idx, "search", k=10)
        got = [
            (r["doc_id"], r["score"])
            for r in search(spark, d, "search", k=10, field="tool").collect()
        ]
        assert [g for g, _ in got] == [e for e, _ in exp]
        for (gd, gs), (_ed, es) in zip(got, exp):
            assert abs(gs - es) < 1e-5

    # delete a conv slice, compact, re-verify: post-merge stats EXCLUDE the
    # purged docs, so the oracle is rebuilt on the surviving rows
    victims = df.where(F.col("conv_id") < "conv-00000006").select(
        "conv_id", "turn_idx"
    )
    assert delete_docs(spark, d, victims) > 0
    meta = compact(spark, d)
    assert meta is not None
    surviving = pdf[pdf["conv_id"] >= "conv-00000006"]
    idx2 = build_oracle_index(surviving, analyzer=cfg["analyzer"])
    # engine doc_ids are ORIGINAL global ids (merges never rebase); the
    # post-compact oracle re-numbers, so map oracle positions -> global ids
    keep = (pdf["conv_id"] >= "conv-00000006").to_numpy()
    import numpy as np

    global_ids = np.flatnonzero(keep)
    # the FULL battery re-runs post-compact — in particular the english
    # discriminator, which is what catches a compaction that loses the
    # index's analysis chain (the reader would re-analyze with "standard")
    for spec in BATTERY:
        role = spec.get("filter_role")
        exp = oracle_search(
            idx2, spec["q"], k=10, mode=spec["mode"], msm=spec.get("msm"),
            exclude=spec.get("exclude"), accept=_oracle_accept(idx2, role),
        )
        exp = [(int(global_ids[doc]), s) for doc, s in exp]
        got = [
            (r["doc_id"], r["score"])
            for r in search(
                spark, d, spec["q"], k=10, mode=spec["mode"],
                msm=spec.get("msm"), exclude=spec.get("exclude"),
                filter_cond=(F.col("role") == role) if role else None,
            ).collect()
        ]
        assert [g for g, _ in got] == [e for e, _ in exp], (
            f"post-compact {spec}: {got} != {exp}"
        )
        for (gd, gs), (_ed, es) in zip(got, exp):
            assert abs(gs - es) < 1e-5
