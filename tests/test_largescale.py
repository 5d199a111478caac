"""Opt-in large-scale stress tier (`pytest -m largescale`).

Reference analog: the stress merge the reference gates behind
``-DlargeScale=true`` (``TestMerge.java:1034-1038``). One end-to-end life:
build the small tier (115k docs) as segment 0, stream three more conv-range
slices through the micro-batch sink under a size-tiered merge policy, then
delete a conv band, force-merge, and assert exact engine == numpy-oracle
equality over the full query surface at every phase — plus file-integrity
(check_files) and orphan-GC cleanliness at the end.

Excluded from the default run via pytest.ini's `addopts = -m "not
largescale"`; the driver's correctness gate and CI-time budget are
unaffected.
"""

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.operators.build import build_segment
from cuvs_lucene_spark.operators.deletes import delete_docs
from cuvs_lucene_spark.operators.merge import compact
from cuvs_lucene_spark.oracle import build_oracle_index, oracle_search
from cuvs_lucene_spark.query import IndexReader, count_matches, search
from cuvs_lucene_spark.sources.catalog import IndexCatalog
from cuvs_lucene_spark.streaming.ingest import stream_build

pytestmark = pytest.mark.largescale

# or / and / msm / exclude / filtered battery; every query also runs
# prune=True and must equal the exhaustive path exactly.
BATTERY = [
    {"q": "world school", "mode": "or"},
    {"q": "student country help", "mode": "or"},
    {"q": "the", "mode": "or"},                      # hottest term
    {"q": "merge w00350 zzabsent", "mode": "or"},
    {"q": "world school", "mode": "and"},
    {"q": "student country help problem", "mode": "or", "msm": 2},
    {"q": "world school", "mode": "or", "exclude": "country"},
    {"q": "world school", "mode": "or", "role": "user"},
]


def _engine(spark, idx, spec, k=10, prune=False):
    cond = (F.col("role") == spec["role"]) if "role" in spec else None
    return [
        (r["doc_id"], r["conv_id"], int(r["turn_idx"]), float(r["score"]))
        for r in search(
            spark, idx, spec["q"], k=k, mode=spec["mode"], filter_cond=cond,
            prune=prune, exclude=spec.get("exclude"), msm=spec.get("msm"),
        ).collect()
    ]


def _oracle(oidx, spec, k=10, extra_accept=None):
    accept = extra_accept
    if "role" in spec:
        mask = (oidx.meta["role"] == spec["role"]).to_numpy()
        accept = mask if accept is None else (mask & accept)
    out = []
    for doc, score in oracle_search(
        oidx, spec["q"], k=k, mode=spec["mode"], accept=accept,
        exclude=spec.get("exclude"), msm=spec.get("msm"),
    ):
        m = oidx.meta.iloc[doc]
        out.append((doc, str(m["conv_id"]), int(m["turn_idx"]), float(score)))
    return out


def _assert_phase(spark, idx, oidx, by_key=False, extra_accept=None):
    """Exact rank equality + 1e-5 scores for the battery; pruned ==
    exhaustive on each. by_key compares (conv_id, turn_idx) instead of
    doc_id (post-compaction the engine keeps STABLE global docIDs while a
    rebuilt oracle renumbers — keys are the invariant identity)."""
    for spec in BATTERY:
        exp = _oracle(oidx, spec, extra_accept=extra_accept)
        for prune in (False, True):
            if prune and spec.get("msm"):
                continue  # pruning+msm is rejected as unsound by design
            got = _engine(spark, idx, spec, prune=prune)
            g = [(r[1], r[2]) for r in got] if by_key else [r[0] for r in got]
            e = [(r[1], r[2]) for r in exp] if by_key else [r[0] for r in exp]
            assert g == e, (spec, prune, got, exp)
            for gr, er in zip(got, exp):
                assert abs(gr[3] - er[3]) < 1e-5, (spec, prune, gr, er)


@pytest.fixture(scope="module")
def small_pdf():
    from cuvs_lucene_spark.fixtures import TIERS, generate_transcripts

    return generate_transcripts(TIERS["small"]).to_pandas()


def test_largescale_lifecycle(spark, small_pdf, tmp_path_factory):
    root = tmp_path_factory.mktemp("largescale")
    idx = str(root / "idx")

    # -- 4 conv-range quartiles (sorted ranges: segment-local docID
    # assignment + sequential doc_base reproduces the global rank order the
    # oracle assigns over the full corpus) --
    convs = sorted(small_pdf["conv_id"].unique())
    cuts = [convs[i * len(convs) // 4] for i in range(1, 4)]
    bounds = [None, *cuts, None]
    sdf = spark.createDataFrame(small_pdf)
    quarts = []
    for i in range(4):
        part = sdf
        if bounds[i] is not None:
            part = part.where(F.col("conv_id") >= bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("conv_id") < bounds[i + 1])
        quarts.append(part)

    # -- phase 1: batch-build the first quartile, stream the rest under a
    # tiered merge policy. segment_id=1000: the streaming sink derives
    # segment ids from micro-batch ids (0, 1, 2, ...), and build_segment is
    # idempotent BY segment id — a colliding id would silently no-op the
    # first micro-batch. doc_base ordering comes from commit order, not id,
    # so global docIDs still follow conv-range rank order. --
    build_segment(
        spark, quarts[0], idx, segment_id=1000,
        buckets=8, salt_buckets=4, hot_df_ratio=0.10, hot_sample_fraction=1.0,
    )
    src = str(root / "src")
    for i in (1, 2, 3):
        d = os.path.join(src, f"q{i}")
        quarts[i].coalesce(1).write.parquet(d)
        # FileStreamSource orders by mtime: force strictly increasing stamps
        # so micro-batches (→ doc_base) arrive in conv-range order
        stamp = time.time() + i * 10
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (stamp, stamp))
    stream_df = (
        spark.readStream.schema(sdf.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    q = stream_build(
        stream_df, idx, str(root / "ckpt"), tiered_max_segments=3,
        buckets=8, salt_buckets=4, hot_df_ratio=0.10, hot_sample_fraction=1.0,
    )
    q.awaitTermination(600)

    cat = IndexCatalog(idx)
    assert len(cat.read_manifest()["segments"]) <= 3  # tiered policy held
    rd = IndexReader(spark, idx)
    oidx = build_oracle_index(small_pdf)
    assert rd.n_docs == oidx.n_docs and abs(rd.avgdl - oidx.avgdl) < 1e-9

    _assert_phase(spark, idx, oidx)

    # count == search row count at k=N
    for spec in BATTERY[:4]:
        n = count_matches(spark, idx, spec["q"], mode=spec["mode"])
        full = _engine(spark, idx, spec, k=rd.n_docs)
        assert n == len(full), spec

    # searchAfter pagination: two k=5 pages == top-10, under prune too
    for prune in (False, True):
        top10 = _engine(spark, idx, BATTERY[0], k=10, prune=prune)
        p1 = search(spark, idx, BATTERY[0]["q"], k=5, prune=prune).collect()
        after = (float(p1[-1]["score"]), int(p1[-1]["doc_id"]))
        p2 = search(spark, idx, BATTERY[0]["q"], k=5, prune=prune, after=after).collect()
        got = [int(r["doc_id"]) for r in p1 + p2]
        assert got == [r[0] for r in top10], prune

    # -- phase 2: delete a conv band (tombstones; stats unchanged pre-merge,
    # Lucene semantics) --
    lo, hi = cuts[0], cuts[1]
    keys = sdf.where((F.col("conv_id") >= lo) & (F.col("conv_id") < hi)).select(
        "conv_id", "turn_idx"
    )
    n_del = delete_docs(spark, idx, keys)
    assert n_del > 0
    live_mask = ~(
        (oidx.meta["conv_id"] >= lo) & (oidx.meta["conv_id"] < hi)
    ).to_numpy()
    _assert_phase(spark, idx, oidx, extra_accept=live_mask)

    # -- phase 3: force-merge; purged docs leave the stats; docIDs stay
    # stable; oracle = rebuild over the surviving rows, compared by key --
    compact(spark, idx)
    survivors = small_pdf[
        ~((small_pdf["conv_id"] >= lo) & (small_pdf["conv_id"] < hi))
    ].reset_index(drop=True)
    oidx2 = build_oracle_index(survivors)
    rd2 = IndexReader(spark, idx)
    assert rd2.n_docs == oidx2.n_docs and abs(rd2.avgdl - oidx2.avgdl) < 1e-9
    _assert_phase(spark, idx, oidx2, by_key=True)

    # -- integrity: every committed file intact, no orphans survive GC --
    rep = cat.check_files()
    for sid in rep:
        assert rep[sid]["files"] > 0
    gc = cat.gc_orphans(grace_seconds=0)
    assert all(not v["kept"] for v in gc.values())
    assert all(not o for s in cat.check_files().values() for o in s["orphans"])
