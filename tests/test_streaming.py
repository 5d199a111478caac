"""Streaming ingest tests: micro-batch → segment pipeline (exactly-once via
the manifest ledger), equivalence with the one-shot batch build."""

import os

import pytest
from pyspark.sql import functions as F

from cuvs_lucene_spark.query import IndexReader, search
from cuvs_lucene_spark.sources.catalog import IndexCatalog
from cuvs_lucene_spark.streaming.ingest import stream_build


@pytest.fixture(scope="module")
def streamed_index(spark, tiny_df, tmp_path_factory):
    """Feed the tiny corpus through a file-source stream, one file per
    micro-batch (two conv_id-range files → two segments)."""
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "src")
    cut = "conv-00000100"
    tiny_df.where(F.col("conv_id") < cut).coalesce(1).write.parquet(
        os.path.join(src, "half0")
    )
    tiny_df.where(F.col("conv_id") >= cut).coalesce(1).write.parquet(
        os.path.join(src, "half1")
    )
    idx = str(root / "idx")
    stream_df = (
        spark.readStream.schema(tiny_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    q = stream_build(
        stream_df, idx, str(root / "ckpt"),
        buckets=8, salt_buckets=4, hot_df_ratio=0.10,
    )
    q.awaitTermination(300)
    return idx


def test_stream_builds_segments(spark, streamed_index):
    segs = IndexCatalog(streamed_index).read_manifest()["segments"]
    assert len(segs) >= 2  # one per micro-batch file


def test_stream_equals_batch_build(spark, streamed_index, tiny_index):
    rd_s, rd_b = IndexReader(spark, streamed_index), IndexReader(spark, tiny_index)
    assert (rd_s.n_docs, rd_s.sum_dl) == (rd_b.n_docs, rd_b.sum_dl)

    def keyed(idx, q):
        res = search(spark, idx, q, k=10).collect()
        dd = {
            r["doc_id"]: (r["conv_id"], r["turn_idx"])
            for r in IndexReader(spark, idx).cat.read_doc_dim(spark)
            .where(F.col("doc_id").isin([x["doc_id"] for x in res]))
            .collect()
        }
        return [(dd[r["doc_id"]], round(float(r["score"]), 5)) for r in res]

    for q in ["world school", "student country help"]:
        assert keyed(streamed_index, q) == keyed(tiny_index, q)


# ---------------------------------------------------------------------------
# Watermarked windowed rollup + stateful conversation accumulator
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def rollup_env(spark, tiny_df, tmp_path_factory):
    """Drain the tiny corpus through the append-mode windowed rollup once;
    returns (src, out, ckpt, schema) for follow-up late-data runs."""
    from cuvs_lucene_spark.streaming.rollup import rollup_to_parquet

    root = tmp_path_factory.mktemp("rollup")
    src, out, ckpt = (str(root / p) for p in ("src", "out", "ckpt"))
    tiny_df.coalesce(1).write.parquet(os.path.join(src, "f0"))
    stream = spark.readStream.schema(tiny_df.schema).parquet(os.path.join(src, "*"))
    q = rollup_to_parquet(stream, out, ckpt, window="1 hour", watermark="2 hours")
    q.awaitTermination(300)
    return src, out, ckpt


def test_windowed_rollup_matches_batch(spark, tiny_df, rollup_env):
    """Append-mode windows must (a) carry exactly the batch-computed counts,
    (b) include every window that is safely below the final watermark, and
    (c) never include a window the watermark has not passed."""
    from cuvs_lucene_spark.analysis import tokenize_col

    _, out, _ = rollup_env
    got = {
        (r["window_start"], r["term"]): r["cnt"]
        for r in spark.read.parquet(out).collect()
    }
    assert got
    batch = {
        (r["w"]["start"], r["term"]): r["cnt"]
        for r in tiny_df.select(
            F.col("ts").cast("timestamp").alias("ts"),
            F.explode(tokenize_col(F.col("text"))).alias("term"),
        )
        .groupBy(F.window("ts", "1 hour").alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert all(batch[k] == v for k, v in got.items())  # (a) exact counts
    max_ts = tiny_df.agg(F.max(F.col("ts").cast("timestamp"))).first()[0]
    import datetime

    safe_cut = max_ts - datetime.timedelta(hours=3, minutes=1)  # watermark+window
    missing = [
        k for k in batch
        if k[0] < safe_cut and k not in got
    ]
    assert not missing  # (b) completeness below the watermark
    emitted_past_wm = [
        s for (s, _t) in got if s > max_ts - datetime.timedelta(hours=2)
    ]
    assert not emitted_past_wm  # (c) nothing the watermark hasn't passed


def test_late_rows_beyond_watermark_dropped(spark, tiny_df, rollup_env):
    """A second drain whose new file contains ONLY rows older than the
    recovered watermark must emit nothing: those windows are finalized and
    the rows are dropped — state stays bounded, results stay exactly-once."""
    from cuvs_lucene_spark.streaming.rollup import rollup_to_parquet

    src, out, ckpt = rollup_env
    before = spark.read.parquet(out).count()
    late = tiny_df.orderBy("conv_id", "turn_idx").limit(50)  # oldest rows
    late.coalesce(1).write.parquet(os.path.join(src, "f1_late"))
    stream = spark.readStream.schema(tiny_df.schema).parquet(os.path.join(src, "*"))
    q = rollup_to_parquet(stream, out, ckpt, window="1 hour", watermark="2 hours")
    q.awaitTermination(300)
    assert spark.read.parquet(out).count() == before


def test_conversation_state_matches_batch(spark, tiny_df, tmp_path):
    """Final applyInPandasWithState emission per conv == the batch aggregate
    (turns, analyzer-token count, max turn_idx, last ts) over the same data,
    with the stream split into two micro-batches to exercise state carry."""
    from cuvs_lucene_spark.analysis import tokenize_col
    from cuvs_lucene_spark.streaming.rollup import conversation_state

    src = str(tmp_path / "src")
    sub = tiny_df.where(F.col("conv_id") < "conv-00000020")
    sub.where(F.col("turn_idx") < 5).coalesce(1).write.parquet(os.path.join(src, "a"))
    sub.where(F.col("turn_idx") >= 5).coalesce(1).write.parquet(os.path.join(src, "b"))
    stream = (
        spark.readStream.schema(tiny_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    q = (
        conversation_state(stream)
        .writeStream.format("memory")
        .queryName("conv_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    upd = spark.sql("SELECT * FROM conv_state").toPandas()
    # keep the LAST update per conv (updates arrive in batch order; the
    # final values are the max-n_turns row per conv)
    final = {
        r.conv_id: (r.n_turns, r.n_tokens, r.max_turn_idx)
        for _, r in upd.sort_values(["conv_id", "n_turns"]).iterrows()
    }
    batch = {
        r["conv_id"]: (r["n"], r["tok"], r["mt"])
        for r in sub.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.array_size(tokenize_col(F.col("text"))), F.lit(0))).alias("tok"),
            F.max("turn_idx").alias("mt"),
        )
        .collect()
    }
    assert final == batch


def test_stream_with_tiered_policy_bounds_segments(spark, tiny_df, tmp_path):
    """A stream ingesting 3 micro-batches under tiered_max_segments=2 must
    end with ≤ 2 live segments and the same doc/stat totals as one batch."""
    root = tmp_path
    src = str(root / "src")
    cuts = ["conv-00000070", "conv-00000140"]
    parts = [
        tiny_df.where(F.col("conv_id") < cuts[0]),
        tiny_df.where((F.col("conv_id") >= cuts[0]) & (F.col("conv_id") < cuts[1])),
        tiny_df.where(F.col("conv_id") >= cuts[1]),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
    idx = str(root / "idx")
    stream = (
        spark.readStream.schema(tiny_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    q = stream_build(
        stream, idx, str(root / "ckpt"), tiered_max_segments=2,
        buckets=8, salt_buckets=4, hot_df_ratio=0.10,
    )
    q.awaitTermination(300)
    segs = IndexCatalog(idx).read_manifest()["segments"]
    assert len(segs) <= 2
    rd = IndexReader(spark, idx)
    n = tiny_df.where(F.coalesce(F.length("text"), F.lit(0)) > 0).count()
    assert rd.n_docs > 0 and rd.n_docs <= n
    # results at the API surface: same hits as a fresh exhaustive search
    assert search(spark, idx, "world school", k=5).count() == 5


def test_stream_retention_bounds_commit_history(spark, tiny_df, tmp_path):
    """A long-running stream with retain_commits=2 must not accrete commit
    copies or merged-away segment dirs: after 3 micro-batches + tiered
    merges, ≤2 retained commits, gc'd segment dirs, and live results intact
    (the IndexDeletionPolicy release semantics)."""
    root = tmp_path
    src = str(root / "src")
    cuts = ["conv-00000070", "conv-00000140"]
    parts = [
        tiny_df.where(F.col("conv_id") < cuts[0]),
        tiny_df.where((F.col("conv_id") >= cuts[0]) & (F.col("conv_id") < cuts[1])),
        tiny_df.where(F.col("conv_id") >= cuts[1]),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(os.path.join(src, f"f{i}"))
    idx = str(root / "idx")
    stream = (
        spark.readStream.schema(tiny_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    q = stream_build(
        stream, idx, str(root / "ckpt"), tiered_max_segments=2,
        retain_commits=2, buckets=8, salt_buckets=4, hot_df_ratio=0.10,
    )
    q.awaitTermination(300)
    cat = IndexCatalog(idx)
    commits = cat.list_commits()
    assert len(commits) <= 2
    assert commits[-1]["version"] == cat.read_manifest()["version"]
    # every on-disk segment dir is referenced by a retained commit
    from cuvs_lucene_spark.sources import fs as xfs

    on_disk = {
        int(e.split("=", 1)[1])
        for e in xfs.listdir(idx)
        if e.startswith("seg=")
    }
    assert on_disk <= cat.referenced_segment_ids()
    cat.check_index()
    assert search(spark, idx, "world school", k=5).count() == 5


# ---------------------------------------------------------------------------
# Conversation sessionization (event-time session windows)
# ---------------------------------------------------------------------------

def _session_spec(rows, gap_s):
    """Independent sessionization: sort each conv by ts, split when the
    inter-turn gap is >= gap_s (Spark merges events strictly closer than the
    gap; an event exactly gap_s later starts a new session since the prior
    session ended at last+gap), session_end = last_ts + gap_s."""
    import collections
    import datetime

    by = collections.defaultdict(list)
    for conv, ts, ntok in rows:
        by[conv].append((ts, ntok))
    out = []
    for conv, evs in by.items():
        evs.sort()
        cur = [evs[0]]
        for ev in evs[1:]:
            if (ev[0] - cur[-1][0]).total_seconds() >= gap_s:
                out.append((conv, cur))
                cur = []
            cur.append(ev)
        out.append((conv, cur))
    return sorted(
        (
            conv,
            evs[0][0],
            evs[-1][0] + datetime.timedelta(seconds=gap_s),
            len(evs),
            sum(n for _, n in evs),
        )
        for conv, evs in out
    )


def test_conversation_sessions_match_independent_spec(spark, tmp_path):
    """Batch sessionization == independent pandas spec; streaming append
    emits exactly the finalized sessions (end <= max_ts - watermark)."""
    import datetime

    from cuvs_lucene_spark.analysis import analyze_py
    from cuvs_lucene_spark.streaming.rollup import (
        conversation_sessions,
        sessions_to_parquet,
    )

    base = datetime.datetime(2026, 1, 1)
    rows = []
    # conv A: two bursts 10 min apart (gap 5 min -> 2 sessions)
    for i in range(4):
        rows.append(("A", base + datetime.timedelta(seconds=30 * i), "hello world"))
    for i in range(3):
        rows.append(("A", base + datetime.timedelta(minutes=10, seconds=45 * i), "more text here"))
    # conv B: one burst
    for i in range(5):
        rows.append(("B", base + datetime.timedelta(minutes=2, seconds=20 * i), "b text"))
    # conv C: a late straggler burst near the end of the stream (must stay
    # OPEN under the watermark and not be emitted by the streaming drain)
    tail = base + datetime.timedelta(hours=3)
    rows.append(("C", tail, "late arrival"))

    df = spark.createDataFrame(
        [(c, t, x) for c, t, x in rows], "conv_id string, ts timestamp, text string"
    )
    got = sorted(
        (r["conv_id"], r["session_start"], r["session_end"], r["n_turns"], r["n_tokens"])
        for r in conversation_sessions(df, gap="5 minutes").collect()
    )
    spec = _session_spec(
        [(c, t, len(analyze_py(x, "standard"))) for c, t, x in rows], 300
    )
    assert got == spec
    assert len([s for s in spec if s[0] == "A"]) == 2  # the gap really split

    # streaming drain: only sessions finalized by the watermark emit
    src, out, ckpt = (str(tmp_path / p) for p in ("src", "out", "ckpt"))
    df.coalesce(1).write.parquet(os.path.join(src, "f0"))
    stream = spark.readStream.schema(df.schema).parquet(os.path.join(src, "*"))
    q = sessions_to_parquet(stream, out, ckpt, gap="5 minutes", watermark="1 hour")
    q.awaitTermination(300)
    emitted = sorted(
        (r["conv_id"], r["session_start"], r["session_end"], r["n_turns"], r["n_tokens"])
        for r in spark.read.parquet(out).collect()
    )
    max_ts = tail
    cut = max_ts - datetime.timedelta(hours=1)
    finalized = [s for s in spec if s[2] <= cut]
    assert emitted == finalized
    assert all(s[0] != "C" for s in emitted)  # open session held back


def test_stream_exact_dedup_first_arrival_wins(spark, tmp_path):
    """Planted key and content duplicates within the watermark collapse to
    one row; distinct rows all survive."""
    import datetime

    from cuvs_lucene_spark.streaming.rollup import stream_exact_dedup

    base = datetime.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, base, "hello world"),
        ("c1", 0, base + datetime.timedelta(minutes=1), "hello world RETRY"),
        ("c1", 1, base, "second turn"),
        ("c2", 0, base + datetime.timedelta(minutes=2), "other conv"),
        # content dup under different keys (producer re-delivery)
        ("c3", 0, base + datetime.timedelta(minutes=3), "second turn"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, text string"
    )
    src, out, ckpt, out2, ckpt2 = (
        str(tmp_path / p) for p in ("src", "out", "ckpt", "out2", "ckpt2")
    )
    df.coalesce(1).write.parquet(os.path.join(src, "f0"))

    def drain(by_content, o, c):
        stream = spark.readStream.schema(df.schema).parquet(os.path.join(src, "*"))
        q = (
            stream_exact_dedup(stream, by_content=by_content)
            .writeStream.format("parquet")
            .option("path", o).option("checkpointLocation", c)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        return spark.read.parquet(o).collect()

    keyed = drain(False, out, ckpt)
    assert len(keyed) == 4  # key dup (c1,0) collapsed
    assert sorted((r["conv_id"], r["turn_idx"]) for r in keyed) == [
        ("c1", 0), ("c1", 1), ("c2", 0), ("c3", 0)
    ]
    by_content = drain(True, out2, ckpt2)
    texts = sorted(r["text"] for r in by_content)
    # exact-content dup ("second turn" twice) collapsed; RETRY text differs
    assert texts == ["hello world", "hello world RETRY", "other conv",
                     "second turn"]
