"""Structured Streaming ingest: continuous transcript feed → index segments.

The reference is batch-only (flush/merge; no streaming surface anywhere in
``src/main/`` — SURVEY.md §1.2), but its segment lifecycle maps directly onto
micro-batches: each micro-batch is one "flush" (accumulate → build → commit),
and the periodic compaction job (operators/merge.py) plays TieredMergePolicy.

Exactly-once: ``foreachBatch`` may replay a batch after failure; segment_id
is the stream's batch_id, and ``build_segment`` is a committed-id no-op on
replay (the manifest is the idempotence ledger — same mechanism as the
checkpoint-resume path, ``CuVS2510GPUVectorsWriter.java:521-524`` analog).

Scale notes: each micro-batch build is the same one-wide-shuffle job as the
batch build; segment count grows with stream lifetime, so a compaction
trigger (``compact_every``) folds segments back to one, bounding per-query
fan-out. Late/out-of-order data is fine — docIDs are segment-local + base,
and BM25 global stats are summed across segments at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cuvs_lucene_spark.operators.build import build_segment
from cuvs_lucene_spark.operators.merge import compact, tiered_compact
from cuvs_lucene_spark.sources.catalog import IndexCatalog


def make_batch_sink(
    index_dir: str,
    compact_every: int | None = None,
    tiered_max_segments: int | None = None,
    segment_id_offset: int = 0,
    retain_commits: int | None = None,
    **build_kwargs,
):
    """Returns a foreachBatch(batch_df, batch_id) callable that builds one
    segment per non-empty micro-batch, then applies the merge policy:

    - tiered_max_segments=N — size-tiered policy (the long-running-stream
      default you want: each trigger merges only the small tail, cost
      proportional to the tail, segment count bounded at N)
    - compact_every=N — full forceMerge(1) once N segments accumulate
      (rewrites the whole index each time; fine for short backfills)

    segment_id = segment_id_offset + batch_id. When the stream targets an
    index that ALREADY holds batch-built segments, pass an offset above
    their ids: build_segment is idempotent BY id (that idempotence IS the
    exactly-once ledger on micro-batch replay), so a colliding id would
    silently drop the micro-batch — the sink raises instead. The offset
    must be a constant for the stream's lifetime (a value derived from the
    manifest at sink-construction time would change across restarts and
    break replay idempotence).

    retain_commits=K — commit-history retention for long-running streams
    (every micro-batch commit lands an immutable commits/ copy, which would
    otherwise accrete forever): after each trigger, keep only the newest K
    commits and reclaim segment dirs / tombstone batches no retained commit
    references (prune_commits + gc). Point-in-time readers older than the
    window lose their snapshots — that is the retention contract, exactly
    Lucene's IndexDeletionPolicy releasing old commit points."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        sid = segment_id_offset + int(batch_id)
        existing = IndexCatalog(index_dir).read_manifest()["segments"]
        clash = next((s for s in existing if s["id"] == sid), None)
        if clash is not None and clash.get("run_id") != f"stream-{sid}":
            raise ValueError(
                f"segment id {sid} already committed by a non-stream build "
                f"(run_id={clash.get('run_id')!r}); pass segment_id_offset "
                f"above the existing ids"
            )
        build_segment(
            spark, batch_df, index_dir, segment_id=sid,
            run_id=f"stream-{sid}", **build_kwargs,
        )
        if tiered_max_segments:
            tiered_compact(spark, index_dir, max_segments=tiered_max_segments)
        elif compact_every:
            n_segs = len(IndexCatalog(index_dir).read_manifest()["segments"])
            if n_segs >= compact_every:
                compact(spark, index_dir)
        if retain_commits:
            from cuvs_lucene_spark.operators.deletes import gc_orphan_deletes

            cat = IndexCatalog(index_dir)
            cat.prune_commits(keep_last=retain_commits)
            cat.gc_segments()
            gc_orphan_deletes(cat)

    return sink


def stream_build(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
    tiered_max_segments: int | None = None,
    trigger_available_now: bool = True,
    **build_kwargs,
):
    """Wire a streaming transcripts DataFrame into the index: returns the
    started StreamingQuery. With trigger_available_now the stream drains the
    currently-available input and stops (the batch-backfill/testing mode);
    without it, it runs continuously on the default micro-batch trigger."""
    writer = (
        stream_df.writeStream.foreachBatch(
            make_batch_sink(index_dir, compact_every, tiered_max_segments, **build_kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
