"""Index administration — IndexWriter.addIndexes / backup / rollback analogs.

``add_indexes`` re-expresses Lucene's ``IndexWriter.addIndexes(Directory...)``
(the codec participates through the same per-segment immutable files it
writes at flush, ``CuVS2510GPUVectorsWriter.java:143-147``): whole source
indexes are imported into a destination index as new segments. Our posting
blocks are delta-encoded against a per-block ``first_doc`` anchor
(operators/build.py POSTINGS_SCHEMA), so re-basing every imported docID by a
constant shift touches ONLY the tiny ``first_doc``/``last_doc`` stat columns
— the compressed gap/tf/norm payloads are copied verbatim, no decode. That
makes the import one narrow distributed column-rewrite per table, exactly
the property Lucene's addIndexes(CodecReader) loses (it re-merges) and
addIndexes(Directory) keeps (file copy + SegmentInfos splice).

Scale shape: per imported segment, one scan+write of postings (payload
bytes move once, no shuffle — the bucket partitioning is preserved by
``partitionBy``), one range-repartition of doc_dim (narrow dim table), one
verbatim dictionary copy. Source tombstones are portable (conv_id,
turn_idx) keys and are re-committed into the destination's delete table.
"""

from __future__ import annotations

import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.operators.build import DOC_DIM_CLUSTER_ROWS_PER_FILE
from cuvs_lucene_spark.sources.catalog import IndexCatalog

# compat contract: these build-time parameters define the wire/score format
# of an index; addIndexes requires them equal (Lucene likewise refuses
# incompatible field schemas / codecs at addIndexes time)
_COMPAT_KEYS = ("buckets", "positions", "fields", "analyzer")


def _compat_sig(seg: dict) -> tuple:
    return tuple(
        tuple(seg.get(k, [])) if isinstance(seg.get(k), list) else seg.get(k)
        for k in _COMPAT_KEYS
    )


def add_indexes(
    spark: SparkSession, dst_dir: str, *src_dirs: str, run_id: str | None = None
) -> list[dict]:
    """Import every live segment of each source index into ``dst_dir``.

    DocIDs of each source are re-based by the destination's
    ``next_doc_base()`` at import time, so global uniqueness and the
    docID-ascending tie-break stay intact; source tombstones are re-committed
    as destination tombstones (their keys are index-independent). Each
    imported segment is its own commit (crash leaves a prefix of the import,
    re-running imports the remainder — segment ids differ but results don't).

    Returns the new segment manifest entries. Raises ValueError when a
    source's build parameters (buckets/positions/fields/analyzer) differ
    from the destination's — term→bucket addressing and scores would
    otherwise be silently wrong.
    """
    from cuvs_lucene_spark.operators.deletes import delete_docs, read_delete_keys

    run_id = run_id or f"addidx-{uuid.uuid4().hex[:12]}"
    dst = IndexCatalog(dst_dir)
    dst_m = dst.validate_for_read()
    template = dst_m["segments"][0] if dst_m["segments"] else None

    imported: list[dict] = []
    for src_dir in src_dirs:
        src = IndexCatalog(src_dir)
        src_m = src.validate_for_read()
        if not src_m["segments"]:
            continue
        if template is None:
            template = src_m["segments"][0]
        for s in src_m["segments"]:
            if _compat_sig(s) != _compat_sig(template):
                raise ValueError(
                    f"incompatible index {src_dir!r}: segment {s['id']} "
                    f"{dict(zip(_COMPAT_KEYS, _compat_sig(s)))} != destination "
                    f"{dict(zip(_COMPAT_KEYS, _compat_sig(template)))}"
                )

        # one constant shift per SOURCE index: its docIDs are already global
        # and contiguous across its own segments
        shift = dst.next_doc_base()
        existing = dst.committed_segment_ids()
        next_id = max(existing, default=-1) + 1

        for s in sorted(src_m["segments"], key=lambda x: x["id"]):
            new_id = next_id
            next_id += 1

            # postings: payload copied verbatim; only the block-level docID
            # anchors shift (delta gaps are shift-invariant)
            p_src = src.read_postings(spark, seg_ids=[s["id"]])
            (
                p_src.withColumn("first_doc", F.col("first_doc") + F.lit(shift))
                .withColumn("last_doc", F.col("last_doc") + F.lit(shift))
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(dst.postings_path(new_id))
            )

            # doc_dim: shift ids, preserve the (role, ts) range-clustering the
            # filtered-search pruning relies on
            dd = src.read_doc_dim(spark, seg_ids=[s["id"]]).withColumn(
                "doc_id", F.col("doc_id") + F.lit(shift)
            )
            n_parts = max(
                1,
                min(
                    32768,
                    -(-int(s["total_rows"]) // DOC_DIM_CLUSTER_ROWS_PER_FILE),
                ),
            )
            (
                dd.repartitionByRange(n_parts, F.col("role"), F.col("ts"))
                .sortWithinPartitions("role", "ts")
                .write.mode("overwrite")
                .parquet(dst.doc_dim_path(new_id))
            )

            # dictionary: (field, term, bucket, df, cf, n_blocks) — docID-free
            spark.read.parquet(
                *(src._data_files(s["id"], "dictionary") or [src.dictionary_path(s["id"])])
            ).write.mode("overwrite").parquet(dst.dictionary_path(new_id))

            seg_meta = {
                **{k: s[k] for k in s if k not in ("id", "doc_base", "run_id", "timings")},
                "id": new_id,
                "doc_base": shift + int(s.get("doc_base", 0)),
                "run_id": run_id,
                "imported_from": {"index": src_dir, "segment": s["id"]},
            }
            dst.record_segment_files(new_id)
            dst.commit_segment(seg_meta)
            imported.append(seg_meta)

        # source tombstones travel as portable keys
        keys = read_delete_keys(spark, src)
        if keys is not None:
            delete_docs(spark, dst, keys)

    return imported
