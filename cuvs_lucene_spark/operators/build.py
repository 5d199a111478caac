"""Index build pipeline — the Spark re-expression of flush (SURVEY.md §3.1).

Reference lifecycle: accumulate → flush per segment → serialize with
offsets/meta → commit (``CuVS2510GPUVectorsWriter.java:300-310,521-537``).
Spark re-expression, one job with exactly ONE wide data shuffle:

  read transcripts
    → repartitionByRange(conv_id, turn_idx) + docID assignment   (narrow-ish)
    → tokenize (JVM regex — whole-stage codegen, no Python)
    → explode → groupBy(term, doc_id) partial-agg tf              (THE shuffle)
    → salt hot terms → groupBy(bucket, term, salt)
        applyInPandas(encode_blocks)                              (Arrow kernel)
    → write postings partitioned by bucket; dictionary + lineage from
      a cheap metadata re-scan of the written blocks.

Scale notes (100 TB / 10^12 turns):
  * hot-term detection is sample-based (deterministic seed) so no exact
    full-vocab aggregation sits on the critical path; the EXACT dictionary is
    derived afterwards from the written block metadata (tiny).
  * postings blocks store GLOBAL docIDs (doc_base baked in at build), the
    lesson of the reference's merge-time id remap
    (``Lucene99AcceleratedHNSWVectorsWriter.java:352-366``): merges then never
    rebase, they just re-block.
  * per-posting quantized norms travel INSIDE the block (1 byte/posting), so
    query-time scoring needs no join against a norms table.
"""

from __future__ import annotations

import datetime as _dt
import uuid
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.analysis import (
    BM25_B,
    BM25_K1,
    dequantize_dl_np,
    tokenize_col,
    with_quantized_dl,
)
from cuvs_lucene_spark.codec import BLOCK_SIZE, encode_gaps, encode_u32
from cuvs_lucene_spark.operators.doc_ids import assign_doc_ids
from cuvs_lucene_spark.sources.catalog import IndexCatalog

POSTINGS_SCHEMA = (
    "bucket int, term string, salt int, block_id int, "
    "first_doc long, last_doc long, doc_count int, cf long, "
    "doc_gaps binary, tfs binary, dls binary, "
    "max_tf int, min_dl_d long, max_tf_norm float, n_bytes int"
)


def _encode_sorted_rows(
    bucket: np.ndarray,
    term: np.ndarray,
    salt: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dl_qs: np.ndarray,
    avgdl: float,
    block_size: int,
) -> pd.DataFrame:
    """Encode rows already sorted by (bucket, term, salt, doc_id) into block
    rows. Group boundaries found vectorized (np boundary scan), so Python-level
    work is O(#blocks), never O(#groups-via-Spark): the analog of the
    reference's per-node block encoder (sort ids, delta encode, write
    counts+gaps, record per-node byte sizes —
    ``Lucene99AcceleratedHNSWVectorsWriter.java:438-487``) plus Lucene-style
    per-block impacts: (max_tf, min_dl_d) is a bound-safe input to Block-Max
    WAND (score increasing in tf, decreasing in dl ⇒
    score(tf,dl) ≤ score(max_tf, min_dl) for every posting in the block).
    """
    n = len(doc_ids)
    change = np.ones(n, dtype=bool)
    if n > 1:
        change[1:] = (
            (bucket[1:] != bucket[:-1])
            | (term[1:] != term[:-1])
            | (salt[1:] != salt[:-1])
        )
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)

    dl_d_all = dequantize_dl_np(dl_qs)
    k_all = BM25_K1 * (1.0 - BM25_B + BM25_B * dl_d_all.astype(np.float64) / avgdl)
    tf_norm_all = tfs.astype(np.float64) / (tfs.astype(np.float64) + k_all)

    cols: dict[str, list] = {c: [] for c in (
        "bucket", "term", "salt", "block_id", "first_doc", "last_doc",
        "doc_count", "cf", "doc_gaps", "tfs", "dls", "max_tf", "min_dl_d",
        "max_tf_norm", "n_bytes",
    )}
    for s, e in zip(starts, ends):
        bid = 0
        for b0 in range(s, e, block_size):
            b1 = min(b0 + block_size, e)
            d = doc_ids[b0:b1]
            t = tfs[b0:b1]
            gaps_b = encode_gaps(d)
            tfs_b = encode_u32(t)
            dls_b = encode_u32(dl_qs[b0:b1])
            cols["bucket"].append(int(bucket[s]))
            cols["term"].append(term[s])
            cols["salt"].append(int(salt[s]))
            cols["block_id"].append(bid)
            cols["first_doc"].append(int(d[0]))
            cols["last_doc"].append(int(d[-1]))
            cols["doc_count"].append(b1 - b0)
            cols["cf"].append(int(t.sum()))
            cols["doc_gaps"].append(gaps_b)
            cols["tfs"].append(tfs_b)
            cols["dls"].append(dls_b)
            cols["max_tf"].append(int(t.max()))
            cols["min_dl_d"].append(int(dl_d_all[b0:b1].min()))
            cols["max_tf_norm"].append(float(tf_norm_all[b0:b1].max()))
            cols["n_bytes"].append(len(gaps_b) + len(tfs_b) + len(dls_b))
            bid += 1
    return pd.DataFrame(cols)


def make_partition_encoder(avgdl: float, block_size: int = BLOCK_SIZE):
    """mapInPandas kernel over a partition PRE-SORTED by
    (bucket, term, salt, doc_id): stream Arrow batches, carry the trailing
    (possibly incomplete) group across batch boundaries, emit block rows.

    This replaces a groupBy(term).applyInPandas design: with a 50k-term
    vocabulary the per-group Arrow round-trip overhead dominates build time;
    here the per-Python-call unit is a whole partition batch (10k rows), so
    overhead is O(#partitions), not O(#terms) — the difference between 10^2
    and 10^7 Python crossings at 10^12-turn scale.
    """

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if not len(pdf):
                continue
            b = pdf["bucket"].to_numpy()
            t = pdf["term"].to_numpy()
            s = pdf["salt"].to_numpy()
            change = np.ones(len(pdf), dtype=bool)
            change[1:] = (b[1:] != b[:-1]) | (t[1:] != t[:-1]) | (s[1:] != s[:-1])
            last_start = int(np.flatnonzero(change)[-1])
            if last_start == 0:
                pending = pdf  # single (possibly spanning) group: keep buffering
                continue
            head = pdf.iloc[:last_start]
            pending = pdf.iloc[last_start:].reset_index(drop=True)
            yield _encode_sorted_rows(
                b[:last_start], t[:last_start], s[:last_start],
                head["doc_id"].to_numpy(), head["tf"].to_numpy(),
                head["dl_q"].to_numpy(), avgdl, block_size,
            )
        if pending is not None and len(pending):
            yield _encode_sorted_rows(
                pending["bucket"].to_numpy(), pending["term"].to_numpy(),
                pending["salt"].to_numpy(), pending["doc_id"].to_numpy(),
                pending["tf"].to_numpy(), pending["dl_q"].to_numpy(),
                avgdl, block_size,
            )

    return encode


def encode_postings(
    spark: SparkSession,
    salted: DataFrame,
    avgdl: float,
    buckets: int,
    block_size: int = BLOCK_SIZE,
) -> DataFrame:
    """(term, doc_id, tf, dl_q, salt, bucket) rows → posting block rows.

    Co-locates each (bucket, salt) slice, sorts so every (term, salt) posting
    list is contiguous and docID-ascending, then streams whole partitions
    through the Arrow encoder (O(#partitions) Python crossings — see
    make_partition_encoder). Shared by the initial build and compaction.
    """
    enc_parts = max(buckets, int(spark.conf.get("spark.sql.shuffle.partitions")))
    return (
        salted.repartition(enc_parts, "bucket", "salt")
        .sortWithinPartitions("bucket", "term", "salt", "doc_id")
        .mapInPandas(make_partition_encoder(avgdl, block_size), POSTINGS_SCHEMA)
    )


def prepare_docs(df: DataFrame, doc_base: int = 0, num_partitions: int | None = None) -> DataFrame:
    """transcripts → docs with global doc_id, dl, quantized norms.

    Deliberately does NOT materialize a tokens column: persisting token
    arrays for a 100 TB corpus is infeasible, so dl is computed in one JVM
    expression here and the tf stage re-tokenizes from text (tokenization is
    codegen'd JVM work — recomputing it is cheaper at scale than caching it).
    """
    docs = assign_doc_ids(df, num_partitions)
    if doc_base:
        docs = docs.withColumn("doc_id", F.col("doc_id") + F.lit(doc_base))
    docs = docs.withColumn(
        "dl", F.coalesce(F.array_size(tokenize_col("text")), F.lit(0)).cast("long")
    )
    return with_quantized_dl(docs, "dl")


def detect_hot_terms(
    tf: DataFrame,
    n_docs: int,
    hot_df_ratio: float = 0.05,
    sample_fraction: float = 1.0,
) -> list[str]:
    """Terms whose df exceeds hot_df_ratio * n_docs → get salted.

    sample_fraction < 1 switches to the deterministic sampled estimator (the
    scale path — avoids an exact full-vocab agg before the postings build;
    salting correctness does not depend on WHICH terms are salted, only block
    layout does, so an estimate is safe).
    """
    src = tf if sample_fraction >= 1.0 else tf.sample(fraction=sample_fraction, seed=42)
    thresh = hot_df_ratio * n_docs * (sample_fraction if sample_fraction < 1.0 else 1.0)
    rows = (
        src.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_est"))
        .where(F.col("df_est") > F.lit(thresh))
        .select("term")
        .collect()
    )
    return sorted(r["term"] for r in rows)


def build_segment(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    segment_id: int = 0,
    *,
    buckets: int = 32,
    salt_buckets: int = 8,
    hot_df_ratio: float = 0.05,
    hot_sample_fraction: float = 1.0,
    block_size: int = BLOCK_SIZE,
    run_id: str | None = None,
) -> dict:
    """Build + commit one segment; returns its manifest entry.

    Idempotent/resumable: if the manifest already lists segment_id, this is a
    no-op (checkpoint-resume, north_rule; analog of the reference's finish()
    idempotence guard ``CuVS2510GPUVectorsWriter.java:521-524``).
    """
    cat = IndexCatalog(index_dir)
    existing = cat.read_manifest()["segments"]
    if segment_id in {s["id"] for s in existing}:
        return next(s for s in existing if s["id"] == segment_id)
    if existing:
        # bucket layout must agree across segments: the query planner prunes
        # partitions with one term→bucket map for the whole index
        buckets = existing[0]["buckets"]
    run_id = run_id or uuid.uuid4().hex[:12]
    doc_base = cat.next_doc_base()

    docs = prepare_docs(transcripts, doc_base).persist()
    stats = docs.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ).collect()[0]
    total_rows, n_docs, sum_dl = stats["total_rows"], int(stats["n_docs"]), int(stats["sum_dl"])
    avgdl = sum_dl / n_docs if n_docs else 1.0

    # doc_dim: ord↔docID map + norms (reference ordToDoc,
    # CuVS2510GPUVectorsReader.java:385; Lucene norms, SmallFloat-quantized)
    docs.select(
        "doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "dl", "dl_q", "dl_d"
    ).write.mode("overwrite").parquet(cat.doc_dim_path(segment_id))

    # THE wide shuffle: token stream → per-(term, doc) tf with map-side combine
    tf = (
        docs.where(F.col("dl") > 0)
        .select("doc_id", "dl_q", F.explode(tokenize_col("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl_q").alias("dl_q"))
    )

    hot = detect_hot_terms(tf, n_docs, hot_df_ratio, hot_sample_fraction)
    hot_lit = F.array(*[F.lit(t) for t in hot]) if hot else F.array().cast("array<string>")
    salted = tf.withColumn(
        "salt",
        F.when(
            F.array_contains(hot_lit, F.col("term")),
            F.pmod(F.col("doc_id"), F.lit(salt_buckets)).cast("int"),
        ).otherwise(F.lit(0)),
    ).withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(buckets)).cast("int"))

    blocks = encode_postings(spark, salted, avgdl, buckets, block_size)
    blocks.write.mode("overwrite").partitionBy("bucket").parquet(
        cat.postings_path(segment_id)
    )

    # Exact dictionary + per-bucket lineage metrics from the written blocks —
    # a metadata-sized re-scan: only small stat columns are read (byte counts
    # were recorded per block at encode time), never the binary payloads.
    written = spark.read.parquet(cat.postings_path(segment_id))
    written.groupBy("term").agg(
        F.min("bucket").alias("bucket"),
        F.sum("doc_count").alias("df"),
        F.sum("cf").alias("cf"),
        F.count(F.lit(1)).alias("n_blocks"),
    ).write.mode("overwrite").parquet(cat.dictionary_path(segment_id))

    per_bucket = (
        written.groupBy("bucket")
        .agg(
            F.sum("doc_count").alias("postings"),
            F.sum("n_bytes").alias("bytes"),
        )
        .collect()
    )
    now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    cat.append_lineage(
        spark,
        [
            (run_id, segment_id, int(r["bucket"]), "committed", n_docs,
             int(r["postings"]), int(r["bytes"]), now)
            for r in per_bucket
        ],
    )

    seg_meta = {
        "id": segment_id,
        "doc_base": doc_base,
        "total_rows": int(total_rows),
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl_local": avgdl,
        "buckets": buckets,
        "hot_terms": len(hot),
        "run_id": run_id,
    }
    cat.commit_segment(seg_meta)
    docs.unpersist()
    return seg_meta


def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    index_dir: str,
    **kwargs,
) -> dict:
    """Single-segment convenience build; returns the manifest."""
    build_segment(spark, transcripts, index_dir, 0, **kwargs)
    return IndexCatalog(index_dir).read_manifest()
