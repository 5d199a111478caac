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
    # Run-length aggregate duplicate (term, salt, doc_id) rows into tf counts
    # FIRST (the token stream arrives un-aggregated — sort-based aggregation
    # replaces a second hash-aggregation exchange): a "run" is consecutive
    # equal (bucket, term, salt, doc_id); tf = run length (or the sum of
    # pre-combined tfs when the input already carries tf > 1).
    n0 = len(doc_ids)
    rchange = np.ones(n0, dtype=bool)
    if n0 > 1:
        rchange[1:] = (
            (doc_ids[1:] != doc_ids[:-1])
            | (term[1:] != term[:-1])
            | (salt[1:] != salt[:-1])
            | (bucket[1:] != bucket[:-1])
        )
    rstarts = np.flatnonzero(rchange)
    tf_sums = np.add.reduceat(tfs.astype(np.int64), rstarts)
    bucket, term, salt = bucket[rstarts], term[rstarts], salt[rstarts]
    doc_ids, tfs, dl_qs = doc_ids[rstarts], tf_sums, dl_qs[rstarts]

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


def prepare_docs(
    df: DataFrame,
    doc_base: int = 0,
    num_partitions: int | None = None,
    return_cached: bool = False,
) -> DataFrame:
    """transcripts → docs with global doc_id, dl, quantized norms.

    Deliberately does NOT materialize a tokens column: persisting token
    arrays for a 100 TB corpus is infeasible, so dl is computed in one JVM
    expression here and the tf stage re-tokenizes from text (tokenization is
    codegen'd JVM work — recomputing it is cheaper at scale than caching it).
    The only cache is the sorted source rows inside assign_doc_ids (docID
    determinism); derived columns recompute from it per consumer rather than
    being cached a second time.
    """
    res = assign_doc_ids(df, num_partitions, return_cached=return_cached)
    docs, cached = res if return_cached else (res, None)
    if doc_base:
        docs = docs.withColumn("doc_id", F.col("doc_id") + F.lit(doc_base))
    docs = docs.withColumn(
        "dl", F.coalesce(F.array_size(tokenize_col("text")), F.lit(0)).cast("long")
    )
    docs = with_quantized_dl(docs, "dl")
    if return_cached:
        return docs, cached
    return docs


def detect_hot_terms(
    docs: DataFrame,
    n_docs: int,
    hot_df_ratio: float = 0.05,
    sample_fraction: float = 0.05,
) -> list[str]:
    """Terms whose estimated df exceeds hot_df_ratio·n_docs → get salted.

    Runs BEFORE the wide shuffle on a deterministic doc sample: tokenize the
    sample, count docs-containing-term (distinct per doc), scale by the
    sample fraction. A full-corpus pre-pass would double the heaviest stage;
    salting correctness does not depend on WHICH terms are salted (only block
    layout does), so a seeded estimate over a few % of docs is safe — terms
    hot enough to skew a shuffle are, by definition, frequent enough to be
    visible in any few-% sample.
    """
    src = docs if sample_fraction >= 1.0 else docs.sample(fraction=sample_fraction, seed=42)
    eff = min(sample_fraction, 1.0)
    thresh = hot_df_ratio * n_docs * eff
    rows = (
        src.select(F.explode(F.array_distinct(tokenize_col("text"))).alias("term"))
        .groupBy("term")
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
    hot_sample_fraction: float = 0.05,
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
    import time as _time

    timings: dict[str, float] = {}
    _t = _time.perf_counter()

    docs, _cached = prepare_docs(transcripts, doc_base, return_cached=True)
    stats = docs.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ).collect()[0]
    total_rows, n_docs, sum_dl = stats["total_rows"], int(stats["n_docs"]), int(stats["sum_dl"])
    avgdl = sum_dl / n_docs if n_docs else 1.0
    timings["docs_stats"] = _time.perf_counter() - _t; _t = _time.perf_counter()

    # doc_dim: ord↔docID map + norms (reference ordToDoc,
    # CuVS2510GPUVectorsReader.java:385; Lucene norms, SmallFloat-quantized)
    docs.select(
        "doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "dl", "dl_q", "dl_d"
    ).write.mode("overwrite").parquet(cat.doc_dim_path(segment_id))
    timings["doc_dim_write"] = _time.perf_counter() - _t; _t = _time.perf_counter()

    hot = detect_hot_terms(docs, n_docs, hot_df_ratio, hot_sample_fraction)
    timings["hot_detect"] = _time.perf_counter() - _t; _t = _time.perf_counter()

    # THE wide shuffle — the ONLY full-corpus exchange in the build: the raw
    # token stream keyed by (bucket, salt). tf aggregation happens inside the
    # encoder by run-length over the partition sort (sort-based aggregation),
    # NOT a separate groupBy(term, doc) hash exchange — one shuffle of
    # ~token-count rows replaces two exchanges plus their hash-agg buffers.
    hot_lit = F.array(*[F.lit(t) for t in hot]) if hot else F.array().cast("array<string>")
    tokens = (
        docs.where(F.col("dl") > 0)
        .select("doc_id", "dl_q", F.explode(tokenize_col("text")).alias("term"))
        .withColumn("tf", F.lit(1).cast("long"))
        .withColumn(
            "salt",
            F.when(
                F.array_contains(hot_lit, F.col("term")),
                F.pmod(F.col("doc_id"), F.lit(salt_buckets)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(buckets)).cast("int"))
    )

    blocks = encode_postings(spark, tokens, avgdl, buckets, block_size)
    blocks.write.mode("overwrite").partitionBy("bucket").parquet(
        cat.postings_path(segment_id)
    )
    timings["encode_write"] = _time.perf_counter() - _t; _t = _time.perf_counter()

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
    timings["dict_lineage"] = _time.perf_counter() - _t
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
        "timings": {k: round(v, 2) for k, v in timings.items()},
    }
    cat.commit_segment(seg_meta)
    _cached.unpersist()
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
