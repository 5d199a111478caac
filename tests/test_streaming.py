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
