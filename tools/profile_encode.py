"""Decompose the encode_write stage cost (scaling diagnosis).

Times, at a given core count on the bench tier:
  A. tokens.count()                      — tokenize + explode (JVM only)
  B. shuffled-sorted noop mapInPandas    — + shuffle + sort + Arrow transfer
  C. full encode (no write)              — + the Python block encoder
  D. full encode + parquet write         — + the partitioned write

Usage: python tools/profile_encode.py [CPUS] [tier]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid
from collections.abc import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    tier = sys.argv[2] if len(sys.argv) > 2 else "bench"
    from pyspark.sql import functions as F

    from cuvs_lucene_spark.fixtures import ensure_corpus
    from cuvs_lucene_spark.operators.build import (
        encode_postings,
        prepare_docs,
    )
    from cuvs_lucene_spark.analysis import tokenize_col
    from cuvs_lucene_spark.session import get_spark

    spark = get_spark(f"enc-profile-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(ensure_corpus(tier))

    t = {}
    t0 = time.perf_counter()
    docs, cached = prepare_docs(df, return_cached=True)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    avgdl = stats["s"] / stats["n"]
    t["prepare_docs"] = round(time.perf_counter() - t0, 2)

    tokens = (
        docs.where(F.col("dl") > 0)
        .select("doc_id", "dl_q", F.explode(tokenize_col("text")).alias("term"))
        .withColumn("tf", F.lit(1).cast("long"))
        .withColumn("salt", F.lit(0))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(64)).cast("int"))
    )

    t0 = time.perf_counter()
    n_tok = tokens.count()
    t["A_tokenize_count"] = round(time.perf_counter() - t0, 2)

    def noop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        for b in batches:
            n += len(b)
        yield pd.DataFrame({"n": [n]})

    t0 = time.perf_counter()
    enc_parts = max(64, int(spark.conf.get("spark.sql.shuffle.partitions")))
    (
        tokens.repartition(enc_parts, "bucket", "salt")
        .sortWithinPartitions("bucket", "term", "salt", "doc_id")
        .mapInPandas(noop, "n long")
        .count()
    )
    t["B_shuffle_sort_arrow"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    blocks = encode_postings(spark, tokens, 64)
    n_blocks = blocks.count()
    t["C_full_encode"] = round(time.perf_counter() - t0, 2)

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    out = f"{base}/cuvs_encprof_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    encode_postings(spark, tokens, 64).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(out)
    t["D_encode_write"] = round(time.perf_counter() - t0, 2)
    shutil.rmtree(out, ignore_errors=True)

    print("ENCPROFILE " + json.dumps(
        {"cpus": cpus, "n_tokens": int(n_tok), "n_blocks": int(n_blocks), **t}
    ))
    cached.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
