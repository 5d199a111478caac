"""Finer stage-isolation probe for the postings shuffle path.

Stages (each a separate action, noop sink so nothing is collected):
  A  tokenize+explode count          (JVM scan+regex+explode)
  B1 tokens noop-write               (materialize rows, no shuffle)
  B2 +repartition(64)  noop-write    (adds shuffle write+read)
  B3 +sortWithinPartitions noop      (adds per-partition sort)
  B4 +mapInPandas(noop)  count       (adds Arrow JVM->Python round trip)

Usage: python tools/probe_stages.py CPUS [maxPartitionBytes]
"""
from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    mpb = sys.argv[2] if len(sys.argv) > 2 else "16m"
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))
    from pyspark.sql import functions as F

    from cuvs_lucene_spark.analysis import TOKEN_PATTERN
    from cuvs_lucene_spark.fixtures import ensure_corpus
    from cuvs_lucene_spark.session import get_spark

    spark = get_spark(f"probe-{cpus}", cpus=cpus)
    spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(ensure_corpus("bench"))

    tokens = (
        df.where(F.col("text").isNotNull())
        .select(
            F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
            F.explode(F.split(F.lower(F.col("text")), TOKEN_PATTERN)).alias("term"),
        )
        .where(F.col("term") != "")
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(64)).cast("int"))
    )

    def noopw(d):
        d.write.format("noop").mode("overwrite").save()

    t = {}
    t0 = time.perf_counter()
    n = tokens.count()
    t["A_count"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    noopw(tokens)
    t["B1_materialize"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    noopw(tokens.repartition(64, "bucket"))
    t["B2_shuffle"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    noopw(
        tokens.repartition(64, "bucket").sortWithinPartitions(
            "bucket", "term", "doc_id"
        )
    )
    t["B3_sort"] = round(time.perf_counter() - t0, 2)

    def noop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = 0
        for b in batches:
            c += len(b)
        yield pd.DataFrame({"n": [c]})

    t0 = time.perf_counter()
    (
        tokens.repartition(64, "bucket")
        .sortWithinPartitions("bucket", "term", "doc_id")
        .mapInPandas(noop, "n long")
        .count()
    )
    t["B4_arrow"] = round(time.perf_counter() - t0, 2)

    print("STAGES " + json.dumps({"cpus": cpus, "mpb": mpb, "tokens": int(n), **t}))
    spark.stop()


if __name__ == "__main__":
    main()
