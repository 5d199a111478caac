"""Decompose the flush+merge encode stage. Usage: probe_flush.py CPUS"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    from pyspark.sql import functions as F

    from cuvs_lucene_spark.fixtures import ensure_corpus
    from cuvs_lucene_spark.operators.build import (
        POSTINGS_SCHEMA,
        detect_hot_terms,
        make_flush_kernel,
        merge_partials,
        prepare_docs,
    )
    from cuvs_lucene_spark.session import get_spark

    spark = get_spark(f"flushprobe-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(ensure_corpus("bench"))

    t = {}
    t0 = time.perf_counter()
    docs, cached = prepare_docs(df, return_cached=True)
    st = docs.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")).collect()[0]
    avgdl = st["s"] / st["n"]
    n_docs = int(st["n"])
    hot = detect_hot_terms(docs, n_docs, 0.05, 0.05)
    t["prepare"] = round(time.perf_counter() - t0, 2)

    def partials():
        return (
            docs.where(F.col("dl") > 0)
            .select("doc_id", "conv_id", "turn_idx", "role", "tool", "ts", "text")
            .mapInPandas(
                make_flush_kernel(64, 8, hot), POSTINGS_SCHEMA
            )
        )

    t0 = time.perf_counter()
    np_ = partials().count()
    t["flush_only"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    nb = merge_partials(spark, partials(), 64).count()
    t["flush_merge"] = round(time.perf_counter() - t0, 2)

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    out = f"{base}/cuvs_fp_{uuid.uuid4().hex[:6]}"
    t0 = time.perf_counter()
    merge_partials(spark, partials(), 64).write.mode("overwrite").parquet(out)
    t["write_flat"] = round(time.perf_counter() - t0, 2)
    shutil.rmtree(out, ignore_errors=True)

    t0 = time.perf_counter()
    merge_partials(spark, partials(), 64).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(out)
    t["write_partitioned"] = round(time.perf_counter() - t0, 2)
    shutil.rmtree(out, ignore_errors=True)

    print("FLUSHPROBE " + json.dumps(
        {"cpus": cpus, "partials": int(np_), "blocks": int(nb), **t}
    ))
    cached.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
