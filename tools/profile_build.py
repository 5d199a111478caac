"""Per-stage build timing probe (scaling diagnosis).

Runs ONE bench-tier build at a given core count in this process and prints
the seg_meta timings dict. Usage: python tools/profile_build.py CPUS [tier]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    tier = sys.argv[2] if len(sys.argv) > 2 else "bench"
    from cuvs_lucene_spark.fixtures import ensure_corpus
    from cuvs_lucene_spark.operators.build import build_index
    from cuvs_lucene_spark.session import get_spark

    spark = get_spark(f"profile-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(ensure_corpus(tier))
    n = df.count()
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    idx = f"{base}/cuvs_profile_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    manifest = build_index(spark, df, idx, buckets=64, salt_buckets=8, hot_df_ratio=0.05)
    dt = time.perf_counter() - t0
    seg = manifest["segments"][0]
    print("PROFILE " + json.dumps({
        "cpus": cpus, "tier": tier, "turns": int(n),
        "total_s": round(dt, 2), "turns_per_sec": round(n / dt, 1),
        "timings": seg["timings"],
    }))
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
