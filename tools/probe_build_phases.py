"""Per-phase wall times of build_index at two executor counts.

Runs the identical bench-tier build at local-cluster[n,1] for n in the args
(default 1 and 4), with the same pinning + JVM warm-build protocol as
bench_scaling, and prints each build phase's wall (from the manifest timings)
plus total process-tree CPU. Phases whose wall does not shrink n→4n are the
serial share; total-CPU growth is the cross-JVM overhead.

Usage: python tools/probe_build_phases.py [tier] [n ...]
Internal: --worker N TIER
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import _pin_executors, tree_cpu_seconds  # noqa: E402

DRIVER_CORES = "28-31"


def worker(n_exec: int, tier: str) -> None:
    import shutil

    from cuvs_lucene_spark.fixtures import ensure_corpus
    from cuvs_lucene_spark.operators.build import build_index
    from cuvs_lucene_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
    spark = get_spark(
        f"phases-{n_exec}x1",
        cpus=n_exec,
        master=f"local-cluster[{n_exec},1,13312]",
        executor_mem="12g",
    )
    spark.sparkContext.setLogLevel("ERROR")
    _pin_executors(n_exec)

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    warm = f"{base}/phase_warm_{uuid.uuid4().hex[:8]}"
    build_index(
        spark, spark.read.parquet(ensure_corpus("small")), warm,
        buckets=16, salt_buckets=4,
    )
    shutil.rmtree(warm, ignore_errors=True)

    idx = f"{base}/phase_probe_{uuid.uuid4().hex[:8]}"
    df = spark.read.parquet(ensure_corpus(tier))
    cpu0 = tree_cpu_seconds()
    t0 = time.perf_counter()
    build_index(spark, df, idx, buckets=64, salt_buckets=8, hot_df_ratio=0.05)
    wall = time.perf_counter() - t0
    cpu = tree_cpu_seconds() - cpu0
    man = json.load(open(os.path.join(idx, "manifest.json")))
    timings = man["segments"][-1].get("timings", {})
    shutil.rmtree(idx, ignore_errors=True)
    print("RESULT " + json.dumps({
        "n_exec": n_exec, "wall_s": round(wall, 2), "cpu_s": round(cpu, 1),
        "phases": {k: round(v, 2) for k, v in timings.items()},
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
        return
    tier = sys.argv[1] if len(sys.argv) > 1 else "bench"
    ns = [int(x) for x in sys.argv[2:]] or [1, 4]
    for n in ns:
        cmd = [
            "taskset", "-c", DRIVER_CORES, sys.executable,
            os.path.abspath(__file__), "--worker", str(n), tier,
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        lines = [x for x in out.stdout.splitlines() if x.startswith("RESULT ")]
        if not lines:
            print(out.stdout[-1500:], out.stderr[-1500:], file=sys.stderr)
            raise SystemExit(f"n={n}: no RESULT")
        print(lines[-1][len("RESULT "):])


if __name__ == "__main__":
    main()
