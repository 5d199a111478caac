#!/usr/bin/env python
"""Headline benchmark harness (driver-run per round; BASELINE.md protocol).

Measures, at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32):

  1. **Index-build throughput** — full build pipeline (read -> docID assign ->
     tokenize -> shuffle -> encode -> commit) on the deterministic synthetic
     transcripts corpus (fixtures tier scaled to the sf), into a fresh /tmp
     dir so nothing is cached; reported as turns/sec.
  2. **Query latency** — every query in ``__spark_entry__.queries()`` run
     warm (one untimed warmup that also populates the per-sf index cache,
     then timed reps; median reported).

Prints ONE json line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "build": {...}}

Scaling-efficiency evidence (local[8] vs local[32]) is produced separately by
``tools/bench_scaling.py`` into ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
import uuid

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_REPS", "3"))

# synthetic-transcripts tier for the build benchmark, by sf dir
_BUILD_TIER = {"sf0.001": "tiny", "sf0.01": "small", "sf0.1": "bench"}


def _sf_of(sf_dir: str) -> float:
    tag = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(tag.replace("sf", ""))
    except ValueError:
        return -1.0


def bench_build(spark) -> dict:
    from cuvs_lucene_spark.fixtures import TIERS, ensure_corpus
    from cuvs_lucene_spark.operators.build import build_index

    tier = _BUILD_TIER.get(os.path.basename(os.path.normpath(SF_DIR)), "small")
    corpus = ensure_corpus(tier)
    transcripts = spark.read.parquet(corpus)
    n_turns = transcripts.count()  # warm the file-listing/scan path

    # RAM-backed index dir (same rationale as tools/bench_scaling.py): the
    # sandbox's single shared disk would otherwise dominate the write phase;
    # a real cluster writes through per-executor local NVMe.
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    idx_dir = f"{base}/cuvs_lucene_spark_bench_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    build_index(
        spark, transcripts, idx_dir,
        buckets=32, salt_buckets=8, hot_df_ratio=0.05,
    )
    dt = time.perf_counter() - t0

    def _du(path: str) -> int:
        if os.path.isfile(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total

    idx_bytes, src_bytes = _du(idx_dir), _du(corpus)
    shutil.rmtree(idx_dir, ignore_errors=True)
    return {
        "tier": tier,
        "turns": int(n_turns),
        "sec": round(dt, 3),
        "turns_per_sec": round(n_turns / dt, 1),
        "index_mb": round(idx_bytes / 1e6, 1),
        "corpus_mb": round(src_bytes / 1e6, 1),
        "index_to_corpus_ratio": round(idx_bytes / max(src_bytes, 1), 3),
    }


def bench_queries(spark) -> tuple[dict[str, float], dict[str, float]]:
    import __spark_entry__ as e

    qs = e.queries()
    # Warm EVERY query before timing ANY: the first query's warmup builds the
    # per-sf cached index (~100 s at sf0.1), and timing its reps immediately
    # after measures session churn from that build (GC, page-cache turnover)
    # rather than the query — observed 12.4 s vs the 2.3 s steady state.
    # TWO warm passes: one is not enough to absorb JIT/codegen-cache warmup,
    # which otherwise biases whichever gates run EARLY in registration order
    # (observed ~2-3x on the facet family when the round-5 gate rotation
    # moved them to the front) — per-gate times should measure the plan, not
    # the gate's position.
    for _ in range(2):
        for fn in qs.values():
            fn(spark, SF_DIR).collect()
    # INTERLEAVED reps: run the whole gate list REPS times and take each
    # gate's median ACROSS passes, instead of timing one gate's reps
    # back-to-back. A transient host-noise window (co-tenant burst, GC,
    # writeback) then lands on different gates in different passes and the
    # median rejects it; with consecutive reps it used to swallow whole
    # contiguous gate ranges (observed: 2-3x on positions 7-10 in one run,
    # 21-27 in the next, 0.999 median ratio overall).
    times: dict[str, list[float]] = {name: [] for name in qs}
    for _ in range(REPS):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            times[name].append(time.perf_counter() - t0)
    out: dict[str, float] = {}
    fts_samples: list[float] = []
    for name, ts in times.items():
        out[name] = round(statistics.median(ts), 4)
        if name.startswith("fts_topk_"):
            fts_samples.extend(ts)
    # BASELINE.md protocol asks for p50/p95 over ≥100 warm executions; the
    # top-k family (~20 gates × REPS) pools to that order. One distribution
    # over the whole family is the honest serving-latency figure — per-query
    # medians above stay the per-operator regression signal.
    fts_samples.sort()
    pct = {
        "fts_topk_p50": round(
            statistics.median(fts_samples), 4
        ) if fts_samples else None,
        "fts_topk_p95": round(
            fts_samples[max(0, int(0.95 * len(fts_samples)) - 1)], 4
        ) if fts_samples else None,
        "fts_topk_n_samples": len(fts_samples),
    }
    return out, pct


def main() -> None:
    from cuvs_lucene_spark.session import get_spark

    spark = get_spark("cuvs-lucene-spark-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    build = bench_build(spark)
    queries, latency = bench_queries(spark)
    total = round(build["sec"] + sum(queries.values()), 3)

    print(json.dumps({
        "metric": "fts_build_plus_query_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "latency": latency,
        "sf": _sf_of(SF_DIR),
        "build": build,
        "cpus": CPUS,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
