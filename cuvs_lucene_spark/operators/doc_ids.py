"""Stable global docID assignment — the two-level Lucene docBase scheme.

Reference semantics: segment-local dense docIDs plus a per-segment docBase
accumulated across readers (``CuVS2510GPUVectorsWriter.java:376-386``); index
sorting fixes the order before ids are assigned (``:316-329``).

Two paths (SURVEY.md §1.2):

* **Sorted fast path** — the realistic 100 TB layout is an Iceberg table
  already sorted by (conv_id, turn_idx) (the input_hint's "stable turn
  ordering"). A keys-only narrow probe summarizes each scan partition
  (count, min/max key, sorted?); if partitions are internally sorted and
  their key ranges don't overlap, doc_id = base[partition] + local_offset
  with bases accumulated in KEY order — no shuffle, no cache, nothing moves.
  This is exactly Lucene's docBase bookkeeping over already-sorted segments.
* **Fallback** — range-partition + sort (Spark's sort IS the Sorter.DocMap),
  then the same per-partition-count base scheme. Needs a persist because
  repartitionByRange samples non-deterministically.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# monotonically_increasing_id packs (partition_id << 33) | local_offset.
_MID_PART_SHIFT = 33


def _partition_key_summaries(df: DataFrame) -> list[dict]:
    """One row per non-empty partition: (pid, cnt, min/max key, sorted flag).

    Narrow keys-only pass (conv_id, turn_idx): ~16 bytes/row scanned, no
    exchange — scales linearly with executors at any corpus size.
    """

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = None
        cnt = 0
        mn = mx = None
        ok = True
        last = None
        for pdf in batches:
            if not len(pdf):
                continue
            pid = int(pdf["_pid"].iloc[0])
            keys = list(zip(pdf["conv_id"], pdf["turn_idx"]))
            # STRICTLY increasing: duplicate (conv_id, turn_idx) keys make the
            # within-partition order ambiguous across re-executions, so they
            # disqualify the no-materialization fast path.
            if last is not None and keys and keys[0] <= last:
                ok = False
            if ok and any(b <= a for a, b in zip(keys, keys[1:])):
                ok = False
            if mn is None or (keys and keys[0] < mn):
                mn = keys[0] if keys else mn
            if mx is None or (keys and keys[-1] > mx):
                mx = keys[-1] if keys else mx
            last = keys[-1] if keys else last
            cnt += len(pdf)
        if pid is not None:
            yield pd.DataFrame(
                {
                    "pid": [pid],
                    "cnt": [cnt],
                    "min_conv": [mn[0]],
                    "min_turn": [mn[1]],
                    "max_conv": [mx[0]],
                    "max_turn": [mx[1]],
                    "sorted": [ok],
                }
            )

    rows = (
        df.select("conv_id", "turn_idx")
        .withColumn("_pid", F.spark_partition_id())
        .mapInPandas(
            probe,
            "pid int, cnt long, min_conv string, min_turn long, "
            "max_conv string, max_turn long, sorted boolean",
        )
        .collect()
    )
    return [r.asDict() for r in rows]


# Logical-plan node names whose output partitioning AND within-partition row
# order are deterministic across re-executions: plain scans plus row-preserving
# projections/filters. Anything else (Exchange/Repartition/Sample/Join/...)
# can reorder rows between the probe job and later consumer jobs, so the
# uncached fast path must not trust it.
_STABLE_PLAN_NODES = (
    "Relation", "Project", "Filter", "SubqueryAlias", "View",
    "LogicalRDD", "InMemoryRelation", "Scan",
)


def _plan_is_stable_scan(df: DataFrame) -> bool:
    """True iff every node of the optimized logical plan is a deterministic
    scan/project/filter — the precondition for deriving docIDs from the scan
    partitioning without materializing them."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return False
    for line in plan.splitlines():
        head = line.strip().lstrip("+-: ").split(" ", 1)[0].split("(", 1)[0]
        if head and not any(head.startswith(n) for n in _STABLE_PLAN_NODES):
            return False
    return True


def assign_doc_ids(
    df: DataFrame,
    num_partitions: int | None = None,
    return_cached: bool = False,
) -> DataFrame:
    """Return df + doc_id (long), densely numbered in (conv_id, turn_idx) order.

    With return_cached=True, returns (out, handle) where handle.unpersist()
    releases any cache the chosen path created (the fast path creates none —
    its ids derive deterministically from the stable scan partitioning, so
    re-executions reproduce them without materialization).
    """
    stable = _plan_is_stable_scan(df)
    sums = _partition_key_summaries(df) if stable else []
    ordered = sorted(sums, key=lambda r: (r["min_conv"], r["min_turn"]))
    non_overlapping = all(
        (a["max_conv"], a["max_turn"]) < (b["min_conv"], b["min_turn"])
        for a, b in zip(ordered, ordered[1:])
    )
    if stable and sums and non_overlapping and all(r["sorted"] for r in sums):
        base = 0
        bases = []
        for r in ordered:
            bases.append((r["pid"], base))
            base += r["cnt"]
        bases_df = F.broadcast(
            df.sparkSession.createDataFrame(bases, "`_pid` long, `_base` long")
        )
        out = (
            df.withColumn("_mid", F.monotonically_increasing_id())
            .withColumn("_pid", F.shiftrightunsigned("_mid", _MID_PART_SHIFT))
            .join(bases_df, "_pid")
            .withColumn(
                "doc_id",
                (
                    F.col("_base")
                    + F.col("_mid").bitwiseAND(F.lit((1 << _MID_PART_SHIFT) - 1))
                ).cast("long"),
            )
            .drop("_pid", "_mid", "_base")
        )
        if return_cached:
            return out, out  # nothing persisted; unpersist() is a no-op
        return out

    # ---- fallback: global sort via range partition (the Sorter.DocMap) ----
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    sorted_df = (
        df.repartitionByRange(int(n), "conv_id", "turn_idx")
        .sortWithinPartitions("conv_id", "turn_idx")
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()
    )
    sorted_df.count()  # materialize so both reads see identical ids

    parts = (
        sorted_df.select(F.shiftrightunsigned("_mid", _MID_PART_SHIFT).alias("_pid"))
        .groupBy("_pid")
        .count()
        .orderBy("_pid")
        .collect()
    )  # one row per partition — tiny even at 10^5 partitions
    base = 0
    bases = []
    for r in parts:
        bases.append((r["_pid"], base))
        base += r["count"]
    bases_df = F.broadcast(
        df.sparkSession.createDataFrame(bases, "`_pid` long, `_base` long")
    )

    out = (
        sorted_df.withColumn("_pid", F.shiftrightunsigned("_mid", _MID_PART_SHIFT))
        .join(bases_df, "_pid")
        .withColumn(
            "doc_id",
            (F.col("_base") + F.col("_mid").bitwiseAND(F.lit((1 << _MID_PART_SHIFT) - 1))).cast("long"),
        )
        .drop("_pid", "_mid", "_base")
    )
    if return_cached:
        return out, sorted_df
    return out
