"""Deterministic sampling and data-mixture weighting for training pipelines.

The mixture stage of a large-scale pretraining pipeline: draw a reproducible
sample of each domain ("stratum" — e.g. the ``source`` column) so the output
corpus matches target mixture proportions, and carve deterministic
train/val/test splits. Everything is a pure JVM column predicate over a
portable integer hash — no RNG state, no shuffle, rerunnable on any cluster
size with byte-identical output (the docID-stability / resumability contract
of the north rule applied to sampling: membership is a pure function of the
row key, never of task scheduling).

Hash portability: ``sample_hash_sql`` is plain modular arithmetic (two
multiplicative mixing rounds over 64-bit-safe intermediates), evaluated
identically by Spark SQL and DuckDB — the same shared-expression contract as
`pipeline/pii.py`. It is NOT cryptographic; swap in ``xxhash64`` on the
Spark side when oracle parity is not required (same API, one line).

Scale shape: sampling/splitting are scan-speed filters (whole-stage
codegen). `mixture_rates` runs ONE tiny aggregation (#strata rows) and
solves rates on the driver — the only action in the module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# hash constants: Knuth multiplicative constant + a large prime modulus;
# intermediates bounded by 1e6 * 2.7e9 < 2^62 (no 64-bit overflow — Spark 4
# runs ANSI mode, so silent wraparound is not available and not wanted).
_P_IN = 1_000_003          # pre-fold prime (keeps the multiply small)
_A = 2_654_435_761         # Knuth 2^32 * golden ratio
_P_OUT = 1_000_000_007
KEY_SPACE = 1_000_000      # hash buckets; rates resolve to 1e-6


def sample_hash_sql(id_col: str = "doc_id") -> str:
    """Portable bucket hash in [0, KEY_SPACE): identical text runs on Spark
    SQL and DuckDB. Two mixing rounds kill the obvious sequential-id
    correlation with the final modulus."""
    r1 = f"((({id_col} % {_P_IN}) * {_A}) % {_P_OUT})"
    return f"((({r1} * 69069) + 12345) % {_P_OUT}) % {KEY_SPACE}"


def sample_hash_col(id_col: str = "doc_id") -> Column:
    return F.expr(sample_hash_sql(id_col))


def deterministic_sample(
    docs: DataFrame, rate: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction: hash(id) < rate·KEY_SPACE.
    Membership is stable under reruns, repartitioning, and appends (a doc's
    fate never changes when the corpus around it grows)."""
    thr = int(rate * KEY_SPACE)
    return docs.where(sample_hash_col(id_col) < F.lit(thr))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps hash(id) <
    rates[s]·KEY_SPACE; unlisted strata use default_rate."""
    thr = F.lit(int(default_rate * KEY_SPACE))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(int(r * KEY_SPACE))).otherwise(thr)
    return docs.where(sample_hash_col(id_col) < thr)


def mixture_rates(
    docs: DataFrame,
    weights: dict[str, float],
    total_target: int | None = None,
    strata_col: str = "source",
) -> dict[str, float]:
    """Solve per-stratum sampling rates so the sampled corpus approaches the
    target mixture ``weights`` (normalized internally).

    With total_target=None, the output is as large as possible without
    up-sampling: the binding stratum (smallest n_s / w_s) is kept whole and
    every other stratum is down-sampled to match — the standard
    mixture-rebalancing rule. With a total, rates = min(1, w_s·total / n_s)
    (a stratum too small to meet its quota is kept whole; no replication).
    One #strata-row aggregation; the solve is driver-side arithmetic.
    """
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("mixture_rates: weights must sum > 0")
    w = {s: v / wsum for s, v in weights.items()}
    counts = {
        r[strata_col]: int(r["n"])
        for r in docs.where(F.col(strata_col).isin(list(w)))
        .groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    missing = [s for s in w if counts.get(s, 0) == 0]
    if missing:
        raise ValueError(f"mixture_rates: empty strata {missing}")
    if total_target is None:
        total_target = int(min(counts[s] / w[s] for s in w))
    return {s: min(1.0, (w[s] * total_target) / counts[s]) for s in w}


def sample_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    total_target: int | None = None,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """stratified_sample with rates solved by mixture_rates (unlisted strata
    are dropped — the mixture defines the corpus)."""
    rates = mixture_rates(docs, weights, total_target, strata_col)
    return stratified_sample(docs, rates, strata_col, id_col, default_rate=0.0)


def with_split(
    docs: DataFrame,
    fracs: dict[str, float] | None = None,
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: cumulative hash ranges in
    declaration order (fracs must sum to ≤ 1; remainder → last label).
    A doc's split never changes as the corpus grows — the property that
    keeps eval sets leak-free across pipeline reruns."""
    fracs = fracs or {"train": 0.98, "val": 0.01, "test": 0.01}
    h = sample_hash_col(id_col)
    expr = None
    lo = 0
    labels = list(fracs.items())
    for i, (label, f) in enumerate(labels):
        hi = KEY_SPACE if i == len(labels) - 1 else lo + int(f * KEY_SPACE)
        cond = h < F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        lo = hi
    return docs.withColumn(out_col, expr)


# -- DuckDB twins -----------------------------------------------------------

def stratified_sample_sql(
    table: str,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {int(r * KEY_SPACE)}" for s, r in sorted(rates.items())
    )
    return (
        f"SELECT * FROM {table} WHERE {sample_hash_sql(id_col)} < "
        f"(CASE {strata_col} {cases} ELSE {int(default_rate * KEY_SPACE)} END)"
    )


def with_split_sql(
    fracs: dict[str, float] | None = None, id_col: str = "doc_id"
) -> str:
    """Expression twin of with_split's label column."""
    fracs = fracs or {"train": 0.98, "val": 0.01, "test": 0.01}
    h = sample_hash_sql(id_col)
    parts, lo = [], 0
    labels = list(fracs.items())
    for i, (label, f) in enumerate(labels):
        hi = KEY_SPACE if i == len(labels) - 1 else lo + int(f * KEY_SPACE)
        parts.append(f"WHEN {h} < {hi} THEN '{label}'")
        lo = hi
    return "CASE " + " ".join(parts) + " END"
