"""Benchmark decontamination — n-gram overlap against a held-out eval set.

The standard LLM-training-data hygiene pass (the published n-gram-collision
protocol used by GPT-3 appendix C / PaLM / Llama data cards, from their public
descriptions): a training document is *contaminated* if it shares at least one
word n-gram with any document of a benchmark/eval corpus, and is dropped (or
flagged) before training. Reference analogy: this is a filtered build-input
operator, the pipeline-side sibling of liveDocs masking
(`TestCuVSDeletedDocuments.java:69-132` — excluded docs must never surface
downstream); the n-gram machinery is shared with the dedup family.

Scale shape (the 100 TB plan):
  * The BENCHMARK side is small by construction (eval suites are ~10^4..10^6
    docs) — its distinct shingle set is built once and **broadcast**, so the
    corpus never shuffles for the join.
  * The CORPUS side is ONE narrow (id, text) scan through the same Arrow
    shingle kernel the dedup family uses (`dedup._shingle_rows`: vectorized,
    dictionary-encoded, per-doc-distinct). The only shuffle is the per-doc
    hit aggregation over rows that MATCHED a benchmark shingle — at real
    contamination rates (<<1%) that is a vanishingly small fraction of the
    corpus.
  * The windows denominator (total n-gram windows per doc) is a pure JVM
    column expression — no second pass, no shuffle.

Every output column has an exact DuckDB twin (`contamination_report_sql`)
over the same tokenizer contract (`analysis.tokenize_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cuvs_lucene_spark.analysis import tokenize_col
from cuvs_lucene_spark.pipeline.dedup import _shingle_rows, shingles_sql


def _n_windows_col(text_col: str, n: int):
    """Total n-gram windows in the doc: max(0, n_tokens - n + 1), as a pure
    JVM expression (denominator of contam_frac; NULL text counts 0 tokens)."""
    n_tok = F.coalesce(F.array_size(tokenize_col(text_col)), F.lit(0))
    return F.greatest(n_tok - n + 1, F.lit(0))


def benchmark_shingles(
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct word n-grams of the whole benchmark corpus (column ``sh``).

    Built once per decontamination run; small enough to broadcast (callers
    that reuse it across many corpus passes should ``.persist()`` it)."""
    return (
        _shingle_rows(bench, id_col, text_col, n).select("sh").distinct()
    )


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-document contamination report vs a benchmark corpus.

    Returns ONLY contaminated docs (n_hit >= 1):
      (doc_id, n_hit, n_windows, contam_frac)
    where n_hit = DISTINCT benchmark-colliding n-grams in the doc, n_windows
    = total n-gram windows (the published protocols flag on any collision;
    the fraction grades severity), contam_frac = n_hit / n_windows rounded
    to 6 places (float-stable across engine and oracle).

    The benchmark shingle set is broadcast — the corpus-side scan never
    shuffles except for the matched-row aggregation.
    """
    bsh = benchmark_shingles(
        bench, n, bench_id_col or id_col, bench_text_col or text_col
    )
    corpus_sh = _shingle_rows(docs, id_col, text_col, n)
    hits = (
        corpus_sh.join(F.broadcast(bsh), "sh")
        # _shingle_rows emits per-doc DISTINCT shingles, so count == distinct
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    wins = docs.select(
        F.col(id_col).cast("long").alias("id"),
        _n_windows_col(text_col, n).alias("n_windows"),
    )
    return (
        hits.join(wins, "id")
        .select(
            F.col("id").alias(id_col),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.col("n_windows").cast("long").alias("n_windows"),
            F.round(
                F.col("n_hit") / F.greatest(F.col("n_windows"), F.lit(1)), 6
            ).alias("contam_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    max_hits: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Drop contaminated docs: keep docs with n_hit <= max_hits (default 0 —
    any benchmark collision removes the doc, the GPT-3-style strict rule).

    Same broadcast shape as `contamination_report`; the removal itself is a
    LEFT ANTI join on doc id (small right side: contaminated ids only).
    """
    bad = (
        contamination_report(
            docs, bench, n, id_col, text_col, bench_id_col, bench_text_col
        )
        .where(F.col("n_hit") > max_hits)
        .select(id_col)
    )
    return docs.join(F.broadcast(bad), id_col, "left_anti")


def contamination_report_sql(
    docs_table: str,
    bench_predicate: str,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of contamination_report for the one-table gate layout:
    the benchmark is ``docs_table WHERE bench_predicate``, the corpus is the
    complement (the gate's deterministic eval-set split)."""
    sh = shingles_sql(text_col, n)
    toks = (
        f"list_filter(regexp_split_to_array(lower(coalesce({text_col},'')),"
        f" '[^a-z0-9]+'), t -> t <> '')"
    )
    return f"""
WITH bench AS (
  SELECT DISTINCT unnest({sh}) AS sh
  FROM {docs_table} WHERE {bench_predicate}
),
corpus AS (
  SELECT {id_col} AS id, unnest({sh}) AS sh
  FROM {docs_table} WHERE NOT ({bench_predicate})
),
hits AS (
  SELECT id, count(*) AS n_hit FROM corpus JOIN bench USING (sh) GROUP BY id
),
wins AS (
  SELECT {id_col} AS id,
         greatest(len({toks}) - {n} + 1, 0) AS n_windows
  FROM {docs_table} WHERE NOT ({bench_predicate})
)
SELECT h.id AS {id_col},
       CAST(h.n_hit AS BIGINT) AS n_hit,
       CAST(w.n_windows AS BIGINT) AS n_windows,
       round(h.n_hit / greatest(w.n_windows, 1), 6) AS contam_frac
FROM hits h JOIN wins w USING (id)
ORDER BY {id_col}
"""
