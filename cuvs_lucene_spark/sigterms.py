"""Significant terms over a relevance-feedback doc set.

The Elasticsearch ``significant_terms`` / Luke "interesting terms" analytics
surface, grafted onto this engine the way Lucene-family systems actually
compute it: take the top-``fg_k`` docs of a query (the relevance-feedback
foreground — the same doc set `mlt.py` harvests terms from), count each
term's foreground document frequency FROM THE INVERTED INDEX, contrast it
with the term's background df from the dictionary, and rank by the JLH
score ``(fgp − bgp) · fgp / bgp`` (foreground/background proportion lift —
the ES default heuristic, from its public docs). Reference analogy: this is
a read-side composition of Q1 (per-leaf search) + L3 (term dictionary) —
no new index structure, exactly like the reference serves every analytics
need from the same two tables.

Plan shape at scale:
  * foreground ids = one normal top-k search → ≤ fg_k ids on the driver
    (bounded, like every collector harvest).
  * ONE postings scan pre-filtered JVM-side to blocks whose
    ``[first_doc, last_doc]`` span contains ≥1 foreground id (fg_k interval
    probes per block row — cheap vs decoding); only surviving blocks enter
    the Arrow decode kernel, and only foreground rows leave it. Cost is
    O(blocks containing a foreground doc), independent of corpus size.
  * the per-term aggregate is over ≤ (fg_k × terms-per-doc) rows; the
    dictionary join supplies background df (which, like Lucene, still
    counts tombstoned docs until merge — SURVEY §4.3.2 semantics).

Background df comes from the dictionary table, so deleted-but-unmerged
docs count in bg (Lucene df semantics) while the foreground is live-only
(it came from a deletes-aware search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.operators.merge import decode_postings
from cuvs_lucene_spark.query import IndexReader, search

SIG_SCHEMA = "term string, fg_df long, bg_df long, score double"


def significant_terms(
    spark: SparkSession,
    index_dir: str,
    query: str,
    fg_k: int = 50,
    top_terms: int = 20,
    mode: str = "or",
    field: str | None = None,
    reader: IndexReader | None = None,
    float32: bool = True,
    min_fg_df: int = 1,
    exclude_query_terms: bool = True,
) -> DataFrame:
    """(term, fg_df, bg_df, score) — top ``top_terms`` by JLH score desc,
    term asc (deterministic ties). fg_df counts foreground docs containing
    the term (each (term, doc) posting lives in exactly one block, so a
    block-row count IS the doc count). Query terms are excluded by default
    (they trivially dominate the foreground — the MoreLikeThis convention);
    pass exclude_query_terms=False for the raw ES behavior."""
    rd = reader or IndexReader(spark, index_dir)
    fld = rd.resolve_field(field)
    hits = search(
        spark, index_dir, query, k=fg_k, mode=mode, field=fld,
        reader=rd, float32=float32,
    )
    fg = sorted(int(r["doc_id"]) for r in hits.select("doc_id").collect())
    if not fg:
        return spark.createDataFrame([], SIG_SCHEMA)
    fg_n = len(fg)
    n_docs, _, _ = rd.field_stats_of(fld)

    ids_sql = "array(" + ",".join(f"{i}L" for i in fg) + ")"
    posts = rd.cat.read_postings(spark).where(F.col("field") == fld)
    cand = posts.where(
        F.expr(f"exists({ids_sql}, x -> x >= first_doc AND x <= last_doc)")
    )
    fg_rows = decode_postings(cand).where(F.col("doc_id").isin(fg))
    if exclude_query_terms:
        q_terms = sorted(set(rd.analyze(query)))
        if q_terms:
            fg_rows = fg_rows.where(~F.col("term").isin(q_terms))
    fg_df = (
        fg_rows.groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg_df"))
        .where(F.col("fg_df") >= min_fg_df)
    )
    bg = (
        rd.cat.read_dictionary(spark)
        .where(F.col("field") == fld)
        .groupBy("term")
        .agg(F.sum("df").alias("bg_df"))
    )
    fgp = F.col("fg_df").cast("double") / F.lit(float(fg_n))
    bgp = F.col("bg_df").cast("double") / F.lit(float(n_docs))
    return (
        fg_df.join(bg, "term")
        .select(
            "term",
            F.col("fg_df").cast("long").alias("fg_df"),
            F.col("bg_df").cast("long").alias("bg_df"),
            F.round((fgp - bgp) * fgp / bgp, 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(top_terms)
    )
