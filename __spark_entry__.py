"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Since the engine's input shape is the transcripts table of
BASELINE.json.input_hint, the FTS queries first derive a transcripts-shaped
table from the driver's ``documents`` parquet with SQL-expressible transforms
(both sides use the identical derivation), build the inverted index once per
sf_dir (idempotent manifest makes repeat calls free), and answer BM25 top-k
through the REAL engine — the DuckDB oracle reimplements full Lucene BM25
(tokenizer contract, SmallFloat-quantized norms, idf, docID tie-break) in
ANSI SQL.

Score precision: these driver-facing queries run the engine in float64 mode
and round scores to 4 decimals on both sides; the Lucene float32-exact path
is pinned separately by pytest against the numpy oracle (SURVEY.md §5.2).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Bump when the on-disk index format or build logic changes (invalidates the
# per-sf_dir index cache under /tmp).
_IDX_VERSION = "v004"

_BM25_K1, _BM25_B = 1.2, 0.75
_SHIPPED: set[str] = set()


def _ensure_pkg(spark: SparkSession) -> None:
    """Ship the package to executors exactly once per session (the driver may
    hand us a session built without cuvs_lucene_spark.session.get_spark)."""
    import cuvs_lucene_spark.session as s

    key = spark.sparkContext.applicationId
    if key not in _SHIPPED:
        s.ship_package(spark)
        _SHIPPED.add(key)


# ---------------------------------------------------------------------------
# transcripts derivation (identical in Spark and DuckDB SQL)
# ---------------------------------------------------------------------------

def derive_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.format_string("conv-%08d", (F.col("doc_id") % 50).cast("int")).alias("conv_id"),
        F.expr("cast(doc_id div 50 as int)").alias("turn_idx"),
        F.expr(
            "CASE cast(doc_id % 3 as int) WHEN 0 THEN 'user' "
            "WHEN 1 THEN 'assistant' ELSE 'tool' END"
        ).alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.expr(
            "timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)"
        ).alias("ts"),
    )


# DuckDB CTE prefix shared by every FTS oracle query: derivation + docID
# assignment + tokenize + quantized norms + stats + tf.
_ORACLE_PREFIX = """
WITH base AS (
  SELECT 'conv-' || lpad(cast(cast(doc_id % 50 AS bigint) AS varchar), 8, '0') AS conv_id,
         cast(doc_id // 50 AS int) AS turn_idx,
         CASE cast(doc_id % 3 AS int) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
         text
  FROM documents
),
docs AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
         conv_id, turn_idx, role,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '[^a-z0-9]+'), x -> x <> '') AS toks
  FROM base
),
dlq AS (
  SELECT doc_id, conv_id, turn_idx, role, len(toks) AS dl, toks,
         CASE WHEN len(toks) < 8 THEN len(toks)
              ELSE ((len(toks) >> (length(format('{:b}', len(toks))) - 4))
                    << (length(format('{:b}', len(toks))) - 4)) END AS dl_d
  FROM docs
),
stats AS (
  SELECT count(*) FILTER (WHERE dl > 0) AS n_docs,
         sum(dl) FILTER (WHERE dl > 0) AS sum_dl,
         cast(sum(dl) FILTER (WHERE dl > 0) AS double)
           / count(*) FILTER (WHERE dl > 0) AS avgdl
  FROM dlq
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM dlq) u
  GROUP BY doc_id, term
)
"""


def _oracle_topk_sql(terms: list[str], k: int, mode: str, filter_sql: str | None) -> str:
    """Full Lucene-BM25 top-k in DuckDB SQL (the per-query oracle)."""
    vals = ", ".join(f"('{t}')" for t in terms)
    where = f"AND d.{filter_sql}" if filter_sql else ""
    and_having = f"HAVING count(*) = {len(terms)}" if mode == "and" else ""
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (s.n_docs - ts.df + 0.5)/(ts.df + 0.5))
              * tf.tf / (tf.tf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl)) ) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
  WHERE 1=1 {where}
  GROUP BY tf.doc_id
  {and_having}
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r, score
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# engine-side helpers
# ---------------------------------------------------------------------------

def _index_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "root"
    return f"/tmp/cuvs_lucene_spark_idx_{_IDX_VERSION}/{tag}"


def _index_for(spark: SparkSession, sf_dir: str) -> str:
    from cuvs_lucene_spark.operators.build import build_index

    _ensure_pkg(spark)
    d = _index_dir(sf_dir)
    build_index(
        spark, derive_transcripts(spark, sf_dir), d,
        buckets=8, salt_buckets=4, hot_df_ratio=0.20,
    )  # idempotent: committed manifest → no-op
    return d


def _fts_topk(
    spark: SparkSession,
    sf_dir: str,
    terms: list[str],
    k: int = 10,
    mode: str = "or",
    filter_cond=None,
    prune: bool = False,
) -> DataFrame:
    from cuvs_lucene_spark.query import search

    idx = _index_for(spark, sf_dir)
    res = search(
        spark, idx, " ".join(terms), k=k, mode=mode,
        filter_cond=filter_cond, prune=prune, float32=False,
    )
    w = Window.orderBy(F.desc("score_r"), F.asc("doc_id"))
    return (
        res.withColumn("score_r", F.round("score", 4))
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.col("rank").cast("long").alias("rank"),
            F.col("doc_id").cast("long").alias("doc_id"),
            "conv_id",
            F.col("turn_idx").cast("long").alias("turn_idx"),
            F.col("score_r").alias("score"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-term OR BM25 top-10 with block-max pruning, sf0.001."""
    return _fts_topk(
        spark, "/root/testdata/sf0.001",
        ["merge", "sort", "join", "window"], k=10, prune=True,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    q["fts_topk_single"] = lambda s, d: _fts_topk(s, d, ["merge"])
    q["fts_topk_or"] = lambda s, d: _fts_topk(s, d, ["merge", "sort", "join"])
    q["fts_topk_or_pruned"] = lambda s, d: _fts_topk(
        s, d, ["scan", "filter", "window", "hash"], prune=True
    )
    q["fts_topk_and"] = lambda s, d: _fts_topk(s, d, ["merge", "sort"], mode="and")
    q["fts_topk_filtered"] = lambda s, d: _fts_topk(
        s, d, ["query", "data", "batch"], filter_cond=F.col("role") == "user"
    )
    q["fts_topk_hot"] = lambda s, d: _fts_topk(s, d, ["batch"], k=20)

    def dictionary(s: SparkSession, d: str) -> DataFrame:
        from cuvs_lucene_spark.query import IndexReader

        rd = IndexReader(s, _index_for(s, d))
        return (
            rd.cat.read_dictionary(s)
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(20)
            .select("term", F.col("df").cast("long"), F.col("cf").cast("long"))
        )

    q["fts_dictionary"] = dictionary

    def doc_norms(s: SparkSession, d: str) -> DataFrame:
        from cuvs_lucene_spark.query import IndexReader

        rd = IndexReader(s, _index_for(s, d))
        return rd.cat.read_doc_dim(s).select(
            F.col("doc_id").cast("long"),
            "conv_id",
            F.col("turn_idx").cast("long").alias("turn_idx"),
            F.col("dl").cast("long"),
            F.col("dl_d").cast("long"),
        )

    q["fts_doc_norms"] = doc_norms

    def global_stats(s: SparkSession, d: str) -> DataFrame:
        from cuvs_lucene_spark.query import IndexReader

        rd = IndexReader(s, _index_for(s, d))
        return s.createDataFrame(
            [(rd.n_docs, rd.sum_dl, round(rd.avgdl, 6))],
            "n_docs long, sum_dl long, avgdl double",
        )

    q["fts_global_stats"] = global_stats

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["fts_topk_single"] = _oracle_topk_sql(["merge"], 10, "or", None)
    o["fts_topk_or"] = _oracle_topk_sql(["merge", "sort", "join"], 10, "or", None)
    o["fts_topk_or_pruned"] = _oracle_topk_sql(
        ["scan", "filter", "window", "hash"], 10, "or", None
    )
    o["fts_topk_and"] = _oracle_topk_sql(["merge", "sort"], 10, "and", None)
    o["fts_topk_filtered"] = _oracle_topk_sql(
        ["query", "data", "batch"], 10, "or", "role = 'user'"
    )
    o["fts_topk_hot"] = _oracle_topk_sql(["batch"], 20, "or", None)

    o["fts_dictionary"] = f"""{_ORACLE_PREFIX}
SELECT term, count(*) AS df, sum(tf) AS cf
FROM tf GROUP BY term ORDER BY df DESC, term ASC LIMIT 20
"""
    o["fts_doc_norms"] = f"""{_ORACLE_PREFIX}
SELECT doc_id, conv_id, cast(turn_idx AS bigint) AS turn_idx,
       cast(dl AS bigint) AS dl, cast(dl_d AS bigint) AS dl_d
FROM dlq
"""
    o["fts_global_stats"] = f"""{_ORACLE_PREFIX}
SELECT cast(n_docs AS bigint) AS n_docs, cast(sum_dl AS bigint) AS sum_dl,
       round(avgdl, 6) AS avgdl
FROM stats
"""
    return o
