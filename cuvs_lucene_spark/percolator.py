"""Percolator — stored-query matching over a document stream.

The Lucene ``monitor`` module (Luwak) / Elasticsearch percolate surface:
REGISTER a set of boolean queries once, then for each incoming batch of
documents report which queries match which docs — alerting/routing over a
feed, the inverse of normal search. Published design this follows (from the
lucene-monitor docs): queries are indexed BY THEIR TERMS (the
"presearcher"), candidate (doc, query) pairs come from term intersection,
and only candidates are evaluated exactly.

Supported query shape: flat BooleanQuery — MUST / SHOULD / MUST_NOT term
clauses + minimum_should_match — the standard monitoring alert shape
(`booleanq.Q` depth-1 trees with term leaves, or plain dicts). Clause
semantics are Lucene's: every MUST term present, no MUST_NOT term present,
and ≥ max(msm, 1 if there are no MUST clauses else msm) SHOULD terms
present (a SHOULD-only query needs at least one hit).

Plan shape at scale: the registered query-term table is tiny (terms ×
queries) and BROADCAST; the corpus side is ONE narrow (id, text) scan
through the dedup family's Arrow unigram kernel (distinct terms per doc,
dictionary-encoded); the only shuffle is the per-(doc, query) aggregation
over rows that matched some query term — proportional to candidate pairs,
not to the corpus. Evaluation is one JVM hash aggregate + a broadcast meta
join; no per-query jobs, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.analysis import analyze_py
from cuvs_lucene_spark.pipeline.dedup import _shingle_rows

_ROLES = ("must", "should", "not")


def _clauses_of(q) -> dict:
    """Normalize a registration entry (dict or flat booleanq.Q) to
    {'must': [...], 'should': [...], 'not': [...], 'msm': int} of ANALYZED
    distinct terms."""
    if isinstance(q, dict):
        raw = {
            "must": list(q.get("must", ())),
            "should": list(q.get("should", ())),
            "not": list(q.get("must_not", q.get("not", ()))),
            "msm": int(q.get("msm", 0)),
        }
    else:  # booleanq.Q — flat tree with term leaves only
        if getattr(q, "kind", None) != "bool":
            raise ValueError("percolator: register Q.boolean trees (flat)")
        for c in (*q.must, *q.should, *q.must_not):
            if c.kind != "term":
                raise ValueError(
                    "percolator supports flat boolean queries with term "
                    f"leaves; got a {c.kind!r} clause"
                )
        if q.filter:
            raise ValueError("percolator: FILTER clauses not supported")
        raw = {
            "must": [c.token for c in q.must],
            "should": [c.token for c in q.should],
            "not": [c.token for c in q.must_not],
            "msm": int(q.msm),
        }
    out = {"msm": raw["msm"]}
    for role in _ROLES:
        terms: list[str] = []
        for t in raw[role]:
            terms.extend(analyze_py(t, "standard"))
        out[role] = sorted(set(terms))
    if not out["must"] and not out["should"]:
        raise ValueError("percolator: query needs a MUST or SHOULD clause")
    if out["msm"] > len(out["should"]):
        raise ValueError("percolator: msm exceeds SHOULD clause count")
    return out


def register_queries(
    spark: SparkSession, queries: dict[str, object]
) -> tuple[DataFrame, DataFrame]:
    """Compile {query_id: query} into the presearcher tables:
      terms — (query_id, term, role) one row per analyzed distinct clause term
      meta  — (query_id, n_must, n_should, req_should)
    Both are broadcast-sized (queries × terms). req_should bakes in the
    Lucene rule: max(msm, 1) when the query has no MUST clauses, else msm."""
    trows, mrows = [], []
    for qid, q in sorted(queries.items()):
        c = _clauses_of(q)
        for role in _ROLES:
            trows.extend((qid, t, role) for t in c[role])
        req = c["msm"] if c["must"] else max(c["msm"], 1)
        mrows.append((qid, len(c["must"]), len(c["should"]), req))
    terms = spark.createDataFrame(trows, "query_id string, term string, role string")
    meta = spark.createDataFrame(
        mrows, "query_id string, n_must int, n_should int, req_should int"
    )
    return terms, meta


def percolate(
    docs: DataFrame,
    terms: DataFrame,
    meta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, query_id) for every (document, registered query) match,
    ordered by (doc_id, query_id). One doc scan, broadcast joins only."""
    doc_terms = _shingle_rows(docs, id_col, text_col, 1).withColumnRenamed(
        "sh", "term"
    )
    hits = (
        doc_terms.join(F.broadcast(terms), "term")
        .groupBy("id", "query_id")
        .agg(
            F.count(F.when(F.col("role") == "must", 1)).alias("must_hits"),
            F.count(F.when(F.col("role") == "should", 1)).alias("should_hits"),
            F.count(F.when(F.col("role") == "not", 1)).alias("not_hits"),
        )
    )
    matched = (
        hits.join(F.broadcast(meta), "query_id")
        .where(
            (F.col("must_hits") == F.col("n_must"))
            & (F.col("should_hits") >= F.col("req_should"))
            & (F.col("not_hits") == 0)
        )
        .select(F.col("id").alias(id_col), "query_id")
        .orderBy(id_col, "query_id")
    )
    return matched


def percolate_sql(
    docs_table: str,
    queries: dict[str, object],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin: the same presearcher tables inlined as VALUES, the same
    distinct-token join + clause-count evaluation."""
    trows, mrows = [], []
    for qid, q in sorted(queries.items()):
        c = _clauses_of(q)
        for role in _ROLES:
            trows.extend(f"('{qid}', '{t}', '{role}')" for t in c[role])
        req = c["msm"] if c["must"] else max(c["msm"], 1)
        mrows.append(f"('{qid}', {len(c['must'])}, {len(c['should'])}, {req})")
    toks = (
        f"list_filter(regexp_split_to_array(lower(coalesce({text_col},'')),"
        f" '[^a-z0-9]+'), t -> t <> '')"
    )
    return f"""
WITH qt(query_id, term, role) AS (VALUES {", ".join(trows)}),
qm(query_id, n_must, n_should, req_should) AS (VALUES {", ".join(mrows)}),
dt AS (
  SELECT DISTINCT {id_col} AS id, unnest({toks}) AS term FROM {docs_table}
),
hits AS (
  SELECT dt.id, qt.query_id,
         count(*) FILTER (WHERE qt.role = 'must') AS must_hits,
         count(*) FILTER (WHERE qt.role = 'should') AS should_hits,
         count(*) FILTER (WHERE qt.role = 'not') AS not_hits
  FROM dt JOIN qt USING (term)
  GROUP BY dt.id, qt.query_id
)
SELECT h.id AS {id_col}, h.query_id AS query_id
FROM hits h JOIN qm USING (query_id)
WHERE h.must_hits = qm.n_must
  AND h.should_hits >= qm.req_should
  AND h.not_hits = 0
ORDER BY {id_col}, query_id
"""
