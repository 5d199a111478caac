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
_IDX_VERSION = "v014"  # v014: manifest-pinned tombstones + commit history (format v3)

_BM25_K1, _BM25_B = 1.2, 0.75

# the batched-execution gate's query set (fts_topk_batch): mixed boolean modes
_BATCH_TERM_SETS = [
    (["merge"], "or"),
    (["merge", "sort", "join"], "or"),
    (["scan", "filter", "window", "hash"], "or"),
    (["merge", "sort"], "and"),
]
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
        # tool-output text for the 'tool' turns — the SECOND indexed field
        # (fts_topk_field); NULL elsewhere (sparse field, like real transcripts)
        F.expr(
            "CASE WHEN cast(doc_id % 3 as int) = 2 "
            "THEN concat('call ', substring(text, 1, 90)) ELSE NULL END"
        ).alias("tool"),
        F.expr(
            "timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)"
        ).alias("ts"),
    )


# DuckDB CTE prefix shared by every FTS oracle query: derivation + docID
# assignment + tokenize + quantized norms + stats + tf. Parametrized by the
# indexed FIELD expression: per-field n_docs/avgdl/df (the whole prefix
# becomes field-specific, exactly like the engine's per-field stats).
def _oracle_prefix(
    field_expr: str = "text", sfx: str = "", lead: str = "WITH ",
    analyzer: str = "standard", docs_where: str = "",
) -> str:
    """CTE prefix for ONE indexed field. sfx suffixes every CTE name so two
    fields' chains can coexist in one statement (_oracle_multifield_sql);
    lead='' drops the WITH for non-first chains. analyzer selects the
    analysis chain for toks/dl — the oracle twin of the build-side chain
    (analysis.analyze_sql_toks). docs_where (e.g. "WHERE turn_idx < 30")
    restricts the CORPUS before docID assignment — the twin of building the
    engine index over a filtered transcripts DataFrame (the deletes /
    time-travel gates use a bounded subset so their dedicated index stays
    cheap at every sf)."""
    from cuvs_lucene_spark.analysis import analyze_sql_toks
    return f"""
{lead}base{sfx} AS (
  SELECT 'conv-' || lpad(cast(cast(doc_id % 50 AS bigint) AS varchar), 8, '0') AS conv_id,
         cast(doc_id // 50 AS int) AS turn_idx,
         CASE cast(doc_id % 3 AS int) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
         text,
         CASE WHEN cast(doc_id % 3 AS int) = 2 THEN 'call ' || substr(text, 1, 90) ELSE NULL END AS tool,
         TIMESTAMP '2026-01-01 00:00:00' + INTERVAL (doc_id) SECOND AS ts
  FROM documents
),
docs{sfx} AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
         conv_id, turn_idx, role, ts,
         {analyze_sql_toks(f"coalesce({field_expr},'')", analyzer)} AS toks
  FROM base{sfx} {docs_where}
),
dlq{sfx} AS (
  SELECT doc_id, conv_id, turn_idx, role, ts, len(toks) AS dl, toks,
         CASE WHEN len(toks) < 8 THEN len(toks)
              ELSE ((len(toks) >> (length(format('{{:b}}', len(toks))) - 4))
                    << (length(format('{{:b}}', len(toks))) - 4)) END AS dl_d
  FROM docs{sfx}
),
stats{sfx} AS (
  SELECT count(*) FILTER (WHERE dl > 0) AS n_docs,
         sum(dl) FILTER (WHERE dl > 0) AS sum_dl,
         cast(sum(dl) FILTER (WHERE dl > 0) AS double)
           / count(*) FILTER (WHERE dl > 0) AS avgdl
  FROM dlq{sfx}
),
tf{sfx} AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM dlq{sfx}) u
  GROUP BY doc_id, term
)
"""


# primary-field instance (every pre-existing oracle keeps using this)
_ORACLE_PREFIX = _oracle_prefix("text")


def _oracle_phrase_sql(slots: list[str], k: int) -> str:
    """Exact-phrase (slop=0) BM25 top-k in DuckDB SQL — the oracle twin of
    query.search_phrase: pf = count of anchors where every phrase slot i has
    its term at position anchor+i; idf = sum of slot-term idfs (slot order);
    norm = the doc's usual dl.
    """
    n = len(slots)
    occ_union = "\nUNION ALL\n".join(
        f"  SELECT doc_id, {i} AS slot, pos - {i} AS adj "
        f"FROM tokpos WHERE term = '{t}' AND pos >= {i}"
        for i, t in enumerate(slots)
    )
    idf_sum = " + ".join(
        f"(SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)"
        f"/(count(*) + 0.5)) FROM tf WHERE term = '{t}')"
        for t in slots
    )
    return f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
occ AS (
{occ_union}
),
anchors AS (
  SELECT doc_id, adj FROM occ GROUP BY doc_id, adj HAVING count(*) = {n}
),
pfv AS (SELECT doc_id, count(*) AS pf FROM anchors GROUP BY doc_id),
scores AS (
  SELECT p.doc_id,
         ({idf_sum}) * cast(p.pf AS double)
           / (cast(p.pf AS double) + {_BM25_K1} *
              ({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl)) AS score
  FROM pfv p JOIN dlq d ON p.doc_id = d.doc_id CROSS JOIN stats s
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


def _idf_term_sql(t: str) -> str:
    """Per-term idf, 0 when absent (MultiPhraseWeight skips absent terms)."""
    return (
        f"(SELECT CASE WHEN count(*) > 0 THEN "
        f"ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) "
        f"ELSE 0 END FROM tf WHERE term = '{t}')"
    )


def _oracle_multiphrase_sql(slot_alts: list[list[str]], k: int) -> str:
    """MultiPhraseQuery oracle twin: each slot accepts a set of alternative
    terms; an anchor matches when every slot has SOME alternative at its
    position (count of DISTINCT slots at the anchor = n); idf sums over the
    alternatives in slot order (absent terms contribute 0, exactly as
    MultiPhraseWeight skips them)."""
    n = len(slot_alts)
    occ_union = "\nUNION ALL\n".join(
        f"  SELECT doc_id, {i} AS slot, pos - {i} AS adj FROM tokpos "
        f"WHERE term IN ({', '.join(repr(t) for t in alts)}) AND pos >= {i}"
        for i, alts in enumerate(slot_alts)
    )
    idf_sum = " + ".join(
        _idf_term_sql(t) for alts in slot_alts for t in alts
    )
    return f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
occ AS (
{occ_union}
),
anchors AS (
  SELECT doc_id, adj FROM occ GROUP BY doc_id, adj
  HAVING count(DISTINCT slot) = {n}
),
pfv AS (SELECT doc_id, count(*) AS pf FROM anchors GROUP BY doc_id),
scores AS (
  SELECT p.doc_id,
         ({idf_sum}) * cast(p.pf AS double)
           / (cast(p.pf AS double) + {_BM25_K1} *
              ({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl)) AS score
  FROM pfv p JOIN dlq d ON p.doc_id = d.doc_id CROSS JOIN stats s
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


def _oracle_phrase_prefix_sql(first: list[str], prefix: str, k: int) -> str:
    """Phrase-prefix oracle twin (MultiPhrasePrefixQuery shape): the last
    slot's alternatives are the DYNAMIC dictionary expansion of the prefix
    (DISTINCT terms LIKE 'p%'); idf = static sum over the leading slots +
    the expansion terms' idf sum. The expansion idf sum is a COMMON factor
    across all matched docs, so ranking is insensitive to its float
    summation order."""
    n = len(first) + 1
    occ_union = "\nUNION ALL\n".join(
        f"  SELECT doc_id, {i} AS slot, pos - {i} AS adj FROM tokpos "
        f"WHERE term = '{t}' AND pos >= {i}"
        for i, t in enumerate(first)
    )
    last = len(first)
    occ_union += (
        f"\nUNION ALL\n  SELECT doc_id, {last} AS slot, pos - {last} AS adj "
        f"FROM tokpos WHERE term IN (SELECT term FROM expt) AND pos >= {last}"
    )
    idf_static = " + ".join(_idf_term_sql(t) for t in first)
    return f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
expt AS (
  SELECT term,
         ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
  FROM tf WHERE term LIKE '{prefix}%' GROUP BY term
),
occ AS (
{occ_union}
),
anchors AS (
  SELECT doc_id, adj FROM occ GROUP BY doc_id, adj
  HAVING count(DISTINCT slot) = {n}
),
pfv AS (SELECT doc_id, count(*) AS pf FROM anchors GROUP BY doc_id),
scores AS (
  SELECT p.doc_id,
         (({idf_static}) + (SELECT COALESCE(sum(idf), 0) FROM expt))
           * cast(p.pf AS double)
           / (cast(p.pf AS double) + {_BM25_K1} *
              ({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl)) AS score
  FROM pfv p JOIN dlq d ON p.doc_id = d.doc_id CROSS JOIN stats s
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


def sloppy_sweep_cte(slop: int) -> str:
    """The two-slot SloppyPhraseMatcher sweep as a recursive-CTE body.

    Expects an in-scope relation ``pairs(doc_id, la, lb)`` — each doc's two
    sorted ADJUSTED position lists (position − slot) — and yields ``sweep``
    whose ``done`` rows carry the doc's final sloppy freq. State machine =
    query._lucene_sloppy_freq specialized to n=2: s0 is the advancing slot,
    (ia, ib) the 1-based next-unread index per list (both start at 2 — each
    list's head is pre-loaded, one as the popped minimum, one as the standing
    head `nxt`), end_ the max adjusted position consumed, mlen the current
    match length being minimized, freq accumulates 1/(1+mlen) on every
    completed minimization with mlen <= slop (and once at exhaustion).
    Public (reused by tests/test_phrase.py's fuzz pin over random lists)."""
    add = f"(CASE WHEN mlen <= {slop} THEN 1.0/(1.0+mlen) ELSE 0.0 END)"
    return f"""sweep AS (
  SELECT doc_id, la, lb,
         CASE WHEN la[1] <= lb[1] THEN 0 ELSE 1 END AS s0,
         2 AS ia, 2 AS ib,
         greatest(la[1], lb[1]) AS end_,
         greatest(la[1], lb[1]) - least(la[1], lb[1]) AS mlen,
         CASE WHEN la[1] <= lb[1] THEN lb[1] ELSE la[1] END AS nxt,
         cast(0.0 AS double) AS freq, false AS done
  FROM pairs
  UNION ALL
  SELECT doc_id, la, lb,
         CASE WHEN exhausted THEN s0 WHEN p > nxt THEN 1 - s0 ELSE s0 END,
         CASE WHEN NOT exhausted AND s0 = 0 THEN ia + 1 ELSE ia END,
         CASE WHEN NOT exhausted AND s0 = 1 THEN ib + 1 ELSE ib END,
         CASE WHEN exhausted THEN end_ ELSE greatest(end_, p) END,
         CASE WHEN exhausted THEN mlen
              WHEN p > nxt THEN greatest(end_, p) - nxt
              ELSE least(mlen, end_ - p) END,
         CASE WHEN NOT exhausted AND p > nxt THEN p ELSE nxt END,
         freq + CASE WHEN exhausted OR p > nxt THEN {add} ELSE 0.0 END,
         exhausted
  FROM (
    SELECT *,
           (CASE WHEN s0 = 0 THEN ia ELSE ib END)
             > (CASE WHEN s0 = 0 THEN len(la) ELSE len(lb) END) AS exhausted,
           CASE WHEN s0 = 0 THEN la[least(ia, len(la))]
                ELSE lb[least(ib, len(lb))] END AS p
    FROM sweep WHERE NOT done
  )
)"""


def _oracle_phrase_slop_sql(slots: list[str], slop: int, k: int) -> str:
    """Sloppy-phrase (slop>0, TWO distinct slots) BM25 top-k in DuckDB SQL —
    the oracle twin of query.search_phrase(slop>0).

    pf = Σ 1/(1+matchLength) over the matches of the published Lucene-8
    SloppyPhraseMatcher sweep. The sweep is a per-doc sequential merge walk;
    for the two-slot case its state machine is small enough to transliterate
    EXACTLY as a recursive CTE: state = (advancing slot s0, next unread index
    per list, end = max adjusted position consumed, current match length,
    the standing head `nxt`, accumulated freq). Each recursion step consumes
    one position (or finishes a doc), mirroring query._lucene_sloppy_freq
    line for line; equality is additionally fuzz-pinned by
    tests/test_phrase.py::test_duckdb_sweep_matches_engine over random
    position lists. Two-slot only — the gate's query — by construction."""
    if len(slots) != 2 or len(set(slots)) != 2:
        raise ValueError("slop oracle supports exactly 2 distinct slots")
    t0, t1 = slots
    idf_sum = " + ".join(
        f"(SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)"
        f"/(count(*) + 0.5)) FROM tf WHERE term = '{t}')"
        for t in slots
    )
    return f"""{_oracle_prefix("text", lead="WITH RECURSIVE ")},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
pairs AS (
  SELECT a.doc_id, a.la, b.lb
  FROM (SELECT doc_id, list(pos - 0 ORDER BY pos) AS la
        FROM tokpos WHERE term = '{t0}' GROUP BY doc_id) a
  JOIN (SELECT doc_id, list(pos - 1 ORDER BY pos) AS lb
        FROM tokpos WHERE term = '{t1}' GROUP BY doc_id) b USING (doc_id)
),
{sloppy_sweep_cte(slop)},
pfv AS (SELECT doc_id, freq AS pf FROM sweep WHERE done AND freq > 0),
scores AS (
  SELECT p.doc_id,
         ({idf_sum}) * p.pf
           / (p.pf + {_BM25_K1} *
              ({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl)) AS score
  FROM pfv p JOIN dlq d ON p.doc_id = d.doc_id CROSS JOIN stats s
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


def _oracle_topk_sql(
    terms: list[str],
    k: int,
    mode: str,
    filter_sql: str | None,
    field_expr: str = "text",
    exclude: list[str] | None = None,
    msm: int | None = None,
    analyzer: str = "standard",
    boost_sql: str | None = None,
    docs_where: str = "",
) -> str:
    """Full Lucene-BM25 top-k in DuckDB SQL (the per-query oracle).
    boost_sql — FunctionScore factor over the doc row `d` (dlq columns),
    multiplied into the pivoted float64 total exactly like the engine's
    boost_by (search(boost_by=...)).

    The per-doc total is a PIVOTED sum — one max(CASE term) aggregate per
    query term (≤1 row per (doc, term)), added left-to-right in sorted-term
    order — so its float64 value is bit-identical to the engine's _finish,
    which sums in the same fixed order. A plain SUM(...) aggregates in
    arrival order; its last-ULP noise splits exact ties at the k boundary.
    """
    vals = ", ".join(f"('{t}')" for t in terms)
    where = f"AND d.{filter_sql}" if filter_sql else ""
    if exclude:
        ex_vals = ", ".join(f"'{t}'" for t in sorted(set(exclude)))
        where += (
            f" AND tf.doc_id NOT IN (SELECT doc_id FROM tf WHERE term IN ({ex_vals}))"
        )
    and_having = f"HAVING count(*) = {len(terms)}" if mode == "and" else ""
    if msm is not None and mode == "or":
        and_having = f"HAVING count(DISTINCT tf.term) >= {msm}"
    per = (
        f"ts.idf * tf.tf / (tf.tf + {_BM25_K1} * "
        f"({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl))"
    )
    # each pivot column is weighted by the term's multiplicity in the query —
    # the engine (query.py Counter weights) scores a repeated term once per
    # occurrence; a bare COALESCE(max(...)) would collapse duplicates to 1.
    pivot = " + ".join(
        f"{terms.count(t)} * COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0)"
        for t in sorted(set(terms))
    )
    total = f"({pivot})"
    if boost_sql:
        # boost factors reference doc columns through the grouped row — pull
        # them via max() (constant within the doc_id group, ≤1 dlq row/doc)
        total = f"({pivot}) * (max({boost_sql}))"
    return f"""{_oracle_prefix(field_expr, analyzer=analyzer, docs_where=docs_where)},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, {total} AS score
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


def _scores_cte(terms: list[str], mode: str, sfx: str) -> str:
    """Generic pivoted-BM25 per-doc scores CTE (``scores{sfx}``) over the
    shared tf/dlq/stats chain — the reusable core of _oracle_topk_sql, used
    where one statement needs several scored queries (rescoring)."""
    vals = ", ".join(f"('{t}')" for t in terms)
    per = (
        f"ts{sfx}.idf * tf.tf / (tf.tf + {_BM25_K1} * "
        f"({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl))"
    )
    pivot = " + ".join(
        f"{terms.count(t)} * COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0)"
        for t in sorted(set(terms))
    )
    having = f"HAVING count(*) = {len(set(terms))}" if mode == "and" else ""
    return f"""qt{sfx} AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts{sfx} AS (SELECT term,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt{sfx}) GROUP BY term),
scores{sfx} AS (
  SELECT tf.doc_id, ({pivot}) AS score
  FROM tf
  JOIN qt{sfx} ON tf.term = qt{sfx}.term
  JOIN ts{sfx} ON tf.term = ts{sfx}.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
  {having}
)"""


def _oracle_rescore_sql(
    terms1: list[str], mode1: str, terms2: list[str], mode2: str,
    window: int, k: int, w1: float, w2: float,
) -> str:
    """QueryRescorer oracle twin: top-`window` of query 1, combined with
    query 2's scores on exactly those docs (0 where unmatched), top-k of
    w1·s1 + w2·s2."""
    return f"""{_ORACLE_PREFIX},
{_scores_cte(terms1, mode1, "a")},
{_scores_cte(terms2, mode2, "b")},
win AS (
  SELECT doc_id, score AS s1 FROM scoresa
  ORDER BY score DESC, doc_id ASC LIMIT {window}
),
comb AS (
  SELECT w.doc_id, {w1!r} * w.s1 + {w2!r} * COALESCE(b.score, 0.0) AS score
  FROM win w LEFT JOIN scoresb b USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r, score
  FROM comb ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""


def _oracle_synonym_sql(terms: list[str], k: int) -> str:
    """SynonymQuery BM25 top-k in DuckDB SQL — the oracle twin of
    query.search_synonym. The synonym set scores as ONE pseudo-term: per-doc
    freq = Σ tf over the set (integer sum — exact, order-free), idf from the
    MAX docFreq of the member terms (Lucene SynonymQuery merged collection
    stats), one BM25 saturation over the summed freq."""
    in_list = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""{_ORACLE_PREFIX},
syn AS (
  SELECT doc_id, sum(tf) AS tf FROM tf WHERE term IN ({in_list}) GROUP BY doc_id
),
sdf AS (
  SELECT max(df) AS df
  FROM (SELECT count(*) AS df FROM tf WHERE term IN ({in_list}) GROUP BY term)
),
scores AS (
  SELECT p.doc_id,
         ln(1 + ((SELECT n_docs FROM stats) - f.df + 0.5)/(f.df + 0.5))
           * cast(p.tf AS double)
           / (cast(p.tf AS double) + {_BM25_K1} *
              ({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl)) AS score
  FROM syn p JOIN dlq d ON p.doc_id = d.doc_id
  CROSS JOIN stats s CROSS JOIN sdf f
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


def _oracle_group_topk_sql(terms: list[str], k: int, group_col: str) -> str:
    """Grouped top-k oracle: the same pivoted-BM25 scores CTE as
    _oracle_topk_sql, ranked per group with a window instead of a global
    ORDER BY/LIMIT — the DuckDB twin of search(group_by=...)."""
    vals = ", ".join(f"('{t}')" for t in terms)
    per = (
        f"ts.idf * tf.tf / (tf.tf + {_BM25_K1} * "
        f"({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl))"
    )
    pivot = " + ".join(
        f"{terms.count(t)} * COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0)"
        for t in sorted(set(terms))
    )
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, ({pivot}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
grp AS (
  SELECT d.{group_col} AS {group_col}, s.doc_id, s.score, d.conv_id, d.turn_idx,
         row_number() OVER (
           PARTITION BY d.{group_col} ORDER BY s.score DESC, s.doc_id ASC
         ) AS grp_rank
  FROM scores s JOIN dlq d USING (doc_id)
)
SELECT {group_col}, cast(grp_rank AS bigint) AS grp_rank, doc_id, conv_id,
       cast(turn_idx AS bigint) AS turn_idx, round(score, 4) AS score
FROM grp WHERE grp_rank <= {k}
ORDER BY {group_col}, grp_rank
"""


def _oracle_collapse_sql(terms: list[str], k: int, key_col: str) -> str:
    """Field-collapsing oracle (CollapsingTopDocsCollector twin): the same
    pivoted-BM25 scores CTE, one best hit per key value (row_number = 1),
    then the global top-k of the representatives."""
    vals = ", ".join(f"('{t}')" for t in terms)
    per = (
        f"ts.idf * tf.tf / (tf.tf + {_BM25_K1} * "
        f"({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl))"
    )
    pivot = " + ".join(
        f"{terms.count(t)} * COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0)"
        for t in sorted(set(terms))
    )
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, ({pivot}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
reps AS (
  SELECT s.doc_id, s.score, d.conv_id, d.turn_idx,
         row_number() OVER (
           PARTITION BY d.{key_col} ORDER BY s.score DESC, s.doc_id ASC
         ) AS rn
  FROM scores s JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, conv_id, turn_idx, round(score, 4) AS score_r, score
  FROM reps WHERE rn = 1 ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT row_number() OVER (ORDER BY score_r DESC, doc_id ASC) AS rank,
       doc_id, conv_id, cast(turn_idx AS bigint) AS turn_idx,
       score_r AS score
FROM topk
ORDER BY rank
"""


def _oracle_blockjoin_sql(terms: list[str], k: int, parent_col: str) -> str:
    """Block-join oracle (ToParentBlockJoinQuery / ScoreMode.Total twin):
    the same pivoted-BM25 scores CTE rolled up to the parent key. Children
    are summed as DECIMAL(38,10) — the per-child doubles are bit-identical
    to the engine's pivot totals, so the exact decimal sum is
    order-independent and matches the engine's decimal aggregation."""
    return f"""{_ORACLE_PREFIX},
{_scores_cte(terms, "or", "")},
parents AS (
  SELECT d.{parent_col} AS parent,
         CAST(sum(CAST(s.score AS DECIMAL(38,10))) AS DOUBLE) AS score,
         count(*) AS n_hits
  FROM scores s JOIN dlq d USING (doc_id)
  GROUP BY d.{parent_col}
),
topk AS (
  SELECT parent, round(score, 4) AS score_r, n_hits
  FROM parents ORDER BY score DESC, parent ASC LIMIT {k}
)
SELECT row_number() OVER (ORDER BY score_r DESC, parent ASC) AS rank,
       parent AS {parent_col}, cast(n_hits AS bigint) AS n_hits,
       score_r AS score
FROM topk
ORDER BY rank
"""


def _oracle_common_sql(terms: list[str], ratio: float, k: int) -> str:
    """CommonTermsQuery oracle twin: the df split is computed IN SQL (a
    term's df vs ratio × n_docs; absent terms land in the rare group, like
    Lucene) — the MUST constraint is a dynamic HAVING over the rare set.
    The score pivot adds matched-term contributions in QUERY order, which
    the engine's clause order (rare-then-common, query order within groups)
    equals because `terms` lists the rare terms first."""
    vals = ", ".join(f"('{t}')" for t in terms)
    per = (
        f"ts.idf * tf.tf / (tf.tf + {_BM25_K1} * "
        f"({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl))"
    )
    pivot = " + ".join(
        f"COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0)"
        for t in terms
    )
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
lowt AS (
  SELECT qt.term FROM qt LEFT JOIN ts USING (term)
  WHERE COALESCE(ts.df, 0) <= {ratio} * (SELECT n_docs FROM stats)
),
scores AS (
  SELECT tf.doc_id, ({pivot}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
  HAVING count(DISTINCT CASE WHEN tf.term IN (SELECT term FROM lowt)
                             THEN tf.term END)
       = (SELECT count(*) FROM lowt)
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


def _oracle_classic_sql(terms: list[str], k: int) -> str:
    """TFIDFSimilarity ("classic") top-k oracle: per-term score
    idf'² · √tf · 1/√dl_d with idf' = 1 + ln((N+1)/(df+1)), same pivoted
    fixed-order float64 sum as the BM25 oracle."""
    vals = ", ".join(f"('{t}')" for t in terms)
    per = (
        "ts.idfsq * sqrt(cast(tf.tf AS double)) / sqrt(d.dl_d)"
    )
    pivot = " + ".join(
        f"{terms.count(t)} * COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0)"
        for t in sorted(set(terms))
    )
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df,
              power(1 + ln(((SELECT n_docs FROM stats) + 1.0)/(count(*) + 1.0)), 2) AS idfsq
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, ({pivot}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  GROUP BY tf.doc_id
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


def _oracle_lmd_sql(terms: list[str], k: int, mu: float = 2000.0) -> str:
    """LMDirichletSimilarity top-k oracle: per matched term
    max(0, ln(1 + tf/(mu·p_c)) + ln(mu/(dl_d+mu))) with
    p_c = (cf+1)/(sumTotalTermFreq+1), same pivoted fixed-order float64 sum
    as the BM25 oracle (cf and sum_dl computed in-SQL from the token
    stream — the twin of the dictionary's cf column and the field stats)."""
    vals = ", ".join(f"('{t}')" for t in terms)
    per = (
        f"greatest(0, ln(1 + tf.tf / ({mu} * ts.pc)) "
        f"+ ln({mu} / (d.dl_d + {mu})))"
    )
    pivot = " + ".join(
        f"{terms.count(t)} * COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0)"
        for t in sorted(set(terms))
    )
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term,
              (sum(tf) + 1.0) / ((SELECT sum_dl FROM stats) + 1.0) AS pc
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, ({pivot}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  GROUP BY tf.doc_id
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


def _oracle_bm25_tuned_sql(
    terms: list[str], k: int, k1: float = 0.9, b: float = 0.4
) -> str:
    """BM25 with non-default free parameters (BM25Similarity(k1, b) — the
    0.9/0.4 pair is the published short-text tuning): the standard pivoted
    oracle with k1/b interpolated instead of the 1.2/0.75 constants."""
    vals = ", ".join(f"('{t}')" for t in terms)
    per = (
        f"ts.idf * tf.tf / (tf.tf + {k1} * "
        f"({1 - b} + {b} * d.dl_d / s.avgdl))"
    )
    pivot = " + ".join(
        f"{terms.count(t)} * COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0)"
        for t in sorted(set(terms))
    )
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, ({pivot}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
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


def _oracle_context_sql(terms: list[str], k: int, window: int) -> str:
    """Context-retrieval oracle: the standard BM25 topk CTE, each hit
    expanded to its ±window turn neighborhood via a conv_id + turn-range
    join against the corpus CTE (the twin of search_with_context's
    broadcast range join)."""
    vals = ", ".join(f"('{t}')" for t in terms)
    per = (
        f"ts.idf * tf.tf / (tf.tf + {_BM25_K1} * "
        f"({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl))"
    )
    pivot = " + ".join(
        f"{terms.count(t)} * COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0)"
        for t in sorted(set(terms))
    )
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, ({pivot}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT {k}
),
hitk AS (
  SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
         t.doc_id, d.conv_id, d.turn_idx, t.score_r
  FROM topk t JOIN dlq d USING (doc_id)
)
SELECT h.rank, h.doc_id AS doc_id, h.conv_id AS conv_id,
       cast(h.turn_idx AS bigint) AS turn_idx,
       cast(b.turn_idx AS bigint) AS ctx_turn_idx,
       cast(b.turn_idx - h.turn_idx AS bigint) AS ctx_offset,
       cast(b.turn_idx = h.turn_idx AS bigint) AS is_hit,
       b.role AS role, b.text AS text, h.score_r AS score
FROM hitk h JOIN base b ON b.conv_id = h.conv_id
  AND b.turn_idx BETWEEN h.turn_idx - {window} AND h.turn_idx + {window}
ORDER BY rank, ctx_turn_idx
"""


def _oracle_lmjm_sql(terms: list[str], k: int, lam: float = 0.1) -> str:
    """LMJelinekMercerSimilarity top-k oracle: per matched term
    ln(1 + ((1-λ)·tf/dl_d)/(λ·p_c)) with the same in-SQL p_c as the
    Dirichlet oracle; always positive, no clamp."""
    vals = ", ".join(f"('{t}')" for t in terms)
    per = (
        f"ln(1 + (({1.0 - lam}) * tf.tf / d.dl_d) / ({lam} * ts.pc))"
    )
    pivot = " + ".join(
        f"{terms.count(t)} * COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0)"
        for t in sorted(set(terms))
    )
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term,
              (sum(tf) + 1.0) / ((SELECT sum_dl FROM stats) + 1.0) AS pc
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, ({pivot}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  GROUP BY tf.doc_id
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


def _oracle_highlight_sql(
    terms: list[str], k: int, window_size: int = 12, lead: int = 3,
    pre: str = "<em>", post: str = "</em>",
) -> str:
    """Highlighter oracle (Lucene Highlighter twin): the pivoted-BM25 topk
    CTE, then the pinned fragment semantics over the token stream —
    start = max(0, first-match − lead), fixed window, matches tag-wrapped,
    snippet reproduced via ordered string_agg (the analyzed-token snippet;
    the engine's original-text snippet column is pytest-pinned instead)."""
    vals = ", ".join(f"('{t}')" for t in terms)
    tset = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    per = (
        f"ts.idf * tf.tf / (tf.tf + {_BM25_K1} * "
        f"({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl))"
    )
    pivot = " + ".join(
        f"{terms.count(t)} * COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0)"
        for t in sorted(set(terms))
    )
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, ({pivot}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r, score
  FROM scores ORDER BY score DESC, doc_id ASC LIMIT {k}
),
tokpos AS (
  SELECT d.doc_id, unnest(d.toks) AS term,
         generate_subscripts(d.toks, 1) - 1 AS pos
  FROM dlq d JOIN topk t USING (doc_id)
),
wb AS (
  SELECT doc_id, greatest(cast(min(pos) AS bigint) - {lead}, 0) AS start_pos
  FROM tokpos WHERE term IN ({tset}) GROUP BY doc_id
),
frag AS (
  SELECT tp.doc_id, w.start_pos,
         string_agg(
           CASE WHEN tp.term IN ({tset})
                THEN '{pre}' || tp.term || '{post}' ELSE tp.term END,
           ' ' ORDER BY tp.pos) AS snippet_tokens,
         count(*) FILTER (WHERE tp.term IN ({tset})) AS n_match
  FROM tokpos tp
  JOIN wb w ON tp.doc_id = w.doc_id
      AND tp.pos >= w.start_pos AND tp.pos < w.start_pos + {window_size}
  GROUP BY tp.doc_id, w.start_pos
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score,
       cast(f.start_pos AS bigint) AS start_pos,
       cast(f.n_match AS bigint) AS n_match,
       f.snippet_tokens AS snippet_tokens
FROM topk t JOIN dlq d USING (doc_id) JOIN frag f USING (doc_id)
ORDER BY rank
"""


def _oracle_sorted_sql(terms: list[str], k: int, desc: bool = True) -> str:
    """Field-sorted search oracle: match set (no scoring) ordered by ts."""
    vals = ", ".join(f"'{t}'" for t in terms)
    d = "DESC" if desc else "ASC"
    return f"""{_ORACLE_PREFIX}
SELECT d.doc_id, d.conv_id, cast(d.turn_idx AS bigint) AS turn_idx,
       cast(epoch(d.ts) AS bigint) AS ts_epoch
FROM dlq d
WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term IN ({vals}))
ORDER BY d.ts {d}, d.doc_id ASC
LIMIT {k}
"""


def _oracle_multifield_sql(terms: list[str], k: int, field_exprs: list[str]) -> str:
    """Cross-field BM25 top-k in DuckDB SQL — the oracle twin of
    query.search_fields: each field gets its own full CTE chain (per-field
    n_docs/avgdl/df/idf), per-field subtotals are term-sorted pivot sums,
    and the total adds subtotals left-to-right in field order — grouping
    float64 additions exactly as the engine does, so values hash-match."""
    vals = ", ".join(f"('{t}')" for t in terms)
    chains = "".join(
        _oracle_prefix(fe, sfx=f"_f{i}", lead="WITH " if i == 0 else ",")
        for i, fe in enumerate(field_exprs)
    )
    score_ctes = []
    for i in range(len(field_exprs)):
        s = f"_f{i}"
        per = (
            f"ts{s}.idf * tf{s}.tf / (tf{s}.tf + {_BM25_K1} * "
            f"({1 - _BM25_B} + {_BM25_B} * d.dl_d / st.avgdl))"
        )
        pivot = " + ".join(
            f"{terms.count(t)} * COALESCE(max(CASE WHEN tf{s}.term = '{t}' THEN {per} END), 0)"
            for t in sorted(set(terms))
        )
        score_ctes.append(f"""
sc{s} AS (
  SELECT tf{s}.doc_id, ({pivot}) AS score
  FROM tf{s}
  JOIN qt ON tf{s}.term = qt.term
  JOIN (SELECT term, count(*) AS df,
               ln(1 + ((SELECT n_docs FROM stats{s}) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
        FROM tf{s} WHERE term IN (SELECT term FROM qt) GROUP BY term) ts{s}
    ON tf{s}.term = ts{s}.term
  JOIN dlq{s} d ON tf{s}.doc_id = d.doc_id
  CROSS JOIN stats{s} st
  GROUP BY tf{s}.doc_id
)""")
    # left-assoc full-outer chain: u0 = sc_f0; u_i = u_{i-1} ⟗ sc_fi with
    # score = COALESCE(prev,0) + COALESCE(this,0) — the engine's field order
    union_ctes = ["u0 AS (SELECT doc_id, score FROM sc_f0)"]
    for i in range(1, len(field_exprs)):
        union_ctes.append(f"""
u{i} AS (
  SELECT doc_id,
         COALESCE(a.score, 0) + COALESCE(b.score, 0) AS score
  FROM u{i - 1} a FULL OUTER JOIN sc_f{i} b USING (doc_id)
)""")
    last = f"u{len(field_exprs) - 1}"
    return f"""{chains},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
{", ".join(score_ctes)},
{", ".join(union_ctes)},
topk AS (
  SELECT doc_id, round(score, 4) AS score_r, score
  FROM {last} ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq_f0 d USING (doc_id)
ORDER BY rank
"""


def _oracle_dismax_sql(
    terms: list[str], k: int, field_exprs: list[str], tiebreak: float
) -> str:
    """DisjunctionMaxQuery oracle twin of query.search_fields(combine=
    'dismax'): per-field CTE chains as in _oracle_multifield_sql, but the
    full-outer chain CARRIES each field's subtotal column, and the final
    combine is GREATEST(s_f…) + tiebreak · (Σ s_f − GREATEST(s_f…)) with the
    Σ added left-to-right in field order — the engine's exact float64 ops."""
    vals = ", ".join(f"('{t}')" for t in terms)
    chains = "".join(
        _oracle_prefix(fe, sfx=f"_f{i}", lead="WITH " if i == 0 else ",")
        for i, fe in enumerate(field_exprs)
    )
    score_ctes = []
    for i in range(len(field_exprs)):
        s = f"_f{i}"
        per = (
            f"ts{s}.idf * tf{s}.tf / (tf{s}.tf + {_BM25_K1} * "
            f"({1 - _BM25_B} + {_BM25_B} * d.dl_d / st.avgdl))"
        )
        pivot = " + ".join(
            f"{terms.count(t)} * COALESCE(max(CASE WHEN tf{s}.term = '{t}' THEN {per} END), 0)"
            for t in sorted(set(terms))
        )
        score_ctes.append(f"""
sc{s} AS (
  SELECT tf{s}.doc_id, ({pivot}) AS score
  FROM tf{s}
  JOIN qt ON tf{s}.term = qt.term
  JOIN (SELECT term, count(*) AS df,
               ln(1 + ((SELECT n_docs FROM stats{s}) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
        FROM tf{s} WHERE term IN (SELECT term FROM qt) GROUP BY term) ts{s}
    ON tf{s}.term = ts{s}.term
  JOIN dlq{s} d ON tf{s}.doc_id = d.doc_id
  CROSS JOIN stats{s} st
  GROUP BY tf{s}.doc_id
)""")
    # full-outer chain carrying PER-FIELD subtotal columns s0..s_{n-1}
    union_ctes = ["u0 AS (SELECT doc_id, COALESCE(score, 0) AS s0 FROM sc_f0)"]
    for i in range(1, len(field_exprs)):
        carried = ", ".join(f"COALESCE(a.s{j}, 0) AS s{j}" for j in range(i))
        union_ctes.append(f"""
u{i} AS (
  SELECT doc_id, {carried}, COALESCE(b.score, 0) AS s{i}
  FROM u{i - 1} a FULL OUTER JOIN sc_f{i} b USING (doc_id)
)""")
    last = f"u{len(field_exprs) - 1}"
    cols = [f"s{j}" for j in range(len(field_exprs))]
    best = f"GREATEST({', '.join(cols)})" if len(cols) > 1 else cols[0]
    total = " + ".join(cols)
    return f"""{chains},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
{", ".join(score_ctes)},
{", ".join(union_ctes)},
topk AS (
  SELECT doc_id,
         round({best} + {tiebreak!r} * (({total}) - {best}), 4) AS score_r,
         {best} + {tiebreak!r} * (({total}) - {best}) AS score
  FROM {last} ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq_f0 d USING (doc_id)
ORDER BY rank
"""


def _oracle_multiterm_sql(term_pred: str, k: int) -> str:
    """Dynamic-term-set BM25 top-k oracle (MultiTermQuery rewrite twin).

    The expanded term set is data-dependent (a predicate over the term
    dictionary), so the fixed-pivot trick of _oracle_topk_sql is unavailable;
    determinism of the float64 total comes from list_reduce over per-term
    scores collected in sorted-term order — an explicit left fold, the same
    association as the engine's sorted-term pivot sum (adding the engine's
    zero terms is a float64 no-op: x + 0.0 == x exactly)."""
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT DISTINCT term FROM tf WHERE {term_pred}),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
per AS (
  SELECT tf.doc_id, tf.term,
         ts.idf * tf.tf / (tf.tf + {_BM25_K1} *
           ({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl)) AS s
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
),
scores AS (
  SELECT doc_id, list_reduce(list(s ORDER BY term), (a, b) -> a + b) AS score
  FROM per GROUP BY doc_id
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


def _oracle_mlt_sql(
    like_text: str,
    k: int,
    max_query_terms: int,
    min_term_freq: int,
    min_doc_freq: int,
) -> str:
    """MoreLikeThis oracle twin (mlt.more_like_this): tokenize the example
    text with the SAME analyzer expression as the corpus CTE, select
    candidates by the integer key (tf_like DESC, df ASC, term ASC) capped at
    max_query_terms, then the dynamic-term BM25 fold of
    _oracle_multiterm_sql over the selected set."""
    lit = like_text.replace("'", "''")
    return f"""{_ORACLE_PREFIX},
lt AS (
  SELECT term, count(*) AS tf_like
  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower('{lit}'), '[^a-z0-9]+'), x -> x <> '')) AS term)
  GROUP BY term
  HAVING count(*) >= {min_term_freq}
),
cdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
qt AS (
  SELECT l.term
  FROM lt l JOIN cdf c USING (term)
  WHERE c.df >= {min_doc_freq}
  ORDER BY l.tf_like DESC, c.df ASC, l.term ASC
  LIMIT {max_query_terms}
),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
per AS (
  SELECT tf.doc_id, tf.term,
         ts.idf * tf.tf / (tf.tf + {_BM25_K1} *
           ({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl)) AS s
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
),
scores AS (
  SELECT doc_id, list_reduce(list(s ORDER BY term), (a, b) -> a + b) AS score
  FROM per GROUP BY doc_id
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


# the MLT gate's example text: >5 distinct corpus terms so the
# max_query_terms=5 cut is exercised; 'world' repeated so tf ranking matters
_MLT_TEXT = "the world of world data and the school student country help"


# the boolean-AST gate's query tree: (scan AND (filter OR window^2.0)) NOT merge
def _boolean_gate_tree():
    from cuvs_lucene_spark.booleanq import Q

    return Q.boolean(
        must=[
            Q.term("scan"),
            Q.boolean(should=[Q.term("filter"), Q.term("window", boost=2.0)]),
        ],
        must_not=[Q.term("merge")],
    )


# the const/filter gate's tree: ConstantScoreQuery (boost 1.5 over a
# disjunction) + a FILTER-occur clause (required, never scored) + MUST_NOT —
# the full BooleanClause.Occur surface in one tree
def _constfilter_gate_tree():
    from cuvs_lucene_spark.booleanq import Q

    return Q.boolean(
        should=[
            Q.const(
                Q.boolean(should=[Q.term("window"), Q.term("scan")]),
                boost=1.5,
            ),
            Q.term("merge"),
        ],
        filter=[Q.term("sort")],
        must_not=[Q.term("hash")],
    )


def _oracle_boolean_sql(k: int, tree=None) -> str:
    """Nested-BooleanQuery oracle: match/score SQL generated from the SAME
    AST walker the engine compiles (booleanq.sql_exprs), over the standard
    per-doc pivot — one definition of the semantics, two executors."""
    from cuvs_lucene_spark.booleanq import sql_exprs

    tree = tree if tree is not None else _boolean_gate_tree()
    terms = tree.all_terms()
    vals = ", ".join(f"('{t}')" for t in terms)
    per = (
        "ts.idf * tf.tf / (tf.tf + {k1} * ({omb} + {b} * d.dl_d / s.avgdl))"
    ).format(k1=_BM25_K1, omb=1 - _BM25_B, b=_BM25_B)
    match_sql, score_sql = sql_exprs(
        tree,
        lambda t: f"bool_or(tf.term = '{t}')",
        lambda t: f"COALESCE(max(CASE WHEN tf.term = '{t}' THEN {per} END), 0.0)",
    )
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, ({match_sql}) AS ok, ({score_sql}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY tf.doc_id
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r, score
  FROM scores WHERE ok ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""


# the span-in-boolean gate's tree: (MUST span_near("merge sort")~5) with an
# optional 'filter' scorer, NOT 'hash' — a SpanQuery nested in BooleanQuery
def _boolean_span_gate_tree():
    from cuvs_lucene_spark.booleanq import Q

    return Q.boolean(
        must=[Q.span_near("merge sort", slop=5)],
        should=[Q.term("filter")],
        must_not=[Q.term("hash")],
    )


def _oracle_boolean_span_sql(k: int) -> str:
    """Span-leaf-in-boolean oracle: match/score SQL from the SAME AST walker
    the engine compiles (booleanq.sql_exprs); the span leaf scores from the
    ordered min-position chain CTE LEFT-JOINed onto the per-doc pivot,
    exactly like the phrase-leaf oracle machinery."""
    from cuvs_lucene_spark.booleanq import sql_exprs

    tree = _boolean_span_gate_tree()
    sp = tree.span_leaves()[0]
    vals = ", ".join(f"('{t}')" for t in tree.all_terms())
    per = (
        "ts.idf * tf.tf / (tf.tf + {k1} * ({omb} + {b} * d.dl_d / s.avgdl))"
    ).format(k1=_BM25_K1, omb=1 - _BM25_B, b=_BM25_B)

    def present_sql(kk: str) -> str:
        if kk == sp.key():
            return "bool_or(sp0.doc_id IS NOT NULL)"
        return f"bool_or(tf.term = '{kk}')"

    def score_sql(kk: str) -> str:
        if kk == sp.key():
            return "COALESCE(max(sp0.score), 0.0)"
        return f"COALESCE(max(CASE WHEN tf.term = '{kk}' THEN {per} END), 0.0)"

    match_s, score_s = sql_exprs(tree, present_sql, score_sql)
    return f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
m0 AS (SELECT doc_id, pos AS p0 FROM tokpos WHERE term = 'merge'),
m1 AS (SELECT m0.doc_id, p0,
         (SELECT min(pos) FROM tokpos t
          WHERE t.doc_id = m0.doc_id AND t.term = 'sort'
            AND t.pos >= m0.p0 + 1) AS p1
       FROM m0),
spmatch AS (
  SELECT doc_id, p1 - p0 - 1 AS width FROM m1 WHERE p1 IS NOT NULL
),
sppf AS (
  SELECT doc_id, sum(1.0 / (1.0 + width)) AS pf
  FROM spmatch WHERE width <= 5 GROUP BY doc_id
),
spidf AS (
  SELECT sum(idf) AS idf_sum FROM (
    SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
              / (count(*) + 0.5)) AS idf
    FROM tf WHERE term IN ('merge', 'sort') GROUP BY term)
),
sp0 AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM spidf) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM sppf p JOIN dlq d USING (doc_id)
),
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, ({match_s}) AS ok, ({score_s}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
  LEFT JOIN sp0 ON tf.doc_id = sp0.doc_id
  GROUP BY tf.doc_id
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r, score
  FROM scores WHERE ok ORDER BY score DESC, doc_id ASC LIMIT {k}
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""


def _oracle_boolean_count_sql() -> str:
    """count(BooleanQuery) oracle: the SAME sql_exprs match predicate the
    top-k boolean oracle uses, reduced to a live-doc count — scores never
    computed (the count surface is presence-only in the engine too)."""
    from cuvs_lucene_spark.booleanq import sql_exprs

    tree = _boolean_gate_tree()
    vals = ", ".join(f"('{t}')" for t in tree.all_terms())
    match_sql, _ = sql_exprs(
        tree,
        lambda t: f"bool_or(tf.term = '{t}')",
        lambda t: "0.0",
    )
    return f"""{_ORACLE_PREFIX},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
matches AS (
  SELECT tf.doc_id, ({match_sql}) AS ok
  FROM tf JOIN qt ON tf.term = qt.term
  GROUP BY tf.doc_id
)
SELECT cast(count(*) AS bigint) AS n FROM matches WHERE ok
"""


# the query-string gate: classic syntax with MUST/SHOULD/MUST_NOT modifiers,
# a boosted nested group, AND a phrase leaf inside the boolean tree
_QSTRING_GATE = '+scan (filter OR window^2.0) "merge sort" -hash'

# the english-chain gate's raw query: stopword dropped ("the"), plurals
# stemmed query-side (columns→column, merges→merge); the corpus itself
# contains stopwords (a/the in ~60% of docs), so the BUILD-side chain (dl
# excludes them, df drops them) is what the oracle verifies
_ENG_QUERY = "The columns merges"


def _qstring_gate_tree():
    from cuvs_lucene_spark.qparser import compile_query

    # reader-free compile: the gate string has only term/phrase leaves, so
    # the SAME compiled Q tree drives both the engine and the oracle SQL
    return compile_query(_QSTRING_GATE)


def _oracle_qstring_sql(k: int) -> str:
    """Query-string oracle: the gate string compiles to the same Q tree the
    engine executes (qparser.compile_query), booleanq.sql_exprs emits its
    match/score SQL, and each phrase leaf scores from a per-phrase anchor
    CTE chain (the _oracle_phrase_sql machinery) LEFT-JOINed onto the
    per-doc pivot — one definition of the semantics, two executors."""
    from cuvs_lucene_spark.booleanq import sql_exprs

    tree = _qstring_gate_tree()
    phrases = tree.phrase_leaves()
    terms = tree.all_terms()  # term leaves + phrase slot terms (scan set)
    vals = ", ".join(f"('{t}')" for t in terms)

    phrase_ctes, key_to_rel = [], {}
    for j, p in enumerate(phrases):
        slots = p.token.split(" ")
        n = len(slots)
        occ_union = "\nUNION ALL\n".join(
            f"  SELECT doc_id, {i} AS slot, pos - {i} AS adj "
            f"FROM tokpos WHERE term = '{t}' AND pos >= {i}"
            for i, t in enumerate(slots)
        )
        idf_sum = " + ".join(
            f"(SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)"
            f"/(count(*) + 0.5)) FROM tf WHERE term = '{t}')"
            for t in slots
        )
        phrase_ctes.append(f"""occ{j} AS (
{occ_union}
),
anchors{j} AS (
  SELECT doc_id, adj FROM occ{j} GROUP BY doc_id, adj HAVING count(*) = {n}
),
pfv{j} AS (SELECT doc_id, count(*) AS pf FROM anchors{j} GROUP BY doc_id),
ph{j} AS (
  SELECT p.doc_id,
         ({idf_sum}) * cast(p.pf AS double)
           / (cast(p.pf AS double) + {_BM25_K1} *
              ({1 - _BM25_B} + {_BM25_B} * d.dl_d / s.avgdl)) AS score
  FROM pfv{j} p JOIN dlq d ON p.doc_id = d.doc_id CROSS JOIN stats s
)""")
        key_to_rel[p.key()] = f"ph{j}"

    per = (
        "ts.idf * tf.tf / (tf.tf + {k1} * ({omb} + {b} * d.dl_d / s.avgdl))"
    ).format(k1=_BM25_K1, omb=1 - _BM25_B, b=_BM25_B)

    def present_sql(kk: str) -> str:
        rel = key_to_rel.get(kk)
        if rel:
            return f"bool_or({rel}.doc_id IS NOT NULL)"
        return f"bool_or(tf.term = '{kk}')"

    def score_sql(kk: str) -> str:
        rel = key_to_rel.get(kk)
        if rel:
            return f"COALESCE(max({rel}.score), 0.0)"
        return f"COALESCE(max(CASE WHEN tf.term = '{kk}' THEN {per} END), 0.0)"

    match_s, score_s = sql_exprs(tree, present_sql, score_sql)
    joins = "\n  ".join(
        f"LEFT JOIN {rel} ON tf.doc_id = {rel}.doc_id"
        for rel in key_to_rel.values()
    )
    ph_block = ""
    if phrases:
        ph_block = (
            ",\ntokpos AS (\n"
            "  SELECT doc_id, unnest(toks) AS term, "
            "generate_subscripts(toks, 1) - 1 AS pos\n  FROM dlq\n),\n"
            + ",\n".join(phrase_ctes)
        )
    return f"""{_ORACLE_PREFIX}{ph_block},
qt AS (SELECT * FROM (VALUES {vals}) AS v(term)),
ts AS (SELECT term, count(*) AS df,
              ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)/(count(*) + 0.5)) AS idf
       FROM tf WHERE term IN (SELECT term FROM qt) GROUP BY term),
scores AS (
  SELECT tf.doc_id, ({match_s}) AS ok, ({score_s}) AS score
  FROM tf
  JOIN qt ON tf.term = qt.term
  JOIN ts ON tf.term = ts.term
  JOIN dlq d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
  {joins}
  GROUP BY tf.doc_id
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r, score
  FROM scores WHERE ok ORDER BY score DESC, doc_id ASC LIMIT {k}
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
        buckets=8, salt_buckets=4, hot_df_ratio=0.20, positions=True,
        fields=("text", "tool"),
    )  # idempotent: committed manifest → no-op
    return d


def _index_for_eng(spark: SparkSession, sf_dir: str) -> str:
    """Second per-sf index built with the "english" analysis chain (stop
    filter + minimal stemmer) — analyzers are per-index in Lucene, so the
    english gate gets its own small index, cached by manifest idempotence."""
    from cuvs_lucene_spark.operators.build import build_index

    _ensure_pkg(spark)
    d = _index_dir(sf_dir) + "_eng"
    build_index(
        spark, derive_transcripts(spark, sf_dir), d,
        buckets=8, salt_buckets=4, hot_df_ratio=0.20, analyzer="english",
    )
    return d


# deletes / time-travel gates: a dedicated BOUNDED-subset index (≤50 convs ×
# _DEL_SUBSET_TURNS turns regardless of sf, so the extra build stays cheap at
# the bench tier) with a deterministic tombstone set committed once per index
# lifetime. The oracle twins restrict the corpus with the SAME predicate via
# _oracle_prefix(docs_where=...).
_DEL_SUBSET_TURNS = 30
_DEL_PRED = "turn_idx % 7 = 3"  # deterministic victim set (delete-by-term)


def _index_for_del(spark: SparkSession, sf_dir: str) -> str:
    from cuvs_lucene_spark.operators.build import build_index
    from cuvs_lucene_spark.operators.deletes import delete_docs, has_deletes
    from cuvs_lucene_spark.query import IndexReader
    from cuvs_lucene_spark.sources.catalog import IndexCatalog

    _ensure_pkg(spark)
    d = _index_dir(sf_dir) + "_del"
    build_index(
        spark,
        derive_transcripts(spark, sf_dir).where(
            F.col("turn_idx") < _DEL_SUBSET_TURNS
        ),
        d, buckets=8, salt_buckets=4, hot_df_ratio=0.20,
    )
    if not has_deletes(IndexCatalog(d)):  # commit the victim set exactly once
        keys = (
            IndexReader(spark, d).cat.read_doc_dim(spark)
            .where(F.expr(_DEL_PRED))
            .select("conv_id", "turn_idx")
        )
        delete_docs(spark, d, keys)
    return d


_ADDIDX_SPLIT = "conv-00000025"  # halves split on the docID sort boundary
_TV_KEY = ("conv-00000007", 3)  # term-vectors gate document (exists at all sfs)


def _index_for_addidx(spark: SparkSession, sf_dir: str) -> str:
    """addIndexes gate index: the same bounded subset corpus built as TWO
    half indexes (split on the (conv_id, turn_idx) sort boundary, so the
    shifted docIDs reproduce the single-shot assignment) then spliced with
    add_indexes — results must hash-match the full-subset oracle."""
    from cuvs_lucene_spark.operators.admin import add_indexes
    from cuvs_lucene_spark.operators.build import build_index
    from cuvs_lucene_spark.sources.catalog import IndexCatalog

    _ensure_pkg(spark)
    dst = _index_dir(sf_dir) + "_addidx"
    src = dst + "_src"
    tx = derive_transcripts(spark, sf_dir).where(
        F.col("turn_idx") < _DEL_SUBSET_TURNS
    )
    kw = dict(buckets=8, salt_buckets=4, hot_df_ratio=0.20)
    build_index(spark, tx.where(F.col("conv_id") < _ADDIDX_SPLIT), dst, **kw)
    build_index(spark, tx.where(F.col("conv_id") >= _ADDIDX_SPLIT), src, **kw)
    if len(IndexCatalog(dst).committed_segment_ids()) < 2:  # import exactly once
        add_indexes(spark, dst, src)
    return dst


def _index_for_dv(spark: SparkSession, sf_dir: str) -> str:
    """Doc-values-update gate index: the bounded subset corpus plus TWO
    committed DV batches on field 'quality' (default 1.0) — batch 2
    overwrites a subset of batch 1's keys, so the gate pins last-write-wins
    on top of the boost composition (updateNumericDocValue analog,
    operators/docvalues.py)."""
    from cuvs_lucene_spark.operators.build import build_index
    from cuvs_lucene_spark.operators.docvalues import update_doc_values
    from cuvs_lucene_spark.query import IndexReader
    from cuvs_lucene_spark.sources.catalog import IndexCatalog

    _ensure_pkg(spark)
    d = _index_dir(sf_dir) + "_dv"
    build_index(
        spark,
        derive_transcripts(spark, sf_dir).where(
            F.col("turn_idx") < _DEL_SUBSET_TURNS
        ),
        d, buckets=8, salt_buckets=4, hot_df_ratio=0.20,
    )
    if "quality" not in IndexCatalog(d).dv_fields():  # commit exactly once
        dd = IndexReader(spark, d).cat.read_doc_dim(spark)
        update_doc_values(
            spark, d, "quality",
            dd.where("turn_idx % 5 = 1").select(
                "conv_id", "turn_idx", F.lit(2.0).alias("value")
            ),
            default=1.0,
        )
        update_doc_values(
            spark, d, "quality",
            dd.where("turn_idx % 10 = 1").select(
                "conv_id", "turn_idx",
                (
                    F.lit(1.0)
                    + F.col("turn_idx").cast("double") / F.lit(50.0)
                ).alias("value"),
            ),
            default=1.0,
        )
    return d


def _pre_delete_version(index_dir: str) -> int:
    """Newest commit with an empty tombstone list = the last pure-build
    commit (the delete batch is its own commit, so this is deterministic
    across re-invocations — has_deletes gates re-deletion)."""
    from cuvs_lucene_spark.sources.catalog import IndexCatalog

    return max(
        c["version"]
        for c in IndexCatalog(index_dir).list_commits()
        if c["n_delete_files"] == 0
    )


def _fts_topk(
    spark: SparkSession,
    sf_dir: str,
    terms: list[str],
    k: int = 10,
    mode: str = "or",
    filter_cond=None,
    prune: bool | str = False,
    field: str | None = None,
    exclude: list[str] | None = None,
    msm: int | None = None,
) -> DataFrame:
    from cuvs_lucene_spark.query import search

    idx = _index_for(spark, sf_dir)
    res = search(
        spark, idx, " ".join(terms), k=k, mode=mode,
        filter_cond=filter_cond, prune=prune, float32=False, field=field,
        exclude=" ".join(exclude) if exclude else None, msm=msm,
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


def _ranked(res: DataFrame) -> DataFrame:
    """(doc_id, score, conv_id, turn_idx) → the gates' canonical output:
    (rank, doc_id, conv_id, turn_idx, score) with score rounded to 4dp and
    rank recomputed over the ROUNDED score (both sides rank identically)."""
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
    """Flagship: multi-term OR BM25 top-10 with auto-gated pruning, sf0.001."""
    return _fts_topk(
        spark, "/root/testdata/sf0.001",
        ["merge", "sort", "join", "window"], k=10, prune="auto",
    )


_PERC_QUERIES = {
    "alert_merge_sort": {"must": ["merge", "sort"]},
    "any2_stream_spark_window": {"should": ["stream", "spark", "window"],
                                 "msm": 2},
    "join_not_hash": {"must": ["join"], "must_not": ["hash"]},
    "scan_or_batch": {"should": ["scan", "batch"]},
    "table_plus1": {"must": ["table"], "should": ["key", "index"], "msm": 1},
}


# Round-5 gate rotation: the driver's correctness check covers the FIRST 50
# registrations in queries() iteration order, so the gates that have never
# earned (or have a stale) driver CORRECTNESS row are surfaced first.  Block 1
# = 31 gates never driver-checked in any round; block 2 = 20 gates last green
# in round 3; everything else (green in round 4) follows in its original
# order.  Rotating the *returned dict*, not the registration code, keeps the
# per-gate definitions diff-free.
_GATE_PRIORITY_R5 = [
    # -- never driver-checked (rounds 1-4) -----------------------------------
    "decontam_ngram", "pii_scrub", "sample_stratified", "percolate",
    "pack_sequences", "textstats_repetition", "dedup_components",
    "fts_count_boolean", "fts_facet_role", "fts_drill_sideways",
    "fts_facet_pivot", "fts_facet_stats", "fts_group_topk", "fts_sorted_ts",
    "fts_collapse_conv", "fts_join_conv", "fts_join_children",
    "fts_highlight", "fts_highlight_span", "fts_topk_classic",
    "fts_topk_lmd", "fts_topk_lmjm", "fts_topk_bm25tuned", "fts_context",
    "fts_suggest", "fts_suggest_complete", "fts_topk_common",
    "sim_ivfpq_exact", "sim_ivfpq_probe", "sim_graph_exact",
    "sim_graph_probe",
    # new in round 5 (graph append lifecycle) — surfaced with the
    # never-checked block so it earns a driver row in its first round
    "sim_graph_append",
    # -- last green in round 3 (stale) ---------------------------------------
    "fts_global_stats", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_minhash_sigs", "dedup_minhash_lsh", "dedup_simhash",
    "fts_topk_batch", "fts_count_or", "fts_count_and", "dedup_emb_cosine",
    "dedup_emb_lsh", "textstats_quality", "textstats_langid",
    "textstats_fingerprint", "sim_cosine_topk", "sim_cosine_topk_filtered",
    "sim_ivf_exact", "sim_ivf_probe", "multimodal_features",
    "multimodal_frames",
]


# per-(sf_dir, k) exact cosine top-k id sets shared by the probe recall
# gates (see _recall_gate)
_RECALL_EXACT_CACHE: dict = {}


def _rotate_gates(d: dict) -> dict:
    """Reorder a gate dict so _GATE_PRIORITY_R5 entries come first (in that
    order), followed by the remaining keys in their registration order."""
    head = {k: d[k] for k in _GATE_PRIORITY_R5 if k in d}
    tail = {k: v for k, v in d.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    q["fts_topk_single"] = lambda s, d: _fts_topk(s, d, ["merge"])
    q["fts_topk_or"] = lambda s, d: _fts_topk(s, d, ["merge", "sort", "join"])
    # prune="auto": the engine decides from dictionary stats whether block-max
    # pruning pays (reference analog: engine choice gated on k). At bench sf
    # the exhaustive scan is small → auto skips pruning; pruned==exhaustive
    # correctness of the forced path stays pinned by pytest (prune=True).
    q["fts_topk_or_pruned"] = lambda s, d: _fts_topk(
        s, d, ["scan", "filter", "window", "hash"], prune="auto"
    )
    q["fts_topk_and"] = lambda s, d: _fts_topk(s, d, ["merge", "sort"], mode="and")
    # BooleanQuery MUST_NOT: docs containing any excluded term are dropped
    # at doc level (no score effect) — Lucene prohibited-clause semantics
    q["fts_topk_not"] = lambda s, d: _fts_topk(
        s, d, ["query", "data"], exclude=["merge"]
    )
    # BooleanQuery minimum_should_match: OR over 3 terms, keep docs matching
    # at least 2 distinct ones
    q["fts_topk_msm"] = lambda s, d: _fts_topk(
        s, d, ["scan", "filter", "window"], msm=2
    )
    q["fts_topk_filtered"] = lambda s, d: _fts_topk(
        s, d, ["query", "data", "batch"], filter_cond=F.col("role") == "user"
    )
    # selective ts-range + role filter: exercises doc_dim's (role, ts)
    # range-clustering — the `_accepted_doc_ids` scan prunes whole files /
    # row-groups on parquet footer stats instead of reading the dim table
    q["fts_topk_filtered_ts"] = lambda s, d: _fts_topk(
        s, d, ["merge", "query"],
        filter_cond=(F.col("role") == "user")
        & (F.col("ts") < F.lit("2026-01-01 02:00:00").cast("timestamp")),
    )
    q["fts_topk_hot"] = lambda s, d: _fts_topk(s, d, ["batch"], k=20)

    # liveDocs masking (D1/D2): a dedicated subset index with a committed
    # deterministic tombstone set — deleted docs never returned, survivors
    # keep their exact pre-delete scores (collection stats still include
    # deleted docs until merge: TestCuVSDeletedDocuments.java:213-255)
    def deletes_live(s: SparkSession, d: str) -> DataFrame:
        from cuvs_lucene_spark.query import search

        idx = _index_for_del(s, d)
        return _ranked(
            search(s, idx, "merge sort join window", k=10, float32=False)
        )

    q["fts_deletes_live"] = deletes_live

    # point-in-time read (L8+ commit history): the SAME index pinned at its
    # last pre-delete commit returns the deleted docs again — the oracle twin
    # is simply the unfiltered top-k over the subset corpus
    def time_travel(s: SparkSession, d: str) -> DataFrame:
        from cuvs_lucene_spark.query import IndexReader, search

        idx = _index_for_del(s, d)
        rd = IndexReader(s, idx, version=_pre_delete_version(idx))
        return _ranked(
            search(
                s, idx, "merge sort join window", k=10, float32=False,
                reader=rd,
            )
        )

    q["fts_time_travel"] = time_travel

    # IndexWriter.addIndexes analog: two half-builds spliced by docID
    # re-base must answer identically to the one-shot build — the oracle IS
    # the one-shot build's top-k (same subset corpus, no filter)
    def add_indexes_q(s: SparkSession, d: str) -> DataFrame:
        from cuvs_lucene_spark.query import search

        idx = _index_for_addidx(s, d)
        return _ranked(
            search(s, idx, "merge sort join window", k=10, float32=False)
        )

    q["fts_add_indexes"] = add_indexes_q

    # federated MultiReader (read-side composition, no data movement): the
    # addidx destination PINNED at its pre-import commit (= half A alone)
    # federated with the half-B source index must equal the one-shot build
    # over the whole subset — same oracle as fts_add_indexes, reached by a
    # completely different composition path (lazy re-base vs physical splice)
    def multireader_q(s: SparkSession, d: str) -> DataFrame:
        from cuvs_lucene_spark.multireader import open_multi_reader
        from cuvs_lucene_spark.query import search
        from cuvs_lucene_spark.sources.catalog import IndexCatalog

        dst = _index_for_addidx(s, d)  # ensures halves built + imported
        pre_import = min(
            c["version"]
            for c in IndexCatalog(dst).list_commits()
            if len(c["segment_ids"]) == 1
        )
        rd = open_multi_reader(s, [(dst, pre_import), dst + "_src"])
        return _ranked(
            search(s, rd.cat.index_dir, "merge sort join window", k=10,
                   float32=False, reader=rd)
        )

    q["fts_multireader"] = multireader_q
    # second-field query (multi-field index): BM25 over the `tool` field with
    # THAT field's docCount/avgdl (per-field entries,
    # CuVS2510GPUVectorsWriter.java:335-352)
    q["fts_topk_field"] = lambda s, d: _fts_topk(
        s, d, ["merge", "filter"], field="tool"
    )

    def multifield(s: SparkSession, d: str) -> DataFrame:
        # cross-field disjunction (MultiFieldQueryParser analog): terms score
        # in BOTH indexed fields with each field's own docCount/avgdl/idf
        from cuvs_lucene_spark.query import search_fields

        res = search_fields(
            s, _index_for(s, d), "call data", k=10, float32=False
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

    q["fts_topk_multifield"] = multifield

    def dismax(s: SparkSession, d: str) -> DataFrame:
        # DisjunctionMaxQuery across (text, tool): best field wins, other
        # fields contribute tiebreak=0.3 of their subtotal
        from cuvs_lucene_spark.query import search_fields

        res = search_fields(
            s, _index_for(s, d), "call data", k=10, float32=False,
            combine="dismax", tiebreak=0.3,
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

    q["fts_topk_dismax"] = dismax

    def prefix_q(s: SparkSession, d: str) -> DataFrame:
        # PrefixQuery (MultiTermQuery SCORING_BOOLEAN_REWRITE): dictionary-
        # pruned expansion of 's*' → OR disjunction, per-term idf, weight 1
        from cuvs_lucene_spark.multiterm import search_multiterm

        return _ranked(
            search_multiterm(s, _index_for(s, d), prefix="s", k=10, float32=False)
        )

    q["fts_topk_prefix"] = prefix_q

    def wildcard_q(s: SparkSession, d: str) -> DataFrame:
        # WildcardQuery '*or*' (→ LIKE '%or%' over the term dictionary)
        from cuvs_lucene_spark.multiterm import search_multiterm

        return _ranked(
            search_multiterm(
                s, _index_for(s, d), wildcard="*or*", k=10, float32=False
            )
        )

    q["fts_topk_wildcard"] = wildcard_q

    def fuzzy_q(s: SparkSession, d: str) -> DataFrame:
        # FuzzyQuery 'sparc'~2 (classic Levenshtein, both engine and oracle)
        from cuvs_lucene_spark.multiterm import search_multiterm

        return _ranked(
            search_multiterm(
                s, _index_for(s, d), fuzzy="sparc", max_edits=2, k=10,
                float32=False,
            )
        )

    q["fts_topk_fuzzy"] = fuzzy_q

    def regexp_q(s: SparkSession, d: str) -> DataFrame:
        # RegexpQuery 's[a-z]*n' (anchored whole-term, Lucene RegExp
        # semantics; literal prefix 's' pushed into the dictionary scan)
        from cuvs_lucene_spark.multiterm import search_multiterm

        return _ranked(
            search_multiterm(
                s, _index_for(s, d), regexp="s[a-z]*n", k=10, float32=False
            )
        )

    q["fts_topk_regexp"] = regexp_q

    def synonym_q(s: SparkSession, d: str) -> DataFrame:
        # SynonymQuery {merge, join}: tf-blended BEFORE the BM25 saturation,
        # idf from the max member docFreq — NOT an OR of two TermQueries
        from cuvs_lucene_spark.query import search_synonym

        return _ranked(
            search_synonym(
                s, _index_for(s, d), ["merge", "join"], k=10, float32=False
            )
        )

    q["fts_topk_synonym"] = synonym_q

    def funcscore_q(s: SparkSession, d: str) -> DataFrame:
        # FunctionScoreQuery analog: BM25 total × a doc_dim-derived factor
        # (here a turn-position boost; a ts-recency decay works identically),
        # applied BEFORE top-k so the boost re-ranks, not just re-labels
        from cuvs_lucene_spark.query import search

        res = search(
            s, _index_for(s, d), "merge sort join", k=10, float32=False,
            boost_by="1.0 + cast(turn_idx as double) / 100.0",
        )
        return _ranked(res)

    q["fts_topk_funcscore"] = funcscore_q

    def dvupdate_q(s: SparkSession, d: str) -> DataFrame:
        # updateNumericDocValue analog: two committed DV batches (the second
        # overwrites half the first's keys — last-write-wins by commit
        # version), then a boost_by over the DV field re-ranks on the
        # RESOLVED values, no reindex. Oracle twin: the same CASE over the
        # base columns the deterministic batches were derived from.
        from cuvs_lucene_spark.query import search

        idx = _index_for_dv(s, d)
        return _ranked(
            search(
                s, idx, "merge sort join", k=10, float32=False,
                boost_by="quality",
            )
        )

    q["fts_topk_dvupdate"] = dvupdate_q

    def term_vectors_q(s: SparkSession, d: str) -> DataFrame:
        # TermVectorsReader analog: one doc's (term, tf, positions)
        # reconstructed from the inverted index — the oracle recomputes the
        # same vector from the raw text (CheckIndex -crossCheckTermVectors)
        from cuvs_lucene_spark.termvectors import term_vectors

        idx = _index_for(s, d)
        return (
            term_vectors(s, idx, _TV_KEY[0], _TV_KEY[1])
            .select(
                "term", F.col("tf").cast("long").alias("tf"), "positions"
            )
            .orderBy("term")
        )

    q["fts_term_vectors"] = term_vectors_q

    def sigterms_q(s, d):
        """Significant terms (ES significant_terms / JLH): foreground = the
        top-25 docs of an OR query, fg_df counted from the inverted index
        (block-range-pruned decode), bg_df from the dictionary."""
        from cuvs_lucene_spark.sigterms import significant_terms

        idx = _index_for(s, d)
        return significant_terms(
            s, idx, "merge sort join", fg_k=25, top_terms=15, float32=False
        )

    q["fts_sigterms"] = sigterms_q

    def rescore_q(s: SparkSession, d: str) -> DataFrame:
        # QueryRescorer analog: broad OR first pass (window 30) re-ranked by
        # a conjunctive second query at double weight
        from cuvs_lucene_spark.query import rescore

        res = rescore(
            s, _index_for(s, d), "merge sort join", "merge sort",
            k=10, window=30, query_weight=1.0, rescore_weight=2.0,
            mode="or", rescore_mode="and", float32=False,
        )
        return _ranked(res)

    q["fts_topk_rescore"] = rescore_q

    def trange_q(s: SparkSession, d: str) -> DataFrame:
        # TermRangeQuery ['sa','so') — lexicographic dictionary-range
        # expansion (inclusive lower, exclusive upper), pushable string
        # bounds, then the same SCORING_BOOLEAN_REWRITE OR pipeline
        from cuvs_lucene_spark.multiterm import search_multiterm

        return _ranked(
            search_multiterm(
                s, _index_for(s, d), term_range=("sa", "so"),
                include_upper=False, k=10, float32=False,
            )
        )

    q["fts_topk_trange"] = trange_q

    def facet_ts_ranges_q(s: SparkSession, d: str) -> DataFrame:
        # LongRangeFacetCounts analog: named, OVERLAPPING half-open ts
        # ranges counted independently over the match set in ONE aggregate
        # pass (a doc in two ranges counts in both, exactly Lucene ranges)
        from cuvs_lucene_spark.query import facet_ranges

        out = facet_ranges(
            s,
            _index_for(s, d),
            "merge sort join",
            ranges=[
                ("h0_4", "2026-01-01 00:00:00", "2026-01-01 04:00:00"),
                ("h4_8", "2026-01-01 04:00:00", "2026-01-01 08:00:00"),
                ("h8_plus", "2026-01-01 08:00:00", None),
                ("first_half_day", None, "2026-01-01 12:00:00"),
            ],
            on="ts",
            mode="or",
        )
        return out.orderBy("facet")

    q["fts_facet_ts_ranges"] = facet_ts_ranges_q

    def mlt_q(s: SparkSession, d: str) -> DataFrame:
        # MoreLikeThis: example text → candidate selection (tf DESC, df ASC,
        # term ASC; min_term_freq=1, min_doc_freq=2, max_query_terms=5) →
        # OR disjunction
        from cuvs_lucene_spark.mlt import more_like_this

        return _ranked(
            more_like_this(
                s, _index_for(s, d), _MLT_TEXT, k=10, float32=False,
                max_query_terms=5, min_term_freq=1, min_doc_freq=2,
            )
        )

    q["fts_topk_mlt"] = mlt_q

    def boolean_q(s: SparkSession, d: str) -> DataFrame:
        # nested BooleanQuery with boosts:
        # (scan AND (filter OR window^2.0)) NOT merge
        from cuvs_lucene_spark.booleanq import search_boolean

        return _ranked(
            search_boolean(
                s, _index_for(s, d), _boolean_gate_tree(), k=10, float32=False
            )
        )

    q["fts_topk_boolean"] = boolean_q

    def constfilter_q(s: SparkSession, d: str) -> DataFrame:
        # the full BooleanClause.Occur surface: SHOULD const-score 1.5 over
        # (window OR scan), SHOULD merge, FILTER sort (required, unscored),
        # NOT hash — the oracle compiles the SAME tree via booleanq.sql_exprs
        from cuvs_lucene_spark.booleanq import search_boolean

        return _ranked(
            search_boolean(
                s, _index_for(s, d), _constfilter_gate_tree(), k=10,
                float32=False,
            )
        )

    q["fts_topk_constfilter"] = constfilter_q

    def boolean_span_q(s: SparkSession, d: str) -> DataFrame:
        # a SpanQuery nested in a BooleanQuery (Lucene composes them the
        # same way): MUST span_near("merge sort")~5, optional 'filter'
        # scorer, NOT 'hash'. The span leaf joins the boolean pivot as a
        # per-doc score column; the oracle compiles the SAME tree via
        # booleanq.sql_exprs with the span chain CTE.
        from cuvs_lucene_spark.booleanq import search_boolean

        return _ranked(
            search_boolean(
                s, _index_for(s, d), _boolean_span_gate_tree(), k=10,
                float32=False,
            )
        )

    q["fts_topk_boolean_span"] = boolean_span_q

    def qstring_q(s: SparkSession, d: str) -> DataFrame:
        # classic query-string syntax end-to-end, incl. a phrase leaf inside
        # the boolean tree: +scan (filter OR window^2.0) "merge sort" -hash
        from cuvs_lucene_spark.qparser import search_qstring

        return _ranked(
            search_qstring(
                s, _index_for(s, d), _QSTRING_GATE, k=10, float32=False
            )
        )

    q["fts_topk_qstring"] = qstring_q

    def english_q(s: SparkSession, d: str) -> DataFrame:
        # "english" analysis chain (stop filter + minimal stemmer): the raw
        # query analyzes to [package, deposit]; matches stemmed index terms
        from cuvs_lucene_spark.query import search

        return _ranked(
            search(
                s, _index_for_eng(s, d), _ENG_QUERY, k=10, float32=False
            )
        )

    q["fts_topk_english"] = english_q

    def phrase(s: SparkSession, d: str) -> DataFrame:
        from cuvs_lucene_spark.query import search_phrase

        res = search_phrase(
            s, _index_for(s, d), "merge sort", k=10, float32=False
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

    q["fts_topk_phrase"] = phrase

    def multiphrase_q(s: SparkSession, d: str) -> DataFrame:
        """MultiPhraseQuery analog: 'merge (group|order)' — the second slot
        accepts alternatives; same positional scan/anchor plan as the exact
        phrase, with a wider term IN-list."""
        from cuvs_lucene_spark.query import search_multiphrase

        res = search_multiphrase(
            s, _index_for(s, d), ["merge", ["group", "order"]], k=10,
            float32=False,
        )
        return _ranked(res)

    q["fts_topk_multiphrase"] = multiphrase_q

    def phrase_prefix_q(s: SparkSession, d: str) -> DataFrame:
        """Phrase-prefix (MultiPhrasePrefixQuery shape): 'merge s*' — the
        last token expands against the term dictionary, then runs as a
        MultiPhraseQuery."""
        from cuvs_lucene_spark.query import search_phrase_prefix

        res = search_phrase_prefix(
            s, _index_for(s, d), "merge s", k=10, float32=False
        )
        return _ranked(res)

    q["fts_topk_phrase_prefix"] = phrase_prefix_q

    def phrase_slop(s: SparkSession, d: str) -> DataFrame:
        # sloppy phrase (Lucene PhraseQuery slop>0). The per-doc
        # SloppyPhraseMatcher sweep now has a FULL DuckDB oracle — the
        # two-slot state machine transliterated as a recursive CTE
        # (_oracle_phrase_slop_sql), fuzz-pinned against the engine kernel —
        # so this gate hash-matches like every other FTS gate; exact score
        # parity is additionally pinned by tests/test_phrase.py against an
        # independent heapq transliteration of the published algorithm.
        from cuvs_lucene_spark.query import search_phrase

        res = search_phrase(
            s, _index_for(s, d), "merge sort", k=10, float32=False, slop=2
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

    q["fts_topk_phrase_slop"] = phrase_slop

    def spannear(s: SparkSession, d: str) -> DataFrame:
        # ordered span-near (SpanNearQuery(inOrder=true) analog): terms in
        # order, minimal-stretch match per first-clause position, width =
        # sum of gaps, pf = Σ 1/(1+width) over width<=slop; BM25 pseudo-term
        # scoring. Full DuckDB oracle: the minimal-stretch chain is plain
        # min-position correlated subqueries (no recursion needed).
        from cuvs_lucene_spark.spans import search_span_near

        return _ranked(
            search_span_near(
                s, _index_for(s, d), "merge sort join", slop=6, k=10,
                float32=False,
            )
        )

    q["fts_topk_spannear"] = spannear

    def spannear_unord(s: SparkSession, d: str) -> DataFrame:
        # UNordered span-near (NearSpansUnordered analog — distinct from
        # sloppy phrase: merge-walk state enumeration, match at
        # max-min-(n-1)<=slop, weight 1/(1+(max-min))). Full DuckDB oracle:
        # the walk's visited states are exactly the pairs where every
        # consumed position precedes every current one — two lag() windows
        # and a join, no recursion.
        from cuvs_lucene_spark.spans import search_span_near

        return _ranked(
            search_span_near(
                s, _index_for(s, d), "sort merge", slop=4, k=10,
                float32=False, in_order=False,
            )
        )

    q["fts_topk_spannear_unord"] = spannear_unord

    def spanfirst(s: SparkSession, d: str) -> DataFrame:
        # SpanFirstQuery analog: ordered span-near "merge sort"~5 whose
        # spans must END within the first 12 positions of the document
        # (span end = last matched position + 1 <= 12). Lucene's
        # FilterSpans drops non-accepted spans from the same enumeration,
        # so per-match weight stays 1/(1+width). Full DuckDB oracle: the
        # spannear min-position chain plus the end predicate.
        from cuvs_lucene_spark.spans import search_span_first

        return _ranked(
            search_span_first(
                s, _index_for(s, d), "merge sort", end=12, slop=5, k=10,
                float32=False,
            )
        )

    q["fts_topk_spanfirst"] = spanfirst

    def spanfirst_term(s: SparkSession, d: str) -> DataFrame:
        # single-clause SpanFirst: a bare term span filtered to the doc
        # head — pf = count of occurrences at position < 10, scored as the
        # usual BM25 pseudo-term. Exactly SQL-expressible (position filter
        # on the unnested token table).
        from cuvs_lucene_spark.spans import search_span_first

        return _ranked(
            search_span_first(
                s, _index_for(s, d), "merge", end=10, k=10, float32=False,
            )
        )

    q["fts_topk_spanfirst_term"] = spanfirst_term

    def spanor(s: SparkSession, d: str) -> DataFrame:
        # SpanOrQuery analog: union of the terms' spans scored as ONE
        # pseudo-term — pf = Σ tf over matched terms (every occurrence is
        # a width-0 span, sloppyFreq(0)=1), idf = Σ idf of present terms.
        # Distinct from the OR disjunction (per-term saturation then sum).
        # Positions never read. Full DuckDB oracle: COUNT over term IN.
        from cuvs_lucene_spark.spans import search_span_or

        return _ranked(
            search_span_or(
                s, _index_for(s, d), "merge join", k=10, float32=False
            )
        )

    q["fts_topk_spanor"] = spanor

    def spanrange(s: SparkSession, d: str) -> DataFrame:
        # SpanPositionRangeQuery analog: ordered "merge sort"~5 spans that
        # START at position >= 2 AND END at position + 1 <= 25 (SpanFirst
        # is the start=0 special case). Both bounds filter inside the same
        # enumeration; survivors keep their 1/(1+width) weight.
        from cuvs_lucene_spark.spans import search_span_range

        return _ranked(
            search_span_range(
                s, _index_for(s, d), "merge sort", start=2, end=25, slop=5,
                k=10, float32=False,
            )
        )

    q["fts_topk_spanrange"] = spanrange

    def spannear_orclause(s: SparkSession, d: str) -> DataFrame:
        # SpanOr INSIDE an ordered near: near(or(merge, join), sort)~6 —
        # clause 1 matches at the UNION of merge/join positions (Lucene
        # SpanOrQuery span enumeration), idf over all three terms. Oracle:
        # the min-position chain with m0 over term IN ('merge','join').
        from cuvs_lucene_spark.spans import search_span_near

        return _ranked(
            search_span_near(
                s, _index_for(s, d), ["merge join", "sort"], slop=6, k=10,
                float32=False,
            )
        )

    q["fts_topk_spannear_orclause"] = spannear_orclause

    def spannot(s: SparkSession, d: str) -> DataFrame:
        # SpanNotQuery analog: ordered near "merge sort"~6 spans are
        # VETOED when a 'join' occurrence overlaps the span widened by
        # post=2 positions (FilterSpans: survivors keep their 1/(1+width)
        # weight; the exclusion term contributes no idf). Oracle: the
        # chain + NOT EXISTS over the exclusion positions in range.
        from cuvs_lucene_spark.spans import search_span_near

        return _ranked(
            search_span_near(
                s, _index_for(s, d), "merge sort", slop=6, k=10,
                float32=False, exclude="join", post=2,
            )
        )

    q["fts_topk_spannot"] = spannot

    def spancontaining(s: SparkSession, d: str) -> DataFrame:
        # SpanContainingQuery analog: big = ordered near "merge join"~8,
        # little = term 'sort'; big spans survive iff they ENCLOSE a
        # little span (big.start <= little.start AND little.end <=
        # big.end), keeping big's 1/(1+width) weight; idf sums the
        # DISTINCT terms of both sides once. Oracle: the min-position
        # chain + EXISTS over the little positions in [p0, p1].
        from cuvs_lucene_spark.spans import search_span_containing

        return _ranked(
            search_span_containing(
                s, _index_for(s, d), "merge join", "sort", big_slop=8,
                k=10, float32=False,
            )
        )

    q["fts_topk_spancontaining"] = spancontaining

    def spanwithin(s: SparkSession, d: str) -> DataFrame:
        # SpanWithinQuery analog (containment dual): little = term
        # 'sort' spans survive iff they lie INSIDE a big "merge join"~8
        # span, keeping little's weight (width 0 -> 1.0 each). Same idf
        # merge as containing. Oracle: EXISTS over the big chains.
        from cuvs_lucene_spark.spans import search_span_within

        return _ranked(
            search_span_within(
                s, _index_for(s, d), "merge join", "sort", big_slop=8,
                k=10, float32=False,
            )
        )

    q["fts_topk_spanwithin"] = spanwithin

    def dictionary(s: SparkSession, d: str) -> DataFrame:
        from cuvs_lucene_spark.query import IndexReader

        rd = IndexReader(s, _index_for(s, d))
        return (
            rd.cat.read_dictionary(s)
            .where(F.col("field") == "text")
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

    # -- training-data pipeline operators over documents/embeddings ---------

    def _docs(s: SparkSession, d: str) -> DataFrame:
        return s.read.parquet(os.path.join(d, "documents.parquet"))

    def _emb(s: SparkSession, d: str) -> DataFrame:
        return s.read.parquet(os.path.join(d, "embeddings.parquet"))

    def _recall_gate(s, probe_df, d, k, floor):
        """Driver-checkable wrapper for APPROXIMATE probes: computes
        recall@k against the exact cosine top-k in the gate itself and
        returns one row (k, n_hits, recall_floor, recall_ok) that the SQL
        oracle pins as constants — so a broken probe (empty results, wrong
        ids, recall collapse below the config's documented floor) flips the
        driver's hash check instead of hiding behind a rows-only gate. The
        floors are set ~2x below the config's measured recall, so they
        assert 'the structure works', not a point estimate."""
        from cuvs_lucene_spark.pipeline.similarity import cosine_topk

        got = {int(r["id"]) for r in probe_df.select("id").collect()}
        # the exact reference top-k is identical for every probe gate at a
        # given sf dir — compute it once per process (embeddings.parquet is
        # immutable test data)
        ck = (d, k)
        exact = _RECALL_EXACT_CACHE.get(ck)
        if exact is None:
            exact = {
                int(r["id"])
                for r in cosine_topk(_emb(s, d), _SIM_QUERY_VEC, k=k).collect()
            }
            _RECALL_EXACT_CACHE[ck] = exact
        recall = len(got & exact) / float(k)
        return s.createDataFrame(
            [(k, len(got), float(floor), bool(recall >= floor))],
            "k long, n_hits long, recall_floor double, recall_ok boolean",
        )

    def dedup_exact(s, d):
        from cuvs_lucene_spark.pipeline.dedup import exact_duplicates

        return exact_duplicates(_docs(s, d)).select(
            F.col("id").cast("long"), F.col("canonical_id").cast("long"),
            F.col("group_size").cast("long"),
        )

    q["dedup_exact"] = dedup_exact

    def dedup_jaccard(s, d):
        from cuvs_lucene_spark.pipeline.dedup import ngram_jaccard_pairs

        return ngram_jaccard_pairs(_docs(s, d), n=3, threshold=0.5).select(
            F.col("id_a").cast("long"), F.col("id_b").cast("long"),
            F.col("inter").cast("long"), F.col("union").cast("long"), "jaccard",
        )

    q["dedup_ngram_jaccard"] = dedup_jaccard

    def dedup_minhash_sigs(s, d):
        from cuvs_lucene_spark.pipeline.dedup import minhash_signatures

        sig = minhash_signatures(_docs(s, d), n=3, n_hashes=32)
        return sig.select(
            F.col("id").cast("long"),
            *[F.col("sig")[i].cast("long").alias(f"sig_{i}") for i in (0, 7, 15, 31)],
        )

    q["dedup_minhash_sigs"] = dedup_minhash_sigs

    def dedup_minhash_lsh(s, d):
        from cuvs_lucene_spark.pipeline.dedup import minhash_lsh_pairs

        return minhash_lsh_pairs(
            _docs(s, d), n=3, n_hashes=32, bands=16, threshold=0.5
        ).select(
            F.col("id_a").cast("long"), F.col("id_b").cast("long"),
            F.col("inter").cast("long"), F.col("union").cast("long"), "jaccard",
        )

    q["dedup_minhash_lsh"] = dedup_minhash_lsh

    def dedup_simhash(s, d):
        from cuvs_lucene_spark.pipeline.dedup import simhash_pairs

        return simhash_pairs(_docs(s, d), n=3, max_hamming=3).select(
            F.col("id_a").cast("long"), F.col("id_b").cast("long"),
            F.col("hamming").cast("long"),
        )

    q["dedup_simhash"] = dedup_simhash

    def decontam_ngram(s, d):
        """Benchmark decontamination (GPT-3/PaLM-style n-gram collision):
        the eval set is the deterministic doc_id%97==0 split of documents;
        every other doc sharing >=1 word 3-gram with it is reported with
        its distinct-collision count and windows fraction."""
        from cuvs_lucene_spark.pipeline.decontam import contamination_report

        docs = _docs(s, d)
        bench = docs.where(F.col("doc_id") % 97 == 0)
        corpus = docs.where(F.col("doc_id") % 97 != 0)
        return contamination_report(corpus, bench, n=3).orderBy("doc_id")

    q["decontam_ngram"] = decontam_ngram

    def pii_scrub(s, d):
        """PII detection + redaction over a deterministic PII-bearing text
        synthesized from doc_id/text (both engines build the IDENTICAL
        string via the shared SQL expression, then scrub it): per-kind
        counts + fully-redacted text, all pure JVM regex expressions."""
        from cuvs_lucene_spark.pipeline.pii import (
            redact_pii,
            synth_pii_text_sql,
            with_pii_counts,
        )

        docs = _docs(s, d).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.expr(synth_pii_text_sql()).alias("pii_text"),
        )
        out = redact_pii(with_pii_counts(docs, "pii_text"), "pii_text", "redacted")
        return out.select(
            "doc_id",
            *[F.col(f"pii_{k}").cast("long").alias(f"pii_{k}")
              for k in ("email", "ipv4", "ssn", "phone")],
            F.col("pii_total").cast("long").alias("pii_total"),
            "redacted",
        ).orderBy("doc_id")

    q["pii_scrub"] = pii_scrub

    def sample_stratified(s, d):
        """Deterministic stratified sampling + train/val/test split: per-lang
        hash-Bernoulli rates over a portable integer hash (membership a pure
        function of doc_id — rerun/repartition/append stable), split labels
        from cumulative hash ranges. Scan-speed JVM predicates only."""
        from cuvs_lucene_spark.pipeline.sampling import (
            stratified_sample,
            with_split,
        )

        docs = _docs(s, d)
        out = with_split(
            stratified_sample(
                docs, {"en": 0.9, "es": 0.5, "de": 0.25},
                strata_col="lang", default_rate=0.1,
            )
        )
        return out.select(
            F.col("doc_id").cast("long").alias("doc_id"), "lang", "split"
        ).orderBy("doc_id")

    q["sample_stratified"] = sample_stratified

    def percolate_q(s, d):
        """Percolator (lucene-monitor / ES percolate analog): 5 registered
        flat boolean queries matched against every document — broadcast
        presearcher term table, one distinct-token doc scan, one candidate
        aggregate."""
        from cuvs_lucene_spark.percolator import percolate, register_queries

        terms, meta = register_queries(s, _PERC_QUERIES)
        return percolate(_docs(s, d), terms, meta)

    q["percolate"] = percolate_q

    def pack_sequences_q(s, d):
        """GPT-style concat-and-chunk packing bookkeeping: deterministic
        global token prefix sum (two-level base scheme, range shuffle +
        partition-local window) -> per-doc sequence placement."""
        from cuvs_lucene_spark.pipeline.packing import pack_sequences

        return pack_sequences(_docs(s, d), seq_len=128).orderBy("doc_id")

    q["pack_sequences"] = pack_sequences_q

    def textstats_repetition(s, d):
        """Gopher/C4-style repetition signals (dup-line fraction, dup/top
        bigram and dup 5-gram window fractions) in one vectorized Arrow
        pass — the degenerate-boilerplate detectors of a quality stack."""
        from cuvs_lucene_spark.pipeline.textstats import with_repetition

        return with_repetition(_docs(s, d)).orderBy("doc_id")

    q["textstats_repetition"] = textstats_repetition

    def dedup_components(s, d):
        """Near-dup pairs → transitive dedup GROUPS (the stage a training
        pipeline needs to actually drop duplicates): min-label propagation
        with pointer jumping, O(log n) join rounds over the pair list only.
        canonical_id = min doc id of the group = the deterministic survivor.
        """
        from cuvs_lucene_spark.pipeline.dedup import dedup_groups, minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            _docs(s, d), n=3, n_hashes=32, bands=16, threshold=0.5
        )
        return dedup_groups(pairs).select(
            F.col("id").cast("long"),
            F.col("canonical_id").cast("long"),
            F.col("group_size").cast("long"),
        )

    q["dedup_components"] = dedup_components

    def fts_topk_batch(s, d):
        """Q queries in ONE job (query.search_batch): shared postings scan +
        pivot, per-query totals as expressions, one ranking window."""
        from cuvs_lucene_spark.query import search_batch

        res = search_batch(
            s, _index_for(s, d),
            [" ".join(t) for t, _m in _BATCH_TERM_SETS],
            k=10, float32=False,
            mode=[m for _t, m in _BATCH_TERM_SETS],
        )
        w = Window.partitionBy("qid").orderBy(F.desc("score_r"), F.asc("doc_id"))
        return (
            res.withColumn("score_r", F.round("score", 4))
            .withColumn("rank", F.row_number().over(w))
            .select(
                F.col("qid").cast("long").alias("qid"),
                F.col("rank").cast("long").alias("rank"),
                F.col("doc_id").cast("long").alias("doc_id"),
                "conv_id",
                F.col("turn_idx").cast("long").alias("turn_idx"),
                F.col("score_r").alias("score"),
            )
        )

    q["fts_topk_batch"] = fts_topk_batch

    def fts_count_or(s, d):
        from cuvs_lucene_spark.query import count_matches

        n = count_matches(s, _index_for(s, d), "merge sort join", mode="or")
        return s.createDataFrame([(n,)], "n long")

    q["fts_count_or"] = fts_count_or

    def fts_count_and(s, d):
        from cuvs_lucene_spark.query import count_matches

        n = count_matches(s, _index_for(s, d), "merge sort", mode="and")
        return s.createDataFrame([(n,)], "n long")

    q["fts_count_and"] = fts_count_and

    def fts_count_boolean(s, d):
        """IndexSearcher.count over a NESTED BooleanQuery tree: the same
        compiled match predicate the boolean search surface scores with,
        evaluated over a score-free presence pivot — one decoded postings
        scan, no norms, no top-k machinery."""
        from cuvs_lucene_spark.booleanq import count_boolean

        n = count_boolean(s, _index_for(s, d), _boolean_gate_tree())
        return s.createDataFrame([(n,)], "n long")

    q["fts_count_boolean"] = fts_count_boolean

    def fts_facet_role(s, d):
        """Facet counts (Lucene facets-module analog): per-role live-doc
        match counts over an OR query's match set — match-set distinct +
        one facet hash aggregate, no scoring."""
        from cuvs_lucene_spark.query import facet_counts

        return facet_counts(
            s, _index_for(s, d), "merge sort join", facet="role", mode="or"
        ).select("facet", F.col("n_docs").cast("long"))

    q["fts_facet_role"] = fts_facet_role

    def fts_drill_sideways(s, d):
        """DrillSideways analog: per-dim facet counts with that dim's own
        drill-down removed but every other dim's applied — one match-set
        pass, one doc_dim semi-join, one exploded hash aggregate."""
        from cuvs_lucene_spark.query import drill_sideways

        return drill_sideways(
            s, _index_for(s, d), "merge sort join",
            dims={"role": ["user", "assistant"],
                  "turn_idx": [0, 1, 2, 3, 4, 5, 6, 7]},
        ).select("dim", "facet", F.col("n_docs").cast("long"))

    q["fts_drill_sideways"] = fts_drill_sideways

    def fts_facet_pivot(s, d):
        """Pivot facet (taxonomy multi-level dimension / Solr facet.pivot
        analog): per-(role, tool) live-doc match counts over an OR query's
        match set — one hash aggregate on the dim tuple; NULL tool is its
        own bucket."""
        from cuvs_lucene_spark.query import facet_pivot

        return facet_pivot(
            s, _index_for(s, d), "merge sort join", dims=["role", "tool"],
        ).select("role", "tool", F.col("n_docs").cast("long"))

    q["fts_facet_pivot"] = fts_facet_pivot

    def fts_facet_stats(s, d):
        """Stats facet (taxonomy value-association / Solr stats component
        analog): five single-pass statistics of turn_idx per role over the
        match set."""
        from cuvs_lucene_spark.query import facet_stats

        return facet_stats(
            s, _index_for(s, d), "merge sort join", on="turn_idx", by="role"
        ).select(
            "facet",
            F.col("n_docs").cast("long"),
            F.col("min_v").cast("long").alias("min_v"),
            F.col("max_v").cast("long").alias("max_v"),
            F.col("sum_v").cast("long").alias("sum_v"),
            F.round("avg_v", 4).alias("avg_v"),
        )

    q["fts_facet_stats"] = fts_facet_stats

    def fts_group_topk(s, d):
        """Grouped search (Lucene grouping-module analog, TopGroups): the 3
        best BM25 hits per role over an OR query — full scored match set,
        one doc_dim join, one window shuffle on the group key."""
        from cuvs_lucene_spark.query import search

        res = search(
            s, _index_for(s, d), "merge sort join", k=3, mode="or",
            float32=False, group_by="role",
        )
        return res.select(
            "role",
            F.col("grp_rank").cast("long").alias("grp_rank"),
            F.col("doc_id").cast("long").alias("doc_id"),
            "conv_id",
            F.col("turn_idx").cast("long").alias("turn_idx"),
            F.round("score", 4).alias("score"),
        ).orderBy("role", "grp_rank")

    q["fts_group_topk"] = fts_group_topk

    def fts_sorted_ts(s, d):
        """Field-sorted search (IndexSearcher.search(query, k, Sort) analog):
        newest-first matches of an OR query — scoring skipped entirely,
        match-set semi-join + TakeOrderedAndProject on (ts desc, doc_id)."""
        from cuvs_lucene_spark.query import search_sorted

        res = search_sorted(
            s, _index_for(s, d), "merge sort join", sort_by="ts",
            ascending=False, k=10,
        )
        return res.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "conv_id",
            F.col("turn_idx").cast("long").alias("turn_idx"),
            F.col("ts").cast("long").alias("ts_epoch"),
        ).orderBy(F.desc("ts_epoch"), F.asc("doc_id"))

    q["fts_sorted_ts"] = fts_sorted_ts

    def fts_collapse_conv(s, d):
        """Field collapsing (CollapsingTopDocsCollector / Solr collapse
        analog): global top-k with at most one hit per conversation —
        full scored match set, one window shuffle on the collapse key,
        TakeOrderedAndProject of the representatives."""
        from cuvs_lucene_spark.query import search

        res = search(
            s, _index_for(s, d), "merge sort join", k=10,
            collapse_by="conv_id", float32=False,
        )
        return _ranked(res)

    q["fts_collapse_conv"] = fts_collapse_conv

    def fts_join_conv(s, d):
        """Block join (Lucene join-module ToParentBlockJoinQuery analog,
        ScoreMode.Total): top conversations by the SUM of their turns' BM25
        scores — scored match set, one doc_dim join, one groupBy shuffle on
        the parent key, TakeOrderedAndProject. Children are summed as
        DECIMAL(38,10) so the total is order-independent and hash-matches
        the oracle exactly."""
        from cuvs_lucene_spark.query import search

        res = search(
            s, _index_for(s, d), "merge sort join", k=10,
            parent_by="conv_id", score_mode="total", float32=False,
        )
        w = Window.orderBy(F.desc("score_r"), F.asc("conv_id"))
        return (
            res.withColumn("score_r", F.round("score", 4))
            .withColumn("rank", F.row_number().over(w))
            .select(
                F.col("rank").cast("long").alias("rank"),
                "conv_id",
                F.col("n_hits").cast("long").alias("n_hits"),
                F.col("score_r").alias("score"),
            )
            .orderBy("rank")
        )

    q["fts_join_conv"] = fts_join_conv

    def fts_join_children(s, d):
        """ToChildBlockJoinQuery analog: the top-5 conversations by summed
        turn scores, then every 'user' turn of those conversations carrying
        its parent's score — parent roll-up reused, children fetched by
        broadcasting the 5 parent rows against one doc_dim scan."""
        from cuvs_lucene_spark.query import search_children

        res = search_children(
            s, _index_for(s, d), "merge sort join",
            parent_by="conv_id", k=10_000, k_parents=5,
            score_mode="total", child_filter=F.col("role") == "user",
            float32=False,
        )
        return (
            res.withColumn("score_r", F.round("score", 4))
            .select(
                F.col("doc_id").cast("long").alias("doc_id"),
                "conv_id",
                F.col("turn_idx").cast("long").alias("turn_idx"),
                F.col("score_r").alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("conv_id"), F.asc("doc_id"))
        )

    q["fts_join_children"] = fts_join_children

    def fts_highlight(s, d):
        """Highlighter (Lucene Highlighter analog): top-k hits joined back
        to the source transcripts (k-key IN-filter pushed into the scan),
        fragment anchored at the first query-term occurrence, matches
        tag-wrapped. The analyzed-token snippet is hash-matched against the
        DuckDB oracle; the original-text snippet is pytest-pinned."""
        from cuvs_lucene_spark.highlight import highlight

        res = highlight(
            s, _index_for(s, d), derive_transcripts(s, d),
            "merge sort join", k=10, window_size=12, lead=3, float32=False,
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
                F.col("start_pos").cast("long").alias("start_pos"),
                F.col("n_match").cast("long").alias("n_match"),
                "snippet_tokens",
            )
            .orderBy("rank")
        )

    q["fts_highlight"] = fts_highlight

    def fts_highlight_span(s, d):
        """Span-accurate highlighter (WeightedSpanTermExtractor analog):
        top-k ordered span-near hits, fragment anchored at the first
        position inside a SURVIVING span, and only span-participating
        positions tag-wrapped — a query-term occurrence outside every
        matching span stays unmarked. Analyzed-token snippet hash-matched
        against DuckDB (marked set = the min-position chain's p0 ∪ p1);
        original-text snippet is pytest-pinned."""
        from cuvs_lucene_spark.highlight import highlight_spans

        res = highlight_spans(
            s, _index_for(s, d), derive_transcripts(s, d),
            "merge sort", slop=5, k=10, window_size=12, lead=3,
            float32=False,
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
                F.col("start_pos").cast("long").alias("start_pos"),
                F.col("n_match").cast("long").alias("n_match"),
                "snippet_tokens",
            )
            .orderBy("rank")
        )

    q["fts_highlight_span"] = fts_highlight_span

    def fts_topk_classic(s, d):
        """Pluggable Similarity (IndexSearcher.setSimilarity analog):
        the same OR query scored with TFIDFSimilarity instead of BM25 —
        same postings scan, same kernel shape, different per-term math."""
        from cuvs_lucene_spark.query import search

        res = search(
            s, _index_for(s, d), "merge sort join", k=10,
            similarity="classic", float32=False,
        )
        return _ranked(res)

    q["fts_topk_classic"] = fts_topk_classic

    def fts_topk_lmd(s, d):
        """Pluggable Similarity #3: LM Dirichlet (Lucene
        LMDirichletSimilarity, mu=2000) — language-model scoring from the
        dictionary's cf column + the field token total; same postings scan
        and kernel shape as BM25/classic."""
        from cuvs_lucene_spark.query import search

        res = search(
            s, _index_for(s, d), "merge sort join", k=10,
            similarity="lmd", float32=False,
        )
        return _ranked(res)

    q["fts_topk_lmd"] = fts_topk_lmd

    def fts_topk_lmjm(s, d):
        """Pluggable Similarity #4: LM Jelinek-Mercer (Lucene
        LMJelinekMercerSimilarity, lambda=0.1) — the mixture-model LM twin
        of the Dirichlet gate, same collection-probability plumbing."""
        from cuvs_lucene_spark.query import search

        res = search(
            s, _index_for(s, d), "merge sort join", k=10,
            similarity="lmjm", float32=False,
        )
        return _ranked(res)

    q["fts_topk_lmjm"] = fts_topk_lmjm

    def fts_topk_bm25tuned(s, d):
        """BM25 free parameters (BM25Similarity(k1, b) constructor analog):
        the same OR query scored with the published short-text tuning
        k1=0.9, b=0.4 — parameters thread into the kernel AND the
        block-max bound, so tuned searches prune losslessly."""
        from cuvs_lucene_spark.query import search

        res = search(
            s, _index_for(s, d), "merge sort join", k=10,
            k1=0.9, b=0.4, float32=False,
        )
        return _ranked(res)

    q["fts_topk_bm25tuned"] = fts_topk_bm25tuned

    def fts_context(s, d):
        """Context retrieval over transcripts: every top-k hit carries its
        ±2-turn conversation neighborhood — k hit rows broadcast against
        ONE corpus scan with a conv_id + turn-range predicate (no corpus
        shuffle; ≤ k·5 output rows)."""
        from cuvs_lucene_spark.query import search_with_context

        res = search_with_context(
            s, _index_for(s, d), derive_transcripts(s, d),
            "merge sort join", k=5, window=2, float32=False,
        )
        res = res.withColumn("score_r", F.round("score", 4))
        w = Window.orderBy(F.desc("score_r"), F.asc("doc_id"))
        return (
            res.withColumn("rank", F.dense_rank().over(w))
            .select(
                F.col("rank").cast("long").alias("rank"),
                F.col("doc_id").cast("long").alias("doc_id"),
                "conv_id",
                F.col("turn_idx").cast("long").alias("turn_idx"),
                F.col("ctx_turn_idx").cast("long").alias("ctx_turn_idx"),
                F.col("offset").cast("long").alias("ctx_offset"),
                F.col("is_hit").cast("long").alias("is_hit"),
                "role",
                "text",
                F.col("score_r").alias("score"),
            )
            .orderBy("rank", "ctx_turn_idx")
        )

    q["fts_context"] = fts_context

    def fts_suggest(s, d):
        """Spell-check suggestion (DirectSpellChecker analog): dictionary
        terms within 2 edits of a misspelling, (distance asc, df desc,
        term asc) — one bucket-pruned dictionary scan, no postings read."""
        from cuvs_lucene_spark.multiterm import suggest_terms

        return (
            suggest_terms(s, _index_for(s, d), "bat", max_edits=2, top_n=8)
            .select(
                "term",
                F.col("distance").cast("long").alias("distance"),
                F.col("df").cast("long").alias("df"),
            )
            .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        )

    q["fts_suggest"] = fts_suggest

    def fts_suggest_complete(s, d):
        """Prefix completion suggester (Lucene suggest-module weighted
        lookup analog): df-weighted autocomplete over the term dictionary —
        one prefix-pruned dictionary scan, no postings read."""
        from cuvs_lucene_spark.multiterm import suggest_completions

        return (
            suggest_completions(s, _index_for(s, d), "s", top_n=10)
            .select("term", F.col("weight").cast("long").alias("weight"))
            .orderBy(F.desc("weight"), F.asc("term"))
        )

    q["fts_suggest_complete"] = fts_suggest_complete

    def fts_topk_common(s, d):
        """CommonTermsQuery analog: df-gated split at query time — the rare
        term ('dup') becomes MUST, the common terms ('merge','scan') SHOULD;
        one postings scan over the compiled boolean tree."""
        from cuvs_lucene_spark.multiterm import search_common

        res = search_common(
            s, _index_for(s, d), "dup merge scan", k=10,
            max_term_frequency=0.5, float32=False,
        )
        return _ranked(res)

    q["fts_topk_common"] = fts_topk_common

    def dedup_emb_cosine(s, d):
        from cuvs_lucene_spark.pipeline.similarity import embedding_neardup_pairs

        return embedding_neardup_pairs(_emb(s, d), threshold=0.4)

    q["dedup_emb_cosine"] = dedup_emb_cosine

    def dedup_emb_lsh(s, d):
        from cuvs_lucene_spark.pipeline.similarity import embedding_lsh_pairs

        return embedding_lsh_pairs(_emb(s, d), threshold=0.4, bits=16, bands=4, dim=64)

    q["dedup_emb_lsh"] = dedup_emb_lsh

    def textstats_quality(s, d):
        from cuvs_lucene_spark.pipeline.textstats import with_quality

        return with_quality(_docs(s, d)).select(
            F.col("doc_id").cast("long"),
            F.col("n_tokens").cast("long"), F.col("n_bpe_tokens").cast("long"),
            F.round("punct_ratio", 6).alias("punct_ratio"),
            F.round("stop_ratio", 6).alias("stop_ratio"),
            F.col("len_ok").cast("long"), "quality",
        )

    q["textstats_quality"] = textstats_quality

    def textstats_langid(s, d):
        from cuvs_lucene_spark.pipeline.textstats import with_lang_id

        return with_lang_id(_docs(s, d)).select(
            F.col("doc_id").cast("long"),
            "score_de", "score_en", "score_es", "score_fr", "lang_pred",
        )

    q["textstats_langid"] = textstats_langid

    def textstats_fingerprint(s, d):
        from cuvs_lucene_spark.pipeline.textstats import with_fingerprint

        return with_fingerprint(_docs(s, d)).select(
            F.col("doc_id").cast("long"), F.col("fingerprint").cast("long"),
        )

    q["textstats_fingerprint"] = textstats_fingerprint

    def sim_cosine_topk(s, d):
        from cuvs_lucene_spark.pipeline.similarity import cosine_topk

        return cosine_topk(_emb(s, d), _SIM_QUERY_VEC, k=10)

    q["sim_cosine_topk"] = sim_cosine_topk

    def sim_cosine_topk_filtered(s, d):
        """Filtered ANN — the reference's primary query surface (acceptDocs,
        CuVS2510GPUVectorsReader.java:313-335): exact pre-filter on a vector
        attribute, pushed into the scan, replacing k×10 over-sampling."""
        from cuvs_lucene_spark.pipeline.similarity import cosine_topk

        return cosine_topk(
            _emb(s, d), _SIM_QUERY_VEC, k=10,
            filter_cond=F.col("label") % 2 == 0,
        )

    q["sim_cosine_topk_filtered"] = sim_cosine_topk_filtered

    def sim_ivf_exact(s, d):
        from cuvs_lucene_spark.pipeline.similarity import ivf_search, ivf_train

        emb = _emb(s, d)
        cents = ivf_train(emb, n_centroids=8, iters=2)
        return ivf_search(emb, cents, _SIM_QUERY_VEC, k=10, nprobe=8)

    q["sim_ivf_exact"] = sim_ivf_exact

    def sim_ivf_probe(s, d):
        """Persisted-IVF serving path: partition-pruned probe (nprobe=2 of 16
        lists → ~1/8 of the stored bytes read per query). Approximate by
        design → no SQL oracle (rows-only gate); recall and equality with the
        in-memory IVF path are pinned by pytest."""
        from cuvs_lucene_spark.pipeline.similarity import (
            ivf_build,
            ivf_probe_search,
        )

        ivf_dir = _index_dir(d) + "_ivf"
        if not os.path.exists(os.path.join(ivf_dir, "vectors", "_SUCCESS")):
            ivf_build(_emb(s, d), ivf_dir, n_centroids=16, iters=2)
        return _recall_gate(
            s,
            ivf_probe_search(s, ivf_dir, _SIM_QUERY_VEC, k=10, nprobe=2),
            d, 10, 0.2,
        )

    q["sim_ivf_probe"] = sim_ivf_probe

    def _ivfpq_dir(s, d):
        from cuvs_lucene_spark.pipeline.similarity import ivfpq_build

        pq_dir = _index_dir(d) + "_ivfpq"
        if not os.path.exists(os.path.join(pq_dir, "vectors", "_SUCCESS")):
            ivfpq_build(_emb(s, d), pq_dir, n_centroids=16, m=8, ks=16, iters=2)
        return pq_dir

    def sim_ivfpq_exact(s, d):
        """IVF-PQ degenerate-exact config (nprobe=C, refine covers the
        corpus): candidates flow through the codes column + ADC kernel +
        rerank join, and the result is provably the exact cosine top-k —
        the hash-match gate for the PQ plumbing."""
        from cuvs_lucene_spark.pipeline.similarity import ivfpq_search

        return ivfpq_search(
            s, _ivfpq_dir(s, d), _SIM_QUERY_VEC, k=10, nprobe=16, refine=10**6
        )

    q["sim_ivfpq_exact"] = sim_ivfpq_exact

    def sim_ivfpq_probe(s, d):
        """IVF-PQ serving config: nprobe=4 of 16 lists, ADC over the codes
        column only (m=8 bytes/vector scanned vs 512 for raw float64),
        exact rerank of k·4 candidates. Approximate by design → rows-only
        gate; ADC identity, degenerate-exactness, and recall-to-coarse-
        ceiling are pinned by pytest."""
        from cuvs_lucene_spark.pipeline.similarity import ivfpq_search

        return _recall_gate(
            s,
            ivfpq_search(
                s, _ivfpq_dir(s, d), _SIM_QUERY_VEC, k=10, nprobe=4, refine=4
            ),
            d, 10, 0.2,
        )

    q["sim_ivfpq_probe"] = sim_ivfpq_probe

    def sim_graph_exact(s, d):
        """Graph-ANN verifier config (the CAGRA->HNSW analog's exactness
        gate): a COMPLETE graph over a capped id subset + ef >= n means
        every node is one hop from the medoid entry and the beam never
        truncates — the beam search provably returns the exact cosine
        top-k, flowing through the real build/serialize/traverse plumbing
        (pipeline/graph.py; reference lifecycle
        TestCagraToHnswSerializationAndSearch.java)."""
        from cuvs_lucene_spark.pipeline.graph import (
            graph_search,
            knn_graph_build,
        )

        g_dir = _index_dir(d) + "_graph_full"
        if not os.path.exists(os.path.join(g_dir, "meta.json")):
            knn_graph_build(
                _emb(s, d).where(F.col("vec_id") < 256), g_dir, complete=True
            )
        return graph_search(s, g_dir, _SIM_QUERY_VEC, k=10, ef=300)

    q["sim_graph_exact"] = sim_graph_exact

    def sim_graph_probe(s, d):
        """Graph-ANN serving path: NN-Descent kNN graph serialized to the
        HNSW-style packed adjacency, batched best-first beam search (each
        hop = one src-pruned adjacency scan + one id-pruned vector scan).
        Approximate by design -> rows-only gate; build determinism, edge
        recall, search recall, numpy-spec equality, and the serialization
        round-trip are pinned by tests/test_graph.py."""
        from cuvs_lucene_spark.pipeline.graph import (
            graph_search,
            graph_to_hnsw,
            knn_graph_build,
        )

        g_dir = _index_dir(d) + "_graph"
        h_dir = _index_dir(d) + "_hnsw"
        if not os.path.exists(os.path.join(h_dir, "meta.json")):
            knn_graph_build(_emb(s, d), g_dir, degree=12, iters=3)
            graph_to_hnsw(s, g_dir, h_dir)
        return _recall_gate(
            s, graph_search(s, h_dir, _SIM_QUERY_VEC, k=10, ef=48), d, 10, 0.7
        )

    q["sim_graph_probe"] = sim_graph_probe

    def sim_graph_append(s, d):
        """Graph-index APPEND lifecycle (native index merge analog,
        CuVS2510GPUVectorsWriter.java:372-409,491-519): build NN-Descent
        over the low-id half, knn_graph_append the high-id half (bounded
        refinement over touched neighborhoods + atomic meta swap), convert,
        serve. The recall floor asserts appended nodes are actually wired
        into the traversal; append==rebuild edge recall and entry parity
        are pinned by tests/test_graph.py."""
        from cuvs_lucene_spark.pipeline.graph import (
            graph_search,
            graph_to_hnsw,
            knn_graph_append,
            knn_graph_build,
        )

        g_dir = _index_dir(d) + "_graph_app"
        h_dir = _index_dir(d) + "_hnsw_app"
        if not os.path.exists(os.path.join(h_dir, "meta.json")):
            emb = _emb(s, d)
            cut = int(
                emb.agg(F.expr("percentile(vec_id, 0.5)")).collect()[0][0]
            )
            knn_graph_build(
                emb.where(F.col("vec_id") < cut), g_dir, degree=12, iters=3
            )
            knn_graph_append(emb.where(F.col("vec_id") >= cut), g_dir, iters=2)
            graph_to_hnsw(s, g_dir, h_dir)
        return _recall_gate(
            s, graph_search(s, h_dir, _SIM_QUERY_VEC, k=10, ef=64), d, 10, 0.7
        )

    q["sim_graph_append"] = sim_graph_append

    def multimodal_features(s, d):
        from cuvs_lucene_spark.pipeline.multimodal import (
            derive_assets,
            extract_features,
        )

        feats = extract_features(derive_assets(_docs(s, d)))
        return feats.select(
            F.col("asset_id").cast("long"), "kind",
            *[F.col("features")[i].alias(f"f{i}") for i in range(4)],
        )

    q["multimodal_features"] = multimodal_features

    def multimodal_frames(s, d):
        from cuvs_lucene_spark.pipeline.multimodal import derive_assets, frame_sample

        return frame_sample(derive_assets(_docs(s, d)), every_n_bytes=64).select(
            F.col("asset_id").cast("long"),
            F.col("frame_idx").cast("long"),
            F.col("byte_offset").cast("long"),
        )

    q["multimodal_frames"] = multimodal_frames

    return _rotate_gates(q)


# deterministic 64-dim query vector for the similarity queries (shared with
# the SQL oracle literal)
_SIM_QUERY_VEC = [float((i * 37 % 19) - 9) / 10.0 for i in range(64)]


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["fts_topk_single"] = _oracle_topk_sql(["merge"], 10, "or", None)
    o["fts_topk_or"] = _oracle_topk_sql(["merge", "sort", "join"], 10, "or", None)
    o["fts_topk_or_pruned"] = _oracle_topk_sql(
        ["scan", "filter", "window", "hash"], 10, "or", None
    )
    o["fts_topk_and"] = _oracle_topk_sql(["merge", "sort"], 10, "and", None)
    o["fts_topk_not"] = _oracle_topk_sql(
        ["query", "data"], 10, "or", None, exclude=["merge"]
    )
    o["fts_topk_msm"] = _oracle_topk_sql(
        ["scan", "filter", "window"], 10, "or", None, msm=2
    )
    o["fts_topk_filtered"] = _oracle_topk_sql(
        ["query", "data", "batch"], 10, "or", "role = 'user'"
    )
    o["fts_topk_filtered_ts"] = _oracle_topk_sql(
        ["merge", "query"], 10, "or",
        "role = 'user' AND d.ts < TIMESTAMP '2026-01-01 02:00:00'",
    )
    o["fts_topk_hot"] = _oracle_topk_sql(["batch"], 20, "or", None)
    # deletes / time-travel twins: same bounded-subset corpus as the engine's
    # dedicated index (docs_where), victims excluded from RESULTS only (the
    # stats CTE still covers them — pre-merge Lucene semantics); the
    # time-travel oracle is the unfiltered top-k (pre-delete snapshot)
    _del_where = f"WHERE turn_idx < {_DEL_SUBSET_TURNS}"
    o["fts_deletes_live"] = _oracle_topk_sql(
        ["merge", "sort", "join", "window"], 10, "or",
        "turn_idx % 7 <> 3", docs_where=_del_where,
    )
    o["fts_time_travel"] = _oracle_topk_sql(
        ["merge", "sort", "join", "window"], 10, "or", None,
        docs_where=_del_where,
    )
    # addIndexes twin: the spliced halves must equal the one-shot build over
    # the same subset — i.e. exactly the time-travel oracle's statement
    o["fts_add_indexes"] = _oracle_topk_sql(
        ["merge", "sort", "join", "window"], 10, "or", None,
        docs_where=_del_where,
    )
    # MultiReader twin: federated halves == one-shot build over the subset
    o["fts_multireader"] = _oracle_topk_sql(
        ["merge", "sort", "join", "window"], 10, "or", None,
        docs_where=_del_where,
    )
    o["fts_topk_field"] = _oracle_topk_sql(
        ["merge", "filter"], 10, "or", None, field_expr="tool"
    )
    o["fts_topk_multifield"] = _oracle_multifield_sql(
        ["call", "data"], 10, ["text", "tool"]
    )
    o["fts_topk_dismax"] = _oracle_dismax_sql(
        ["call", "data"], 10, ["text", "tool"], 0.3
    )
    o["fts_topk_phrase"] = _oracle_phrase_sql(["merge", "sort"], 10)
    o["fts_topk_multiphrase"] = _oracle_multiphrase_sql(
        [["merge"], ["group", "order"]], 10
    )
    o["fts_topk_phrase_prefix"] = _oracle_phrase_prefix_sql(["merge"], "s", 10)
    o["fts_topk_prefix"] = _oracle_multiterm_sql("term LIKE 's%'", 10)
    o["fts_topk_wildcard"] = _oracle_multiterm_sql("term LIKE '%or%'", 10)
    o["fts_topk_trange"] = _oracle_multiterm_sql(
        "term >= 'sa' AND term < 'so'", 10
    )
    # ordered span-near: the minimal-stretch NearSpansOrdered chain as
    # min-position correlated subqueries — one CTE per clause, no recursion
    o["fts_topk_spannear"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
m0 AS (SELECT doc_id, pos AS p0 FROM tokpos WHERE term = 'merge'),
m1 AS (SELECT m0.doc_id, p0,
         (SELECT min(pos) FROM tokpos t
          WHERE t.doc_id = m0.doc_id AND t.term = 'sort'
            AND t.pos >= m0.p0 + 1) AS p1
       FROM m0),
m2 AS (SELECT m1.doc_id, p0, p1,
         (SELECT min(pos) FROM tokpos t
          WHERE t.doc_id = m1.doc_id AND t.term = 'join'
            AND t.pos >= m1.p1 + 1) AS p2
       FROM m1 WHERE p1 IS NOT NULL),
matches AS (
  SELECT doc_id, (p1 - p0 - 1) + (p2 - p1 - 1) AS width
  FROM m2 WHERE p2 IS NOT NULL
),
pfq AS (
  SELECT doc_id, sum(1.0 / (1.0 + width)) AS pf
  FROM matches WHERE width <= 6 GROUP BY doc_id
),
idfs AS (
  SELECT sum(idf) AS idf_sum FROM (
    SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
              / (count(*) + 0.5)) AS idf
    FROM tf WHERE term IN ('merge', 'sort', 'join') GROUP BY term)
),
spanscores AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM idfs) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM pfq p JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM spanscores ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""
    o["fts_topk_spannear_unord"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
la AS (
  SELECT doc_id, pos,
         lag(pos, 1, -1) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tokpos WHERE term = 'sort'
),
lb AS (
  SELECT doc_id, pos,
         lag(pos, 1, -1) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM tokpos WHERE term = 'merge'
),
-- the merge walk's visited states: every consumed position precedes every
-- current one (a.prev < b.pos AND b.prev < a.pos); width = |a - b|,
-- match at width - 1 <= slop (max+1 - min - 2 for two 1-position clauses)
states AS (
  SELECT a.doc_id, abs(a.pos - b.pos) AS w
  FROM la a JOIN lb b ON a.doc_id = b.doc_id
  WHERE a.prev < b.pos AND b.prev < a.pos
),
pfq AS (
  SELECT doc_id, sum(1.0 / (1.0 + w)) AS pf
  FROM states WHERE w - 1 <= 4 GROUP BY doc_id
),
idfs AS (
  SELECT sum(idf) AS idf_sum FROM (
    SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
              / (count(*) + 0.5)) AS idf
    FROM tf WHERE term IN ('sort', 'merge') GROUP BY term)
),
spanscores AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM idfs) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM pfq p JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM spanscores ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""
    # SpanFirst over an ordered 2-clause near: the spannear min-position
    # chain with the FilterSpans end predicate (span end = p1 + 1 <= 12)
    o["fts_topk_spanfirst"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
m0 AS (SELECT doc_id, pos AS p0 FROM tokpos WHERE term = 'merge'),
m1 AS (SELECT m0.doc_id, p0,
         (SELECT min(pos) FROM tokpos t
          WHERE t.doc_id = m0.doc_id AND t.term = 'sort'
            AND t.pos >= m0.p0 + 1) AS p1
       FROM m0),
matches AS (
  SELECT doc_id, p1 - p0 - 1 AS width
  FROM m1 WHERE p1 IS NOT NULL AND p1 + 1 <= 12
),
pfq AS (
  SELECT doc_id, sum(1.0 / (1.0 + width)) AS pf
  FROM matches WHERE width <= 5 GROUP BY doc_id
),
idfs AS (
  SELECT sum(idf) AS idf_sum FROM (
    SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
              / (count(*) + 0.5)) AS idf
    FROM tf WHERE term IN ('merge', 'sort') GROUP BY term)
),
spanscores AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM idfs) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM pfq p JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM spanscores ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""
    # SpanPositionRange over the ordered 2-clause near: both bounds on the
    # min-position chain (start: p0 >= 2; end: p1 + 1 <= 25)
    o["fts_topk_spanrange"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
m0 AS (SELECT doc_id, pos AS p0 FROM tokpos WHERE term = 'merge'),
m1 AS (SELECT m0.doc_id, p0,
         (SELECT min(pos) FROM tokpos t
          WHERE t.doc_id = m0.doc_id AND t.term = 'sort'
            AND t.pos >= m0.p0 + 1) AS p1
       FROM m0),
matches AS (
  SELECT doc_id, p1 - p0 - 1 AS width
  FROM m1 WHERE p1 IS NOT NULL AND p0 >= 2 AND p1 + 1 <= 25
),
pfq AS (
  SELECT doc_id, sum(1.0 / (1.0 + width)) AS pf
  FROM matches WHERE width <= 5 GROUP BY doc_id
),
idfs AS (
  SELECT sum(idf) AS idf_sum FROM (
    SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
              / (count(*) + 0.5)) AS idf
    FROM tf WHERE term IN ('merge', 'sort') GROUP BY term)
),
spanscores AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM idfs) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM pfq p JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM spanscores ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""
    # single-clause SpanFirst: pf = occurrences of the term at pos < 10
    o["fts_topk_spanfirst_term"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
pfq AS (
  SELECT doc_id, cast(count(*) AS double) AS pf
  FROM tokpos WHERE term = 'merge' AND pos + 1 <= 10 GROUP BY doc_id
),
idfs AS (
  SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
            / (count(*) + 0.5)) AS idf_sum
  FROM tf WHERE term = 'merge'
),
spanscores AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM idfs) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM pfq p JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM spanscores ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""
    # SpanOr standalone: pf = total occurrences of any alternative
    o["fts_topk_spanor"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term FROM dlq
),
pfq AS (
  SELECT doc_id, cast(count(*) AS double) AS pf
  FROM tokpos WHERE term IN ('merge', 'join') GROUP BY doc_id
),
idfs AS (
  SELECT sum(idf) AS idf_sum FROM (
    SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
              / (count(*) + 0.5)) AS idf
    FROM tf WHERE term IN ('merge', 'join') GROUP BY term)
),
spanscores AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM idfs) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM pfq p JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM spanscores ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""
    # near(or(merge, join), sort)~6: clause 1 = UNION of merge/join positions
    o["fts_topk_spannear_orclause"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
m0 AS (SELECT doc_id, pos AS p0 FROM tokpos WHERE term IN ('merge', 'join')),
m1 AS (SELECT m0.doc_id, p0,
         (SELECT min(pos) FROM tokpos t
          WHERE t.doc_id = m0.doc_id AND t.term = 'sort'
            AND t.pos >= m0.p0 + 1) AS p1
       FROM m0),
matches AS (
  SELECT doc_id, p1 - p0 - 1 AS width FROM m1 WHERE p1 IS NOT NULL
),
pfq AS (
  SELECT doc_id, sum(1.0 / (1.0 + width)) AS pf
  FROM matches WHERE width <= 6 GROUP BY doc_id
),
idfs AS (
  SELECT sum(idf) AS idf_sum FROM (
    SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
              / (count(*) + 0.5)) AS idf
    FROM tf WHERE term IN ('merge', 'join', 'sort') GROUP BY term)
),
spanscores AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM idfs) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM pfq p JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM spanscores ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""
    # SpanNot: "merge sort"~6 spans [p0, p1+1) vetoed by a 'join' at
    # q in [p0 - pre, p1 + 1 + post) with pre=0, post=2
    o["fts_topk_spannot"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
m0 AS (SELECT doc_id, pos AS p0 FROM tokpos WHERE term = 'merge'),
m1 AS (SELECT m0.doc_id, p0,
         (SELECT min(pos) FROM tokpos t
          WHERE t.doc_id = m0.doc_id AND t.term = 'sort'
            AND t.pos >= m0.p0 + 1) AS p1
       FROM m0),
matches AS (
  SELECT doc_id, p1 - p0 - 1 AS width
  FROM m1 WHERE p1 IS NOT NULL
    AND NOT EXISTS (
      SELECT 1 FROM tokpos e
      WHERE e.doc_id = m1.doc_id AND e.term = 'join'
        AND e.pos >= m1.p0 AND e.pos < m1.p1 + 1 + 2)
),
pfq AS (
  SELECT doc_id, sum(1.0 / (1.0 + width)) AS pf
  FROM matches WHERE width <= 6 GROUP BY doc_id
),
idfs AS (
  SELECT sum(idf) AS idf_sum FROM (
    SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
              / (count(*) + 0.5)) AS idf
    FROM tf WHERE term IN ('merge', 'sort') GROUP BY term)
),
spanscores AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM idfs) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM pfq p JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM spanscores ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""
    # SpanContaining / SpanWithin: big = ordered chain "merge join"~8
    # (min-position correlated subquery), little = single-term 'sort'
    # spans; containment is a plain EXISTS between the two position sets.
    # idf sums the DISTINCT terms of big ∪ little (one merged sim weight).
    o["fts_topk_spancontaining"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
m0 AS (SELECT doc_id, pos AS p0 FROM tokpos WHERE term = 'merge'),
m1 AS (SELECT m0.doc_id, p0,
         (SELECT min(pos) FROM tokpos t
          WHERE t.doc_id = m0.doc_id AND t.term = 'join'
            AND t.pos >= m0.p0 + 1) AS p1
       FROM m0),
bigch AS (
  SELECT doc_id, p0, p1, p1 - p0 - 1 AS width
  FROM m1 WHERE p1 IS NOT NULL AND p1 - p0 - 1 <= 8
),
pfq AS (
  SELECT b.doc_id, sum(1.0 / (1.0 + b.width)) AS pf
  FROM bigch b
  WHERE EXISTS (SELECT 1 FROM tokpos t
                WHERE t.doc_id = b.doc_id AND t.term = 'sort'
                  AND t.pos >= b.p0 AND t.pos <= b.p1)
  GROUP BY b.doc_id
),
idfs AS (
  SELECT sum(idf) AS idf_sum FROM (
    SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
              / (count(*) + 0.5)) AS idf
    FROM tf WHERE term IN ('merge', 'join', 'sort') GROUP BY term)
),
spanscores AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM idfs) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM pfq p JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM spanscores ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""
    o["fts_topk_spanwithin"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
m0 AS (SELECT doc_id, pos AS p0 FROM tokpos WHERE term = 'merge'),
m1 AS (SELECT m0.doc_id, p0,
         (SELECT min(pos) FROM tokpos t
          WHERE t.doc_id = m0.doc_id AND t.term = 'join'
            AND t.pos >= m0.p0 + 1) AS p1
       FROM m0),
bigch AS (
  SELECT doc_id, p0, p1 FROM m1
  WHERE p1 IS NOT NULL AND p1 - p0 - 1 <= 8
),
littles AS (SELECT doc_id, pos FROM tokpos WHERE term = 'sort'),
pfq AS (
  SELECT l.doc_id, cast(count(*) AS double) AS pf
  FROM littles l
  WHERE EXISTS (SELECT 1 FROM bigch b
                WHERE b.doc_id = l.doc_id
                  AND b.p0 <= l.pos AND l.pos <= b.p1)
  GROUP BY l.doc_id
),
idfs AS (
  SELECT sum(idf) AS idf_sum FROM (
    SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
              / (count(*) + 0.5)) AS idf
    FROM tf WHERE term IN ('merge', 'join', 'sort') GROUP BY term)
),
spanscores AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM idfs) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM pfq p JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM spanscores ORDER BY score DESC, doc_id ASC LIMIT 10
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score
FROM topk t JOIN dlq d USING (doc_id)
ORDER BY rank
"""
    o["fts_facet_ts_ranges"] = f"""{_ORACLE_PREFIX},
ids AS (SELECT DISTINCT doc_id FROM tf
        WHERE term IN ('merge', 'sort', 'join')),
vals AS (SELECT d.ts AS v FROM ids JOIN dlq d USING (doc_id)),
counts AS (
  SELECT 'h0_4' AS facet,
         cast(count(*) FILTER (WHERE v >= TIMESTAMP '2026-01-01 00:00:00'
                                 AND v <  TIMESTAMP '2026-01-01 04:00:00')
              AS bigint) AS n_docs FROM vals
  UNION ALL
  SELECT 'h4_8',
         cast(count(*) FILTER (WHERE v >= TIMESTAMP '2026-01-01 04:00:00'
                                 AND v <  TIMESTAMP '2026-01-01 08:00:00')
              AS bigint) FROM vals
  UNION ALL
  SELECT 'h8_plus',
         cast(count(*) FILTER (WHERE v >= TIMESTAMP '2026-01-01 08:00:00')
              AS bigint) FROM vals
  UNION ALL
  SELECT 'first_half_day',
         cast(count(*) FILTER (WHERE v < TIMESTAMP '2026-01-01 12:00:00')
              AS bigint) FROM vals
)
SELECT facet, n_docs FROM counts ORDER BY facet
"""
    o["fts_topk_fuzzy"] = _oracle_multiterm_sql(
        "levenshtein(term, 'sparc') <= 2", 10
    )
    o["fts_topk_regexp"] = _oracle_multiterm_sql(
        "regexp_matches(term, '^(?:s[a-z]*n)$')", 10
    )
    o["fts_topk_synonym"] = _oracle_synonym_sql(["merge", "join"], 10)
    o["fts_topk_funcscore"] = _oracle_topk_sql(
        ["merge", "sort", "join"], 10, "or", None,
        boost_sql="1.0 + cast(d.turn_idx AS double) / 100.0",
    )
    # DV-update twin: batch 2 (turn%10==1 → 1 + turn/50) overwrites batch 1
    # (turn%5==1 → 2.0); unmatched keys resolve to the field default 1.0 —
    # the CASE order IS the last-write-wins rule
    o["fts_topk_dvupdate"] = _oracle_topk_sql(
        ["merge", "sort", "join"], 10, "or", None,
        boost_sql=(
            "CASE WHEN d.turn_idx % 10 = 1 "
            "THEN 1.0 + cast(d.turn_idx AS double) / 50.0 "
            "WHEN d.turn_idx % 5 = 1 THEN 2.0 ELSE 1.0 END"
        ),
        docs_where=f"WHERE turn_idx < {_DEL_SUBSET_TURNS}",
    )
    o["fts_term_vectors"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
sel AS (
  SELECT doc_id FROM dlq
  WHERE conv_id = '{_TV_KEY[0]}' AND turn_idx = {_TV_KEY[1]}
)
SELECT term, cast(count(*) AS bigint) AS tf,
       string_agg(cast(pos AS varchar), ',' ORDER BY pos) AS positions
FROM tokpos JOIN sel USING (doc_id)
GROUP BY term ORDER BY term
"""
    _sig_ex = ", ".join(f"'{t}'" for t in sorted({"merge", "sort", "join"}))
    o["fts_sigterms"] = f"""{_ORACLE_PREFIX},
{_scores_cte(["merge", "sort", "join"], "or", "")},
fg AS (SELECT doc_id FROM scores ORDER BY score DESC, doc_id ASC LIMIT 25),
fgn AS (SELECT count(*) AS n FROM fg),
fgterm AS (
  SELECT tf.term, count(*) AS fg_df
  FROM tf JOIN fg USING (doc_id)
  WHERE tf.term NOT IN ({_sig_ex})
  GROUP BY tf.term
),
bg AS (
  SELECT term, count(*) AS bg_df FROM tf
  WHERE term IN (SELECT term FROM fgterm) GROUP BY term
)
SELECT f.term AS term, CAST(f.fg_df AS BIGINT) AS fg_df,
       CAST(b.bg_df AS BIGINT) AS bg_df,
       round((CAST(f.fg_df AS DOUBLE) / (SELECT n FROM fgn)
              - CAST(b.bg_df AS DOUBLE) / (SELECT n_docs FROM stats))
             * (CAST(f.fg_df AS DOUBLE) / (SELECT n FROM fgn))
             / (CAST(b.bg_df AS DOUBLE) / (SELECT n_docs FROM stats)), 6)
         AS score
FROM fgterm f JOIN bg b USING (term)
ORDER BY score DESC, term ASC LIMIT 15
"""
    o["fts_topk_rescore"] = _oracle_rescore_sql(
        ["merge", "sort", "join"], "or", ["merge", "sort"], "and",
        30, 10, 1.0, 2.0,
    )
    o["fts_topk_mlt"] = _oracle_mlt_sql(_MLT_TEXT, 10, 5, 1, 2)
    o["fts_topk_boolean"] = _oracle_boolean_sql(10)
    o["fts_topk_constfilter"] = _oracle_boolean_sql(
        10, tree=_constfilter_gate_tree()
    )
    o["fts_topk_boolean_span"] = _oracle_boolean_span_sql(10)
    o["fts_topk_qstring"] = _oracle_qstring_sql(10)
    from cuvs_lucene_spark.analysis import analyze_py as _an

    o["fts_topk_english"] = _oracle_topk_sql(
        _an(_ENG_QUERY, "english"), 10, "or", None, analyzer="english"
    )
    # slop>0: the two-slot SloppyPhraseMatcher sweep as a recursive CTE —
    # this gate was rows-only (`no_oracle`) through round 3; now hash-gated
    o["fts_topk_phrase_slop"] = _oracle_phrase_slop_sql(["merge", "sort"], 2, 10)

    o["fts_topk_batch"] = "\nUNION ALL\n".join(
        f"SELECT cast({qi} AS bigint) AS qid, * FROM ({_oracle_topk_sql(terms, 10, m, None)})"
        for qi, (terms, m) in enumerate(_BATCH_TERM_SETS)
    )
    o["fts_count_or"] = f"""{_ORACLE_PREFIX}
SELECT cast(count(DISTINCT doc_id) AS bigint) AS n
FROM tf WHERE term IN ('merge', 'sort', 'join')
"""
    o["fts_count_and"] = f"""{_ORACLE_PREFIX}
SELECT cast(count(*) AS bigint) AS n FROM (
  SELECT doc_id FROM tf WHERE term IN ('merge', 'sort')
  GROUP BY doc_id HAVING count(DISTINCT term) = 2
)
"""
    o["fts_count_boolean"] = _oracle_boolean_count_sql()
    o["fts_facet_role"] = f"""{_ORACLE_PREFIX}
SELECT d.role AS facet, cast(count(DISTINCT t.doc_id) AS bigint) AS n_docs
FROM tf t JOIN dlq d ON t.doc_id = d.doc_id
WHERE t.term IN ('merge', 'sort', 'join')
GROUP BY d.role ORDER BY n_docs DESC, facet ASC
"""
    o["fts_drill_sideways"] = f"""{_ORACLE_PREFIX},
mset AS (
  SELECT DISTINCT doc_id FROM tf WHERE term IN ('merge', 'sort', 'join')
),
m AS (
  SELECT d.doc_id, d.role, d.turn_idx
  FROM dlq d JOIN mset USING (doc_id)
)
SELECT * FROM (
  SELECT 'role' AS dim, role AS facet, cast(count(*) AS bigint) AS n_docs
  FROM m WHERE turn_idx IN (0,1,2,3,4,5,6,7) GROUP BY role
  UNION ALL
  SELECT 'turn_idx', cast(turn_idx AS varchar), cast(count(*) AS bigint)
  FROM m WHERE role IN ('user','assistant') GROUP BY turn_idx
) ORDER BY dim ASC, n_docs DESC, facet ASC
"""
    o["fts_facet_pivot"] = f"""{_ORACLE_PREFIX},
mset AS (
  SELECT DISTINCT doc_id FROM tf WHERE term IN ('merge', 'sort', 'join')
)
SELECT b.role AS role, b.tool AS tool, cast(count(*) AS bigint) AS n_docs
FROM mset m
JOIN (SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
             role, tool
      FROM base) b ON m.doc_id = b.doc_id
GROUP BY b.role, b.tool
ORDER BY n_docs DESC, role ASC, tool ASC
"""
    o["fts_facet_stats"] = f"""{_ORACLE_PREFIX},
mset AS (
  SELECT DISTINCT doc_id FROM tf WHERE term IN ('merge', 'sort', 'join')
)
SELECT d.role AS facet, cast(count(*) AS bigint) AS n_docs,
       cast(min(d.turn_idx) AS bigint) AS min_v,
       cast(max(d.turn_idx) AS bigint) AS max_v,
       cast(sum(d.turn_idx) AS bigint) AS sum_v,
       round(avg(cast(d.turn_idx AS double)), 4) AS avg_v
FROM mset m JOIN dlq d ON m.doc_id = d.doc_id
GROUP BY d.role ORDER BY facet ASC
"""
    o["fts_group_topk"] = _oracle_group_topk_sql(["merge", "sort", "join"], 3, "role")
    o["fts_sorted_ts"] = _oracle_sorted_sql(["merge", "sort", "join"], 10, desc=True)
    o["fts_collapse_conv"] = _oracle_collapse_sql(["merge", "sort", "join"], 10, "conv_id")
    o["fts_join_conv"] = _oracle_blockjoin_sql(["merge", "sort", "join"], 10, "conv_id")
    o["fts_join_children"] = f"""{_ORACLE_PREFIX},
{_scores_cte(["merge", "sort", "join"], "or", "")},
parents AS (
  SELECT d.conv_id AS parent,
         CAST(sum(CAST(s.score AS DECIMAL(38,10))) AS DOUBLE) AS score
  FROM scores s JOIN dlq d USING (doc_id)
  GROUP BY d.conv_id
),
topp AS (SELECT parent, score FROM parents
         ORDER BY score DESC, parent ASC LIMIT 5)
SELECT d.doc_id AS doc_id, t.parent AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx,
       round(t.score, 4) AS score
FROM topp t JOIN dlq d ON d.conv_id = t.parent
WHERE d.role = 'user'
ORDER BY score DESC, conv_id ASC, doc_id ASC
"""
    o["fts_highlight"] = _oracle_highlight_sql(["merge", "sort", "join"], 10)
    # span-accurate highlighter: topk + marked set from the SAME ordered
    # min-position chain ("merge sort"~5); window/tagging as fts_highlight
    o["fts_highlight_span"] = f"""{_ORACLE_PREFIX},
tokpos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) - 1 AS pos
  FROM dlq
),
m0 AS (SELECT doc_id, pos AS p0 FROM tokpos WHERE term = 'merge'),
m1 AS (SELECT m0.doc_id, p0,
         (SELECT min(pos) FROM tokpos t
          WHERE t.doc_id = m0.doc_id AND t.term = 'sort'
            AND t.pos >= m0.p0 + 1) AS p1
       FROM m0),
cand AS (
  SELECT doc_id, p0, p1, p1 - p0 - 1 AS width
  FROM m1 WHERE p1 IS NOT NULL AND p1 - p0 - 1 <= 5
),
pfq AS (
  SELECT doc_id, sum(1.0 / (1.0 + width)) AS pf FROM cand GROUP BY doc_id
),
idfs AS (
  SELECT sum(idf) AS idf_sum FROM (
    SELECT ln(1 + ((SELECT n_docs FROM stats) - count(*) + 0.5)
              / (count(*) + 0.5)) AS idf
    FROM tf WHERE term IN ('merge', 'sort') GROUP BY term)
),
spanscores AS (
  SELECT p.doc_id,
         (SELECT idf_sum FROM idfs) * p.pf
           / (p.pf + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * d.dl_d
                / (SELECT avgdl FROM stats))) AS score
  FROM pfq p JOIN dlq d USING (doc_id)
),
topk AS (
  SELECT doc_id, round(score, 4) AS score_r
  FROM spanscores ORDER BY score DESC, doc_id ASC LIMIT 10
),
marked AS (
  SELECT c.doc_id, c.p0 AS pos FROM cand c JOIN topk USING (doc_id)
  UNION
  SELECT c.doc_id, c.p1 FROM cand c JOIN topk USING (doc_id)
),
wb AS (
  SELECT doc_id, greatest(cast(min(pos) AS bigint) - 3, 0) AS start_pos
  FROM marked GROUP BY doc_id
),
frag AS (
  SELECT tp.doc_id, w.start_pos,
         string_agg(
           CASE WHEN mk.pos IS NOT NULL
                THEN '<em>' || tp.term || '</em>' ELSE tp.term END,
           ' ' ORDER BY tp.pos) AS snippet_tokens,
         count(*) FILTER (WHERE mk.pos IS NOT NULL) AS n_match
  FROM tokpos tp
  JOIN topk t ON tp.doc_id = t.doc_id
  JOIN wb w ON tp.doc_id = w.doc_id
      AND tp.pos >= w.start_pos AND tp.pos < w.start_pos + 12
  LEFT JOIN marked mk ON tp.doc_id = mk.doc_id AND tp.pos = mk.pos
  GROUP BY tp.doc_id, w.start_pos
)
SELECT row_number() OVER (ORDER BY t.score_r DESC, t.doc_id ASC) AS rank,
       t.doc_id AS doc_id, d.conv_id AS conv_id,
       cast(d.turn_idx AS bigint) AS turn_idx, t.score_r AS score,
       cast(f.start_pos AS bigint) AS start_pos,
       cast(f.n_match AS bigint) AS n_match,
       f.snippet_tokens AS snippet_tokens
FROM topk t JOIN dlq d USING (doc_id) JOIN frag f USING (doc_id)
ORDER BY rank
"""
    o["fts_topk_classic"] = _oracle_classic_sql(["merge", "sort", "join"], 10)
    o["fts_topk_lmd"] = _oracle_lmd_sql(["merge", "sort", "join"], 10)
    o["fts_topk_lmjm"] = _oracle_lmjm_sql(["merge", "sort", "join"], 10)
    o["fts_topk_bm25tuned"] = _oracle_bm25_tuned_sql(["merge", "sort", "join"], 10)
    o["fts_context"] = _oracle_context_sql(["merge", "sort", "join"], 5, 2)
    o["fts_suggest"] = f"""{_ORACLE_PREFIX}
SELECT term, cast(levenshtein(term, 'bat') AS bigint) AS distance,
       cast(count(*) AS bigint) AS df
FROM tf
WHERE term <> 'bat'
  AND length(term) BETWEEN length('bat') - 2 AND length('bat') + 2
  AND levenshtein(term, 'bat') <= 2
GROUP BY term
ORDER BY distance ASC, df DESC, term ASC
LIMIT 8
"""
    o["fts_suggest_complete"] = f"""{_ORACLE_PREFIX}
SELECT term, cast(count(*) AS bigint) AS weight
FROM tf
WHERE term LIKE 's%'
GROUP BY term
ORDER BY weight DESC, term ASC
LIMIT 10
"""
    o["fts_topk_common"] = _oracle_common_sql(["dup", "merge", "scan"], 0.5, 10)
    o["fts_dictionary"] = f"""{_ORACLE_PREFIX}
SELECT term, cast(count(*) AS bigint) AS df, cast(sum(tf) AS bigint) AS cf
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

    # -- training-data pipeline oracles -------------------------------------
    from cuvs_lucene_spark.pipeline import dedup as _dd
    from cuvs_lucene_spark.pipeline import multimodal as _mm
    from cuvs_lucene_spark.pipeline import similarity as _sim
    from cuvs_lucene_spark.pipeline import textstats as _ts

    o["dedup_exact"] = _dd.exact_duplicates_sql("documents")
    o["dedup_ngram_jaccard"] = _dd.ngram_jaccard_pairs_sql(
        "documents", n=3, threshold=0.5
    )
    o["dedup_minhash_sigs"] = f"""
WITH sigs AS ({_dd.minhash_signatures_sql("documents", n=3, n_hashes=32)})
SELECT id, sig[1] AS sig_0, sig[8] AS sig_7, sig[16] AS sig_15, sig[32] AS sig_31
FROM sigs
"""
    # LSH with exact-Jaccard verification emits exactly the qualifying pairs
    # (100% recall on this corpus, empirically pinned by pytest)
    o["dedup_minhash_lsh"] = _dd.ngram_jaccard_pairs_sql(
        "documents", n=3, threshold=0.5
    )
    o["dedup_simhash"] = _dd.simhash_pairs_sql("documents", n=3, max_hamming=3)
    from cuvs_lucene_spark.pipeline import decontam as _dc

    o["decontam_ngram"] = _dc.contamination_report_sql(
        "documents", "doc_id % 97 = 0", n=3
    )
    from cuvs_lucene_spark.pipeline import pii as _pii

    _pc = _pii.pii_counts_sql("pii_text")
    o["pii_scrub"] = f"""
WITH p AS (
  SELECT doc_id, {_pii.synth_pii_text_sql()} AS pii_text FROM documents
)
SELECT doc_id,
       CAST({_pc["pii_email"]} AS BIGINT) AS pii_email,
       CAST({_pc["pii_ipv4"]} AS BIGINT) AS pii_ipv4,
       CAST({_pc["pii_ssn"]} AS BIGINT) AS pii_ssn,
       CAST({_pc["pii_phone"]} AS BIGINT) AS pii_phone,
       CAST({_pc["pii_total"]} AS BIGINT) AS pii_total,
       {_pii.redact_sql("pii_text")} AS redacted
FROM p ORDER BY doc_id
"""
    o["textstats_repetition"] = _ts.repetition_report_sql("documents")
    from cuvs_lucene_spark.pipeline import packing as _pk

    o["pack_sequences"] = _pk.pack_sequences_sql("documents", seq_len=128)
    from cuvs_lucene_spark.percolator import percolate_sql as _perc_sql

    o["percolate"] = _perc_sql("documents", _PERC_QUERIES)
    from cuvs_lucene_spark.pipeline import sampling as _sp

    o["sample_stratified"] = f"""
SELECT doc_id, lang, {_sp.with_split_sql()} AS split
FROM ({_sp.stratified_sample_sql(
        "documents",
        {"en": 0.9, "es": 0.5, "de": 0.25},
        strata_col="lang",
        default_rate=0.1,
    )})
ORDER BY doc_id
"""
    # LSH pairs == exact Jaccard pairs on this corpus (pinned by the
    # dedup_minhash_lsh gate above), so the closure over the exact pair set
    # is the closure over the LSH pair set.
    o["dedup_components"] = _dd.dedup_groups_sql(
        _dd.ngram_jaccard_pairs_sql("documents", n=3, threshold=0.5)
    )

    from cuvs_lucene_spark.pipeline import similarity as _sim

    o["dedup_emb_cosine"] = _sim.embedding_neardup_pairs_sql(
        "embeddings", threshold=0.4
    )
    # LSH oracle replays the SAME crc32-derived hyperplanes (deterministic by
    # construction), so recall < 1 vs the exact operator is fine — both sides
    # examine identical candidate buckets and verify with exact cosine.
    o["dedup_emb_lsh"] = _sim.embedding_lsh_pairs_sql(
        "embeddings", threshold=0.4, bits=16, bands=4, dim=64
    )

    tq = _ts.quality_sql("text")
    o["textstats_quality"] = f"""
SELECT doc_id, cast({tq['n_tokens']} AS bigint) AS n_tokens,
       cast({tq['n_bpe_tokens']} AS bigint) AS n_bpe_tokens,
       round({tq['punct_ratio']}, 6) AS punct_ratio,
       round({tq['stop_ratio']}, 6) AS stop_ratio,
       cast({tq['len_ok']} AS bigint) AS len_ok,
       {tq['quality']} AS quality
FROM documents
"""
    tl = _ts.lang_scores_sql("text")
    o["textstats_langid"] = f"""
SELECT doc_id, {tl['score_de']} AS score_de, {tl['score_en']} AS score_en,
       {tl['score_es']} AS score_es, {tl['score_fr']} AS score_fr,
       {tl['lang_pred']} AS lang_pred
FROM documents
"""
    o["textstats_fingerprint"] = f"""
SELECT doc_id, cast({_ts.fingerprint_sql('text')} AS bigint) AS fingerprint
FROM documents
"""
    o["sim_cosine_topk"] = _sim.cosine_topk_sql("embeddings", _SIM_QUERY_VEC, k=10)
    o["sim_cosine_topk_filtered"] = _sim.cosine_topk_sql(
        "embeddings", _SIM_QUERY_VEC, k=10, filter_sql="label % 2 = 0"
    )
    # nprobe == n_centroids degrades IVF to exact search — same oracle
    o["sim_ivf_exact"] = _sim.cosine_topk_sql("embeddings", _SIM_QUERY_VEC, k=10)
    # degenerate-exact IVF-PQ == exact cosine top-k (sim_ivfpq_probe stays
    # rows-only: approximate by design, pytest-pinned)
    o["sim_ivfpq_exact"] = _sim.cosine_topk_sql("embeddings", _SIM_QUERY_VEC, k=10)
    # complete-graph + ef>=n beam search is provably the exact top-k over
    # the same capped subset (sim_graph_probe stays rows-only: approximate
    # by design, pinned by tests/test_graph.py)
    o["sim_graph_exact"] = _sim.cosine_topk_sql(
        "embeddings", _SIM_QUERY_VEC, k=10, filter_sql="vec_id < 256"
    )
    # approximate probes: the gate computes recall@10 against the exact
    # cosine top-k IN the gate and returns pinned constants, so the driver's
    # hash check asserts the probe structurally works (k rows, ids drawn
    # from the corpus, recall above the config's documented floor) — the
    # replacement for their former rows-only status.

    def _recall_oracle(floor: float) -> str:
        return (
            "SELECT CAST(10 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_hits, "
            f"CAST({floor!r} AS DOUBLE) AS recall_floor, TRUE AS recall_ok"
        )

    o["sim_ivf_probe"] = _recall_oracle(0.2)
    o["sim_ivfpq_probe"] = _recall_oracle(0.2)
    o["sim_graph_probe"] = _recall_oracle(0.7)
    o["sim_graph_append"] = _recall_oracle(0.7)
    o["multimodal_features"] = f"""
WITH feats AS ({_mm.features_sql("documents")})
SELECT asset_id, kind, features[1] AS f0, features[2] AS f1,
       features[3] AS f2, features[4] AS f3
FROM feats
"""
    o["multimodal_frames"] = _mm.frames_sql("documents", every_n_bytes=64)
    return _rotate_gates(o)
