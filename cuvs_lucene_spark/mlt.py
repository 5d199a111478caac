"""More Like This — find documents similar to a given text.

Lucene's MoreLikeThis (queries module) builds a term-disjunction query from
an example document: candidate terms are filtered by minTermFreq / minDocFreq
/ maxDocFreq, ranked, capped at maxQueryTerms (default 25), and rewritten to
a BooleanQuery of SHOULD TermQueries [Lucene 10.2.0 MoreLikeThis — the query
surface the reference's codec plugs into via its ``pom.xml:42-43`` Lucene
dependency]. We re-express exactly that shape:

  tokenize the example text (driver-side, one doc)
    → per-candidate df from the term dictionary (driver TermStates cache,
      one tiny pruned scan for cache misses — the TermsEnum seek analog)
    → select ≤ max_query_terms candidates
    → the existing OR pipeline (query.search) with per-term idf, weight 1.

Documented deviation from Lucene: MoreLikeThis ranks candidates by a
classic-TFIDF float score (tf · log(numDocs/(docFreq+1))). We rank by the
INTEGER key (tf DESC, df ASC, term ASC) — the same "frequent in the example,
rare in the corpus" preference, but bit-stable across engines: a float
selection key could flip the candidate cut on a last-ULP libm difference
between the engine and the DuckDB oracle, turning an arbitrary tie into a
gate failure. Selection is metadata-only either way; the *scores* of the
final query remain exact BM25.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame, SparkSession

from cuvs_lucene_spark.query import IndexReader, search

MAX_QUERY_TERMS = 25  # Lucene MoreLikeThis.DEFAULT_MAX_QUERY_TERMS
MIN_TERM_FREQ = 2  # Lucene MoreLikeThis.DEFAULT_MIN_TERM_FREQ
MIN_DOC_FREQ = 5  # Lucene MoreLikeThis.DEFAULT_MIN_DOC_FREQ


def select_like_terms(
    rd: IndexReader,
    like_text: str,
    field: str | None = None,
    *,
    max_query_terms: int = MAX_QUERY_TERMS,
    min_term_freq: int = MIN_TERM_FREQ,
    min_doc_freq: int = MIN_DOC_FREQ,
    max_doc_freq: int | None = None,
) -> list[str]:
    """The MoreLikeThis candidate selection: terms of `like_text` that occur
    ≥ min_term_freq times in it and have corpus df in [min_doc_freq,
    max_doc_freq], ranked (tf DESC, df ASC, term ASC), capped at
    max_query_terms. Returns the selected terms (selection order)."""
    tf = Counter(rd.analyze(like_text))
    cands = sorted(t for t, c in tf.items() if c >= min_term_freq)
    if not cands or not rd.manifest["segments"]:
        return []
    stats = rd.term_stats(cands, field)  # absent terms are dropped here
    scored = []
    for t in cands:
        df = stats.get(t, (0, -1))[0]
        if df < min_doc_freq:
            continue
        if max_doc_freq is not None and df > max_doc_freq:
            continue
        scored.append((-tf[t], df, t))
    scored.sort()
    return [t for _ntf, _df, t in scored[:max_query_terms]]


def more_like_this(
    spark: SparkSession,
    index_dir: str,
    like_text: str,
    k: int = 10,
    *,
    field: str | None = None,
    max_query_terms: int = MAX_QUERY_TERMS,
    min_term_freq: int = MIN_TERM_FREQ,
    min_doc_freq: int = MIN_DOC_FREQ,
    max_doc_freq: int | None = None,
    filter_cond: Column | str | None = None,
    prune: bool | str = False,
    reader: IndexReader | None = None,
    float32: bool = True,
) -> DataFrame:
    """Top-k BM25 over the MoreLikeThis rewrite of `like_text`.

    Selection → query.search OR-mode disjunction: every selected term scores
    with its own idf and weight 1 (each term appears once in the rewritten
    query — Lucene MLT's default boost=false), composing with the full
    search surface (filter_cond, block-max prune, deletes masking, per-field
    stats). Returns (doc_id, score, conv_id, turn_idx). To exclude the
    example document itself (Lucene callers filter the seed docID), pass a
    filter_cond excluding its key."""
    rd = reader or IndexReader(spark, index_dir)
    terms = select_like_terms(
        rd,
        like_text,
        field,
        max_query_terms=max_query_terms,
        min_term_freq=min_term_freq,
        min_doc_freq=min_doc_freq,
        max_doc_freq=max_doc_freq,
    )
    if not terms:
        return spark.createDataFrame(
            [],
            f"doc_id long, score {'float' if float32 else 'double'}, "
            "conv_id string, turn_idx int",
        )
    return search(
        spark,
        index_dir,
        " ".join(terms),
        k=k,
        mode="or",
        filter_cond=filter_cond,
        prune=prune,
        reader=rd,
        float32=float32,
        field=field,
    )
