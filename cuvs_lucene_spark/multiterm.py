"""MultiTermQuery family — prefix / wildcard / fuzzy / regexp / term-range
expansion.

Lucene rewrites MultiTermQuery subclasses (PrefixQuery, WildcardQuery,
FuzzyQuery, RegexpQuery, TermRangeQuery) into a BooleanQuery over the terms the pattern matches in the
term dictionary, capped at ``IndexSearcher.maxClauseCount`` (1024) with a
loud ``TooManyClauses`` error [Lucene 10.2.0 MultiTermQuery /
ScoringRewrite; the surface the reference's codec plugs into via its
``pom.xml:42-43`` Lucene dependency]. We re-express exactly that shape:

  dictionary-pruned term expansion (one tiny scan of the dictionary table,
  with the pattern's literal prefix pushed into the parquet scan)
    → the existing OR pipeline (query.search) with per-term idf, weight 1
      — the SCORING_BOOLEAN_REWRITE semantics.

The expansion scan is the analog of Lucene's TermsEnum seek over the term
dictionary: our dictionary table is per-(field, term) rows with parquet
min/max stats, so a prefix/bounded-length predicate prunes row groups the
same way an FST seek prunes dictionary blocks. The scan is distributed
(JVM-side predicates — ``startswith``/``like``/``levenshtein`` — never a
driver-side vocabulary collect), so it holds at a 10^12-turn vocabulary.

Fuzzy matching uses classic Levenshtein edit distance (Spark
``F.levenshtein`` — the same function DuckDB's oracle exposes). Deviation
from Lucene's FuzzyQuery default: no transposition moves (Lucene's
``transpositions=true`` Damerau variant; Lucene itself supports
transpositions=false), and no automaton — the dictionary scan IS the
candidate enumeration.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.query import IndexReader, search

# Lucene IndexSearcher.maxClauseCount default: a MultiTermQuery expanding to
# more terms than this fails loudly instead of building a mega-disjunction.
MAX_CLAUSE_COUNT = 1024

_TOKEN_RE = re.compile(r"[a-z0-9]+\Z")
_WILDCARD_RE = re.compile(r"[a-z0-9*?]+\Z")


class TooManyClauses(ValueError):
    """The pattern expands past max_expansions terms (Lucene analog)."""


def _check_token(s: str, what: str) -> str:
    s = s.lower()
    if not _TOKEN_RE.match(s):
        raise ValueError(
            f"{what} must be one analyzer token ([a-z0-9]+), got {s!r}"
        )
    return s


def expand_terms(
    rd: IndexReader,
    field: str | None = None,
    *,
    prefix: str | None = None,
    wildcard: str | None = None,
    fuzzy: str | None = None,
    regexp: str | None = None,
    term_range: tuple[str | None, str | None] | None = None,
    include_lower: bool = True,
    include_upper: bool = True,
    max_edits: int = 2,
    max_expansions: int = MAX_CLAUSE_COUNT,
) -> list[str]:
    """Terms of `field` matching exactly one of prefix/wildcard/fuzzy/
    regexp/term_range.

    term_range=(lower, upper) is the TermRangeQuery analog: lexicographic
    bounds over the term dictionary, either side None for open-ended,
    inclusivity per include_lower/include_upper (Lucene
    ``TermRangeQuery(field, lower, upper, includeLower, includeUpper)``).
    Both bound predicates are plain string comparisons, pushable into the
    dictionary parquet scan's min/max stats — the FST-range-seek analog.

    One dictionary-table scan; returns the sorted distinct matches. Raises
    TooManyClauses past max_expansions (checked by fetching cap+1 rows, so
    an over-wide pattern never collects an unbounded term list)."""
    n_given = sum(
        x is not None for x in (prefix, wildcard, fuzzy, regexp, term_range)
    )
    if n_given != 1:
        raise ValueError(
            "give exactly one of prefix=, wildcard=, fuzzy=, regexp=, "
            "term_range="
        )
    if not rd.manifest["segments"]:
        return []
    fld = rd.resolve_field(field)
    d = rd.cat.read_dictionary(rd.spark).where(F.col("field") == fld)
    if prefix is not None:
        p = _check_token(prefix, "prefix")
        cond = F.col("term").startswith(p)
    elif wildcard is not None:
        w = wildcard.lower()
        if not _WILDCARD_RE.match(w):
            raise ValueError(
                f"wildcard pattern must be [a-z0-9*?]+, got {wildcard!r}"
            )
        if "*" not in w and "?" not in w:
            cond = F.col("term") == w  # degenerate: plain TermQuery
        else:
            # terms are [a-z0-9]+ by analyzer contract, so * → % and ? → _
            # need no LIKE-escaping; the literal prefix before the first
            # wildcard additionally pushes a startswith range into the scan
            cond = F.col("term").like(w.replace("*", "%").replace("?", "_"))
            lit_prefix = re.split(r"[*?]", w, maxsplit=1)[0]
            if lit_prefix:
                cond = F.col("term").startswith(lit_prefix) & cond
    elif regexp is not None:
        # RegexpQuery analog: the pattern is anchored whole-term, exactly
        # Lucene's RegExp semantics (a term matches iff the ENTIRE term is in
        # the language). The regex's literal prefix (maximal run of plain
        # [a-z0-9] chars at the start, stopping before any metacharacter)
        # additionally pushes a startswith range into the parquet scan — the
        # analog of Lucene's CompiledAutomaton common-prefix seek.
        try:
            re.compile(regexp)
        except re.error as e:
            raise ValueError(f"invalid regexp {regexp!r}: {e}") from e
        anchored = f"\\A(?:{regexp})\\Z"
        cond = F.col("term").rlike(anchored)
        m = re.match(r"[a-z0-9]+", regexp)
        # a literal char before a quantifier (*, ?, +, {) is NOT a fixed
        # prefix char — trim the last literal when one follows
        lit = m.group(0) if m else ""
        if lit and len(lit) < len(regexp) and regexp[len(lit)] in "*?+{":
            lit = lit[:-1]
        if lit:
            cond = F.col("term").startswith(lit) & cond
    elif term_range is not None:
        lo, hi = term_range
        if lo is None and hi is None:
            raise ValueError("term_range needs at least one bound")
        if lo is not None and hi is not None:
            lo_c, hi_c = _check_token(lo, "lower"), _check_token(hi, "upper")
            if lo_c > hi_c or (
                lo_c == hi_c and not (include_lower and include_upper)
            ):
                return []  # empty interval, same as Lucene's empty TermsEnum
        cond = F.lit(True)
        if lo is not None:
            lo = _check_token(lo, "lower")
            cond = cond & (
                F.col("term") >= lo if include_lower else F.col("term") > lo
            )
        if hi is not None:
            hi = _check_token(hi, "upper")
            cond = cond & (
                F.col("term") <= hi if include_upper else F.col("term") < hi
            )
    else:
        q = _check_token(fuzzy, "fuzzy")
        if max_edits < 0:
            raise ValueError("max_edits must be >= 0")
        # length band first (pushable range predicate — |len(a)-len(b)| is a
        # Levenshtein lower bound), then the exact distance on survivors
        cond = (
            F.length("term").between(len(q) - max_edits, len(q) + max_edits)
            & (F.levenshtein(F.col("term"), F.lit(q)) <= max_edits)
        )
    rows = (
        d.where(cond)
        .select("term")
        .distinct()
        .limit(max_expansions + 1)
        .collect()
    )
    if len(rows) > max_expansions:
        raise TooManyClauses(
            f"pattern expands to more than {max_expansions} terms "
            f"(maxClauseCount analog) — narrow it or raise max_expansions"
        )
    return sorted(r["term"] for r in rows)


def search_multiterm(
    spark: SparkSession,
    index_dir: str,
    *,
    prefix: str | None = None,
    wildcard: str | None = None,
    fuzzy: str | None = None,
    regexp: str | None = None,
    term_range: tuple[str | None, str | None] | None = None,
    include_lower: bool = True,
    include_upper: bool = True,
    max_edits: int = 2,
    k: int = 10,
    filter_cond: Column | str | None = None,
    prune: bool | str = False,
    reader: IndexReader | None = None,
    float32: bool = True,
    field: str | None = None,
    max_expansions: int = MAX_CLAUSE_COUNT,
) -> DataFrame:
    """Top-k BM25 for a prefix/wildcard/fuzzy/regexp/term-range query.

    Expansion → query.search OR-mode disjunction: every matched term scores
    with its OWN idf and weight 1 (SCORING_BOOLEAN_REWRITE), composing with
    the full search surface (filter_cond pre-filter, block-max prune, deletes
    masking, per-field stats). Returns (doc_id, score, conv_id, turn_idx)."""
    rd = reader or IndexReader(spark, index_dir)
    terms = expand_terms(
        rd,
        field,
        prefix=prefix,
        wildcard=wildcard,
        fuzzy=fuzzy,
        regexp=regexp,
        term_range=term_range,
        include_lower=include_lower,
        include_upper=include_upper,
        max_edits=max_edits,
        max_expansions=max_expansions,
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


def suggest_terms(
    spark: SparkSession,
    index_dir: str,
    word: str,
    max_edits: int = 2,
    top_n: int = 5,
    min_df: int = 1,
    max_query_df_ratio: float | None = None,
    field: str | None = None,
    reader: IndexReader | None = None,
) -> DataFrame:
    """Spell-check suggestions — the Lucene DirectSpellChecker analog.

    Candidates = dictionary terms within ``max_edits`` Levenshtein edits of
    ``word`` (the input itself excluded), with df ≥ ``min_df``; ordered by
    the pinned comparator (distance asc, df desc, term asc) — the
    DirectSpellChecker shape (closer edits first, then more frequent), made
    fully deterministic by the trailing term tie-break. Returns
    (term, distance, df) limited to ``top_n``.

    max_query_df_ratio — the maxQueryFrequency analog: if the INPUT word's
    own df exceeds ratio × docCount it is considered correctly spelled and
    the result is empty (Lucene DirectSpellChecker.setMaxQueryFrequency).

    Plan shape at scale: one dictionary-table scan (bucket-pruned parquet,
    tiny vs postings) with a pushable length-band range predicate before the
    exact Levenshtein, a per-term df aggregation, then TakeOrderedAndProject
    of top_n rows. No postings or payload bytes are ever read.
    """
    rd = reader or IndexReader(spark, index_dir)
    empty = spark.createDataFrame([], "term string, distance int, df long")
    if not rd.manifest["segments"] or top_n <= 0:
        return empty
    w = _check_token(word, "word")
    if max_edits < 0:
        raise ValueError("max_edits must be >= 0")
    fld = rd.resolve_field(field)
    if max_query_df_ratio is not None:
        st = rd.term_stats([w], fld)
        f_docs, _sdl, _avg = rd.field_stats_of(fld)
        if st.get(w, (0, 0))[0] > max_query_df_ratio * max(f_docs, 1):
            return empty  # input is frequent enough to be "correct"
    d = (
        rd.cat.read_dictionary(spark)
        .where(
            (F.col("field") == fld)
            & F.length("term").between(len(w) - max_edits, len(w) + max_edits)
            & (F.col("term") != w)
        )
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .withColumn("distance", F.levenshtein(F.col("term"), F.lit(w)))
        .where((F.col("distance") <= max_edits) & (F.col("df") >= min_df))
    )
    return (
        d.select("term", "distance", F.col("df").cast("long").alias("df"))
        .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
        .limit(top_n)
    )


def search_common(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    max_term_frequency: float = 0.01,
    high_freq_msm: int = 0,
    filter_cond: Column | str | None = None,
    reader: IndexReader | None = None,
    float32: bool = True,
    field: str | None = None,
) -> DataFrame:
    """CommonTermsQuery analog [Lucene 10.2.0 queries module, via the
    reference's ``pom.xml:42-43`` Lucene dependency]: query terms are split
    by document frequency at query time — RARE terms (df ≤ cutoff) become
    REQUIRED (MUST) clauses, COMMON terms (df > cutoff) become OPTIONAL
    (SHOULD) clauses that still contribute to the score when they match.
    The stopword-free recall of a plain AND over the informative terms, at
    the cost of an OR only over the common ones.

    max_term_frequency — the cutoff: a ratio of the field's docCount when
    ≤ 1.0, an absolute df otherwise (exactly Lucene's dual convention).
    Absent terms (df = 0) land in the rare/MUST group, so a misspelled rare
    term makes the query match nothing — Lucene's behavior. With no rare
    terms the query degenerates to a plain OR over the common terms (with
    ``high_freq_msm`` as its minimum_should_match — Lucene's
    highFreqMinimumShouldMatch); with no common terms, to a plain AND.

    Term stats come from the driver-side TermStates cache (one dictionary
    seek), so the split costs nothing extra; execution is one compiled
    boolean tree over the shared-pivot executor (booleanq.search_boolean):
    ONE bucket+term-pruned postings scan regardless of the split.
    """
    from cuvs_lucene_spark.booleanq import Q, search_boolean

    rd = reader or IndexReader(spark, index_dir)
    out_t = "float" if float32 else "double"
    empty = spark.createDataFrame(
        [], f"doc_id long, score {out_t}, conv_id string, turn_idx int"
    )
    toks = rd.analyze(query)
    if not toks or not rd.manifest["segments"]:
        return empty
    fld = rd.resolve_field(field)
    f_docs, _sdl, _avg = rd.field_stats_of(fld)
    if f_docs == 0:
        return empty
    cutoff = (
        max_term_frequency * f_docs
        if max_term_frequency <= 1.0
        else max_term_frequency
    )
    stats = rd.term_stats(sorted(set(toks)), fld)
    # clause order inside each group = query order (the float64 summation
    # order, which the SQL oracle mirrors)
    low = [t for t in toks if stats.get(t, (0, 0))[0] <= cutoff]
    high = [t for t in toks if stats.get(t, (0, 0))[0] > cutoff]
    if low and high:
        tree = Q.boolean(
            must=[Q.term(t) for t in low],
            should=[Q.term(t) for t in high],
        )
    elif low:
        tree = Q.boolean(must=[Q.term(t) for t in low])
    else:
        tree = Q.boolean(
            should=[Q.term(t) for t in high], msm=high_freq_msm
        )
    return search_boolean(
        spark, index_dir, tree, k=k, filter_cond=filter_cond, reader=rd,
        float32=float32, field=field,
    )


def suggest_completions(
    spark: SparkSession,
    index_dir: str,
    prefix: str,
    top_n: int = 10,
    min_df: int = 1,
    field: str | None = None,
    reader: IndexReader | None = None,
) -> DataFrame:
    """Prefix completion suggester (term autocomplete) — the Lucene suggest
    module's weighted-lookup shape over the index's own vocabulary (cf.
    DirectSpellChecker's sibling suggesters; the reference delegates the
    whole dictionary surface to its Lucene dependency, ``pom.xml:42-43``).
    Returns (term, weight) where weight = the term's document frequency,
    ordered (weight desc, term asc) — the deterministic analog of a
    weight-sorted FST lookup — limited to ``top_n``.

    Plan shape at scale: one dictionary-table scan with the prefix pushed
    into the parquet scan (startswith over the sorted term layout → row-group
    min/max pruning — the FST common-prefix seek analog), a per-term df
    aggregation, TakeOrderedAndProject of top_n rows. No postings bytes.
    """
    rd = reader or IndexReader(spark, index_dir)
    empty = spark.createDataFrame([], "term string, weight long")
    if not rd.manifest["segments"] or top_n <= 0:
        return empty
    p = _check_token(prefix, "prefix")
    fld = rd.resolve_field(field)
    d = (
        rd.cat.read_dictionary(spark)
        .where((F.col("field") == fld) & F.col("term").startswith(p))
        .groupBy("term")
        .agg(F.sum("df").cast("long").alias("weight"))
        .where(F.col("weight") >= min_df)
        .orderBy(F.desc("weight"), F.asc("term"))
        .limit(top_n)
    )
    return d
