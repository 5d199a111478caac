"""Classic query-string parser (Lucene classic QueryParser analog).

Every interactive Lucene user types query strings, not query objects — the
reference serves that surface through its Lucene dependency [Lucene-10.2.0
classic QueryParser, via ``pom.xml:42-43``]. This module parses the classic
syntax and compiles it onto the engine's existing executors: the nested
BooleanQuery AST (booleanq.Q → search_boolean), the MultiTermQuery expansion
(multiterm.expand_terms), and PhraseQuery (query.search_phrase).

Supported syntax (the classic grammar, minus per-clause fields):

    hello world              two SHOULD clauses (default operator OR)
    +hello -world            MUST / MUST_NOT modifiers
    hello AND world          AND upgrades BOTH neighbours to MUST
    hello OR world           explicit SHOULD
    NOT world, !world        MUST_NOT
    (a OR b) AND c           grouping
    quick^2 (a b)^0.5        boosts on terms and groups
    "exact phrase"           PhraseQuery;  "a b"~3 = sloppy with slop 3
    mer* sc?n                WildcardQuery (leading * refused, like Lucene)
    fuzzi~ fuzzi~1           FuzzyQuery (default max_edits 2)
    /mer(ge|ging)/           RegexpQuery (anchored whole-term)
    [sa TO so] {sa TO so}    TermRangeQuery ([] inclusive, {} exclusive,
                             mixed allowed, * = open bound)

Operator semantics follow Lucene's QueryParserBase.addClause exactly: the
parser is NOT precedence-based — ``a AND b OR c`` marks a=MUST b=MUST
c=SHOULD, left to right, matching the classic parser's documented (and
famously surprising) behaviour. ``default_operator="and"`` flips unmarked
clauses to MUST, as q.op=AND does in Lucene.

Per-clause fields (``title:term``) are parsed but only accepted when they
name the field the query searches — the boolean executor pivots one field
per query; cross-field strings raise with a pointer at the ``field=``
argument and the dedicated cross-field executor (query.search_multifield).

Compilation needs an IndexReader because multi-term leaves expand against
the term dictionary (Lucene rewrites MultiTermQuery the same way, and the
SHOULD-of-expanded-terms scoring below is its SCORING_BOOLEAN_REWRITE,
matching multiterm.search_multiterm). A leaf that expands to nothing
becomes MatchNoDocsQuery: dropped from SHOULD/MUST_NOT, annihilates a MUST
list — Lucene's simplification rules.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession

from cuvs_lucene_spark.analysis import tokenize_py
from cuvs_lucene_spark.booleanq import Q, search_boolean

__all__ = ["ParseError", "parse_query", "compile_query", "search_qstring"]


class ParseError(ValueError):
    """Malformed query string (classic QueryParser ParseException analog)."""


# ---------------------------------------------------------------------------
# syntax tree (pre-compilation — leaves still carry raw patterns)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Node:
    """One parsed node; kind selects which fields are meaningful.

    kind: term | phrase | wildcard | fuzzy | regexp | range | bool
    """

    kind: str
    text: str = ""            # raw leaf text (term/pattern)
    slop: int = 0             # phrase
    max_edits: int = 2        # fuzzy
    boost: float = 1.0
    field: str | None = None  # explicit `field:` prefix, if any
    lower: str | None = None  # range bounds (None = open)
    upper: str | None = None
    inc_lo: bool = True       # [ vs { / ] vs }
    inc_hi: bool = True
    should: tuple = ()
    must: tuple = ()
    must_not: tuple = ()


# ---------------------------------------------------------------------------
# lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s+
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<boost>\^(?P<boostval>[0-9]+(?:\.[0-9]+)?))
  | (?P<phrase>"(?P<ph>[^"]*)"(?:~(?P<phslop>[0-9]+))?)
  | (?P<regexp>/(?P<re>(?:[^/\\]|\\.)*)/)
  | (?P<range>(?P<rfld>[A-Za-z_][A-Za-z0-9_]*:)?
      (?P<rlb>[\[\{])\s*(?P<rlo>[^\s\]\}]+)\s+TO\s+(?P<rhi>[^\s\]\}]+)\s*
      (?P<rrb>[\]\}]))
  | (?P<word>(?P<fld>[A-Za-z_][A-Za-z0-9_]*:)?(?P<w>[^\s()^"/!+~-][^\s()^"~]*)
      (?:~(?P<fz>[0-9]*))?)
    """,
    re.VERBOSE,
)


def _lex(s: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    i = 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise ParseError(f"cannot lex query at position {i}: {s[i:i + 20]!r}")
        i = m.end()
        if m.lastgroup is None or m.group().isspace():
            continue
        if m.group("lparen"):
            out.append(("(", None))
        elif m.group("rparen"):
            out.append((")", None))
        elif m.group("and"):
            out.append(("AND", None))
        elif m.group("or"):
            out.append(("OR", None))
        elif m.group("not"):
            out.append(("NOT", None))
        elif m.group("plus"):
            out.append(("+", None))
        elif m.group("minus"):
            out.append(("-", None))
        elif m.group("boost"):
            out.append(("^", float(m.group("boostval"))))
        elif m.group("phrase") is not None:
            out.append(("PHRASE", (m.group("ph"), int(m.group("phslop") or 0))))
        elif m.group("regexp") is not None:
            out.append(("REGEXP", m.group("re").replace("\\/", "/")))
        elif m.group("range") is not None:
            rfld = m.group("rfld")
            lo, hi = m.group("rlo"), m.group("rhi")
            out.append((
                "RANGE",
                (
                    rfld[:-1] if rfld else None,
                    None if lo == "*" else lo.lower(),
                    None if hi == "*" else hi.lower(),
                    m.group("rlb") == "[",
                    m.group("rrb") == "]",
                ),
            ))
        else:
            fld = m.group("fld")
            word = m.group("w")
            fz = m.group("fz")  # None = no '~'; '' = bare '~'; digits = edits
            out.append(("WORD", (fld[:-1] if fld else None, word, fz)))
    return out


# ---------------------------------------------------------------------------
# parser — classic QueryParser clause algorithm (QueryParserBase.addClause)
# ---------------------------------------------------------------------------

_C_NONE, _C_AND, _C_OR = 0, 1, 2
_M_NONE, _M_PLUS, _M_MINUS = 0, 1, 2


class _Parser:
    def __init__(self, toks: list[tuple[str, object]], default_operator: str):
        if default_operator not in ("or", "and"):
            raise ValueError("default_operator must be 'or' or 'and'")
        self.toks = toks
        self.pos = 0
        self.default_and = default_operator == "and"

    def _peek(self) -> str | None:
        return self.toks[self.pos][0] if self.pos < len(self.toks) else None

    def _next(self) -> tuple[str, object]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    # -- grammar -----------------------------------------------------------
    def parse(self) -> Node:
        q = self._query()
        if self.pos != len(self.toks):
            raise ParseError(f"unexpected {self.toks[self.pos][0]!r} after query")
        return q

    def _query(self) -> Node:
        # (occur, node) clause list built with the classic mutate-previous
        # algorithm: conj AND upgrades the PREVIOUS clause to MUST; with
        # default AND, conj OR downgrades it to SHOULD.
        clauses: list[list] = []  # [occur, node]; occur in {"should","must","must_not"}
        while True:
            t = self._peek()
            if t is None or t == ")":
                break
            conj = _C_NONE
            if t in ("AND", "OR"):
                conj = _C_AND if t == "AND" else _C_OR
                self._next()
                t = self._peek()
            mods = _M_NONE
            if t in ("+", "-", "NOT"):
                mods = _M_PLUS if t == "+" else _M_MINUS
                self._next()
                t = self._peek()
            if t is None or t == ")":
                raise ParseError("dangling operator at end of (sub)query")
            if t in ("AND", "OR"):
                raise ParseError("two consecutive boolean operators")
            node = self._atom()
            self._add_clause(clauses, conj, mods, node)
        if not clauses:
            raise ParseError("empty (sub)query")
        if len(clauses) == 1 and clauses[0][0] == "should":
            return clauses[0][1]  # single unmarked clause unwraps, like Lucene
        return Node(
            kind="bool",
            should=tuple(n for occ, n in clauses if occ == "should"),
            must=tuple(n for occ, n in clauses if occ == "must"),
            must_not=tuple(n for occ, n in clauses if occ == "must_not"),
        )

    def _add_clause(self, clauses: list[list], conj: int, mods: int, node: Node) -> None:
        if not clauses and conj != _C_NONE:
            raise ParseError("query cannot start with AND/OR")
        # mutate the previous clause exactly as QueryParserBase.addClause does
        if clauses and conj == _C_AND and clauses[-1][0] == "should":
            clauses[-1][0] = "must"
        if clauses and self.default_and and conj == _C_OR and clauses[-1][0] == "must":
            clauses[-1][0] = "should"
        if mods == _M_MINUS:
            occ = "must_not"
        elif mods == _M_PLUS:
            occ = "must"
        elif self.default_and:
            occ = "should" if conj == _C_OR else "must"
        else:
            occ = "must" if conj == _C_AND else "should"
        clauses.append([occ, node])

    def _atom(self) -> Node:
        kind, val = self._next()
        if kind == "(":
            node = self._query()
            if self._peek() != ")":
                raise ParseError("missing closing ')'")
            self._next()
        elif kind == "PHRASE":
            raw, slop = val
            toks = tokenize_py(raw)
            if not toks:
                raise ParseError(f'phrase "{raw}" contains no analyzer tokens')
            if len(toks) == 1:  # one-token phrase degrades to a TermQuery
                node = Node(kind="term", text=toks[0])
            else:
                node = Node(kind="phrase", text=" ".join(toks), slop=slop)
        elif kind == "REGEXP":
            node = Node(kind="regexp", text=val)
        elif kind == "RANGE":
            fld, lo, hi, inc_lo, inc_hi = val
            if lo is None and hi is None:
                raise ParseError("range [* TO *] needs at least one bound")
            for b in (lo, hi):
                if b is not None and not re.fullmatch(r"[a-z0-9]+", b):
                    raise ParseError(
                        f"range bound must be one analyzer token: {b!r}"
                    )
            node = Node(
                kind="range", lower=lo, upper=hi, inc_lo=inc_lo, inc_hi=inc_hi
            )
            if fld is not None:
                node = _with(node, field=fld.lower())
        elif kind == "WORD":
            fld, word, fz = val
            w = word.lower()
            if w[0] in "[{":
                # a bracket that didn't lex as a RANGE is a malformed range
                # (Lucene classic ParseException), not a term
                raise ParseError(
                    f"malformed range near {word!r}: expected "
                    "[lower TO upper] with one-token bounds (* = open)"
                )
            if fz is not None:
                if "*" in w or "?" in w:
                    raise ParseError(f"cannot combine fuzzy ~ with wildcards: {word!r}")
                toks = tokenize_py(w)
                if len(toks) != 1:
                    raise ParseError(f"fuzzy pattern must be one token: {word!r}")
                edits = int(fz) if fz else 2
                node = (
                    Node(kind="term", text=toks[0]) if edits == 0
                    else Node(kind="fuzzy", text=toks[0], max_edits=edits)
                )
            elif "*" in w or "?" in w:
                if w[0] in "*?":
                    raise ParseError(
                        f"leading-wildcard pattern {word!r} not allowed "
                        "(Lucene allowLeadingWildcard default)"
                    )
                if not re.fullmatch(r"[a-z0-9*?]+", w):
                    raise ParseError(f"wildcard pattern must be [a-z0-9*?]+: {word!r}")
                node = Node(kind="wildcard", text=w)
            else:
                toks = tokenize_py(w)
                if not toks:
                    raise ParseError(f"term {word!r} contains no analyzer tokens")
                if len(toks) == 1:
                    node = Node(kind="term", text=toks[0])
                else:
                    # analyzer split one bare word into several tokens →
                    # SHOULD group (Lucene's multi-token synonym handling)
                    node = Node(
                        kind="bool",
                        should=tuple(Node(kind="term", text=t) for t in toks),
                    )
            if fld is not None:
                node = _with(node, field=fld.lower())
        else:
            raise ParseError(f"unexpected token {kind!r}")
        if self._peek() == "^":
            _, b = self._next()
            node = _with(node, boost=float(b))
        return node


def _with(n: Node, **kw) -> Node:
    d = {**n.__dict__, **kw}
    return Node(**d)


def parse_query(s: str, default_operator: str = "or") -> Node:
    """Parse a classic query string into a syntax tree (no index needed)."""
    if not s or not s.strip():
        raise ParseError("empty query string")
    return _Parser(_lex(s), default_operator).parse()


# ---------------------------------------------------------------------------
# compilation: syntax tree → booleanq.Q against a concrete index
# ---------------------------------------------------------------------------

_MATCH_NONE = object()  # MatchNoDocsQuery sentinel


def _compile(n: Node, rd, fld: str, max_expansions: int):
    from cuvs_lucene_spark.multiterm import expand_terms

    if n.field is not None and n.field != fld:
        raise ParseError(
            f"per-clause field {n.field!r} != searched field {fld!r}: the "
            "boolean executor pivots one field per query — search that field "
            "with field=, or use query.search_multifield for cross-field"
        )
    if n.kind == "term":
        # the parser is the ANALYZING layer (Lucene QueryParser): apply the
        # index's chain to the leaf. A term that analyzes to nothing (a
        # stopword under "english") is Lucene's null query — MatchNoDocs
        # here, dropped by the boolean simplification rules.
        if rd is not None and rd.analyzer != "standard":
            toks = rd.analyze(n.text)
            if not toks:
                return _MATCH_NONE
            return Q.term(toks[0], boost=n.boost)
        return Q.term(n.text, boost=n.boost)
    if n.kind == "phrase":
        if rd is not None and rd.analyzer != "standard":
            raise ParseError(
                "phrase clauses in query strings are not supported on a "
                f"{rd.analyzer!r}-analyzed index — use query.search_phrase, "
                "which applies the chain with stopword position gaps"
            )
        return Q.phrase(n.text, slop=n.slop, boost=n.boost)
    if n.kind in ("wildcard", "fuzzy", "regexp", "range"):
        if rd is None:
            raise ValueError(
                f"{n.kind} leaves need an IndexReader to expand against "
                "the term dictionary (compile_query(reader=None) is for "
                "term/phrase/bool-only strings)"
            )
        kw = {
            "wildcard": {"wildcard": n.text},
            "fuzzy": {"fuzzy": n.text, "max_edits": n.max_edits},
            "regexp": {"regexp": n.text},
            "range": {
                "term_range": (n.lower, n.upper),
                "include_lower": n.inc_lo,
                "include_upper": n.inc_hi,
            },
        }[n.kind]
        terms = expand_terms(rd, fld, max_expansions=max_expansions, **kw)
        if not terms:
            return _MATCH_NONE
        if len(terms) == 1:
            return Q.term(terms[0], boost=n.boost)
        # SCORING_BOOLEAN_REWRITE: SHOULD over the expansions, boost on the
        # wrapper — matches multiterm.search_multiterm scoring exactly
        return Q.boolean(
            should=[Q.term(t) for t in terms], boost=n.boost
        )
    if n.kind == "bool":
        must = [_compile(c, rd, fld, max_expansions) for c in n.must]
        should = [_compile(c, rd, fld, max_expansions) for c in n.should]
        must_not = [_compile(c, rd, fld, max_expansions) for c in n.must_not]
        if any(c is _MATCH_NONE for c in must):
            return _MATCH_NONE  # a MUST that matches nothing kills the node
        should = [c for c in should if c is not _MATCH_NONE]
        must_not = [c for c in must_not if c is not _MATCH_NONE]
        if not should and not must:
            return _MATCH_NONE  # pure negation / everything dropped
        return Q.boolean(
            should=should, must=must, must_not=must_not, boost=n.boost
        )
    raise AssertionError(n.kind)


def compile_query(
    s: str | Node,
    reader=None,
    field: str | None = None,
    default_operator: str = "or",
    max_expansions: int | None = None,
):
    """Compile a query string (or pre-parsed tree) to a booleanq.Q tree.

    Returns None for a query that provably matches nothing (e.g. a wildcard
    with zero dictionary expansions used as the whole query). reader=None
    compiles term/phrase/bool-only strings with no index at hand (multi-term
    leaves and `field:` prefixes then raise) — useful for oracle generation."""
    from cuvs_lucene_spark.multiterm import MAX_CLAUSE_COUNT

    node = parse_query(s, default_operator) if isinstance(s, str) else s
    fld = reader.resolve_field(field) if reader is not None else field
    q = _compile(
        node, reader, fld,
        MAX_CLAUSE_COUNT if max_expansions is None else max_expansions,
    )
    return None if q is _MATCH_NONE else q


def search_qstring(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    filter_cond: Column | str | None = None,
    reader=None,
    float32: bool = True,
    field: str | None = None,
    default_operator: str = "or",
    max_expansions: int | None = None,
) -> DataFrame:
    """Parse + execute a classic query string; returns (doc_id, score,
    conv_id, turn_idx) like search().

    One postings scan over the union of the compiled tree's terms regardless
    of string shape (the search_boolean cost envelope)."""
    from cuvs_lucene_spark.query import IndexReader

    rd = reader or IndexReader(spark, index_dir)
    q = compile_query(
        query, rd, field=field, default_operator=default_operator,
        max_expansions=max_expansions,
    )
    if q is None:
        out_t = "float" if float32 else "double"
        return spark.createDataFrame(
            [], f"doc_id long, score {out_t}, conv_id string, turn_idx int"
        )
    return search_boolean(
        spark, index_dir, q, k=k, filter_cond=filter_cond, reader=rd,
        float32=float32, field=field,
    )
