"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length/punct/stopword
ratios), token counting (analyzer tokens + a BPE-ish regex piece count), and
document fingerprinting (polynomial rolling hash).

All operators are pure JVM Column expressions (whole-stage codegen, no
Python) so they run at full scan speed over a 100 TB corpus, and every one
has an ANSI-SQL twin for the DuckDB oracle (same constants, same regexes).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cuvs_lucene_spark.analysis import tokenize_col

# BPE-ish pre-tokenizer: letter runs, single digits, or single non-space
# symbols — a crude stand-in for a byte-pair pre-tokenization pass.
BPE_PATTERN = "[a-z]+|[0-9]|[^a-z0-9\\s]"

# tiny per-language stopword inventories (public, high-frequency closed-class
# words); hit-ratio over analyzer tokens is the language score
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was",
           "with", "as", "his", "they", "at"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "por",
           "con", "una", "su", "para", "es"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une",
           "que", "est", "pour", "qui", "dans"],
    "de": ["der", "die", "und", "in", "den", "von", "zu", "das", "mit",
           "sich", "des", "auf", "ist", "im", "dem"],
}

# quality-score weights (fixed contract shared with the SQL oracle)
_Q_LEN_FLOOR, _Q_LEN_CEIL = 20, 2000


def _hits(tokens: Column, words: list[str]) -> Column:
    """Count tokens (with multiplicity) that appear in a fixed word list."""
    lit = F.array(*[F.lit(w) for w in words])
    return F.aggregate(
        F.filter(tokens, lambda t: F.array_contains(lit, t)),
        F.lit(0),
        lambda acc, _: acc + 1,
    )


def _hits_sql(toks: str, words: list[str]) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({toks}, t -> list_contains({lst}, t)))"


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_chars_norm / n_tokens (analyzer) / n_bpe_tokens (regex pieces)."""
    lower = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    return (
        docs.withColumn("n_chars_norm", F.length(lower))
        .withColumn(
            "n_tokens",
            F.coalesce(F.array_size(tokenize_col(text_col)), F.lit(0)),
        )
        .withColumn(
            "n_bpe_tokens",
            # pattern passed as a Column literal — F.expr would route it
            # through SQL string-literal parsing, which eats the \s escape
            F.size(F.regexp_extract_all(lower, F.lit(BPE_PATTERN), F.lit(0))),
        )
    )


def with_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features + a [0,1] score.

    score = 0.4·len_ok + 0.3·(1 − punct_ratio) + 0.3·stop_ratio_capped
    with len_ok = 1 iff n_tokens in [20, 2000]; punct_ratio over BPE pieces;
    stopword ratio capped at 0.5 then rescaled (all-language stopwords).
    """
    d = with_token_counts(docs, text_col)
    toks = tokenize_col(text_col)
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    punct = F.size(F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit("[^a-z0-9\\s]"), F.lit(0),
    ))
    d = (
        d.withColumn(
            "punct_ratio",
            F.when(F.col("n_bpe_tokens") > 0,
                   punct.cast("double") / F.col("n_bpe_tokens")).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stop_ratio",
            F.when(F.col("n_tokens") > 0,
                   _hits(toks, all_stops).cast("double") / F.col("n_tokens"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "len_ok",
            ((F.col("n_tokens") >= _Q_LEN_FLOOR)
             & (F.col("n_tokens") <= _Q_LEN_CEIL)).cast("int"),
        )
    )
    return d.withColumn(
        "quality",
        F.round(
            F.lit(0.4) * F.col("len_ok")
            + F.lit(0.3) * (F.lit(1.0) - F.least(F.col("punct_ratio"), F.lit(1.0)))
            + F.lit(0.3) * (F.least(F.col("stop_ratio"), F.lit(0.5)) / F.lit(0.5)),
            4,
        ),
    )


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Predict language by max stopword-hit ratio; 'und' when no hits.

    Deterministic tie-break: language-code ascending (de < en < es < fr).
    """
    toks = tokenize_col(text_col)
    d = docs.withColumn(
        "_nt", F.coalesce(F.array_size(toks), F.lit(0))
    )
    for lang in sorted(STOPWORDS):
        d = d.withColumn(
            f"score_{lang}",
            F.when(F.col("_nt") > 0,
                   F.round(_hits(toks, STOPWORDS[lang]).cast("double") / F.col("_nt"), 6))
            .otherwise(F.lit(0.0)),
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(STOPWORDS)])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in sorted(STOPWORDS):
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return d.withColumn("lang_pred", pred).drop("_nt")


# polynomial rolling-hash fingerprint over normalized chars, mod 2^31-1
# (Karp–Rabin; multiplier 31). 31·acc + code stays < 2^36 — no int64 overflow.
_FP_MOD = 2_147_483_647
_POW_SHIFT = 12  # pow tables split the exponent as (hi << 12) | lo

# per-worker memoized power tables: lo[b] = 31^b mod p (b < 4096),
# hi[a] = 31^(4096·a) mod p, extended on demand
_POW_CACHE: dict[str, "np.ndarray"] = {}


def _pow31(exp: "np.ndarray") -> "np.ndarray":
    """Vectorized 31^exp mod p via two memoized tables (both values < p, so
    their int64 product < 2^62 — no overflow)."""
    import numpy as np

    if "lo" not in _POW_CACHE:
        lo = np.empty(1 << _POW_SHIFT, dtype=np.int64)
        v = 1
        for i in range(len(lo)):
            lo[i] = v
            v = (v * 31) % _FP_MOD
        _POW_CACHE["lo"] = lo
        _POW_CACHE["hi"] = np.array([1], dtype=np.int64)
    need = int(exp.max()) >> _POW_SHIFT
    hi = _POW_CACHE["hi"]
    if need >= len(hi):
        step = pow(31, 1 << _POW_SHIFT, _FP_MOD)
        ext = np.empty(need + 1, dtype=np.int64)
        ext[: len(hi)] = hi
        v = int(hi[-1])
        for i in range(len(hi), need + 1):
            v = (v * step) % _FP_MOD
            ext[i] = v
        hi = _POW_CACHE["hi"] = ext
    return (hi[exp >> _POW_SHIFT] * _POW_CACHE["lo"][exp & ((1 << _POW_SHIFT) - 1)]) % _FP_MOD


def with_fingerprint(
    docs: DataFrame, text_col: str = "text", impl: str = "arrow"
) -> DataFrame:
    """h = Σ code_i·31^(n-1-i) mod p over lower(text) codepoints (≡ the
    left fold (acc·31 + code) % p; empty/NULL → 0).

    impl='arrow' (default): Arrow-batched numpy kernel — one utf-32 decode of
    the whole batch, vectorized power/multiply/prefix-sum, no per-char work
    in any interpreter. impl='expr': the Catalyst higher-order-aggregate
    twin — same values, kept as the pure-JVM-plan reference.
    """
    if impl == "expr":
        chars = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), "")
        return docs.withColumn(
            "fingerprint",
            F.aggregate(
                chars,
                F.lit(0).cast("long"),
                lambda acc, ch: (acc * 31 + F.ascii(ch)) % _FP_MOD,
            ),
        )

    @F.pandas_udf("long")
    def fp(col: pd.Series) -> pd.Series:
        import numpy as np

        lowered = [(x or "").lower() for x in col]
        lens = np.fromiter(
            (len(x) for x in lowered), dtype=np.int64, count=len(lowered)
        )
        total = int(lens.sum())
        if total == 0:
            return pd.Series(np.zeros(len(lowered), dtype=np.int64))
        codes = np.frombuffer(
            "".join(lowered).encode("utf-32-le"), dtype="<u4"
        ).astype(np.int64)
        off = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        # char's exponent = (its doc's end offset - 1) - its global position
        exp = np.repeat(off[1:], lens) - 1 - np.arange(total, dtype=np.int64)
        terms = (codes * _pow31(exp)) % _FP_MOD  # codes < 2^21, pow < 2^31
        csum = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(terms, out=csum[1:])  # < batch_chars·2^31 ≪ 2^63
        return pd.Series((csum[off[1:]] - csum[off[:-1]]) % _FP_MOD)

    return docs.withColumn("fingerprint", fp(F.col(text_col)))


# ---------------------------------------------------------------------------
# SQL twins (DuckDB oracle fragments) — same constants, same regexes
# ---------------------------------------------------------------------------

def token_counts_sql(text: str) -> dict[str, str]:
    toks = f"list_filter(regexp_split_to_array(lower(coalesce({text},'')), '[^a-z0-9]+'), t -> t <> '')"
    return {
        "n_chars_norm": f"length(lower(coalesce({text},'')))",
        "n_tokens": f"len({toks})",
        "n_bpe_tokens": f"len(regexp_extract_all(lower(coalesce({text},'')), '{BPE_PATTERN}'))",
    }


def quality_sql(text: str) -> dict[str, str]:
    c = token_counts_sql(text)
    toks = f"list_filter(regexp_split_to_array(lower(coalesce({text},'')), '[^a-z0-9]+'), t -> t <> '')"
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    punct = f"len(regexp_extract_all(lower(coalesce({text},'')), '[^a-z0-9\\s]'))"
    punct_ratio = (
        f"CASE WHEN {c['n_bpe_tokens']} > 0 THEN "
        f"cast({punct} AS double)/{c['n_bpe_tokens']} ELSE 0.0 END"
    )
    stop_ratio = (
        f"CASE WHEN {c['n_tokens']} > 0 THEN "
        f"cast({_hits_sql(toks, all_stops)} AS double)/{c['n_tokens']} ELSE 0.0 END"
    )
    len_ok = (
        f"CASE WHEN {c['n_tokens']} BETWEEN {_Q_LEN_FLOOR} AND {_Q_LEN_CEIL} "
        f"THEN 1 ELSE 0 END"
    )
    return {
        **c,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "len_ok": len_ok,
        "quality": (
            f"round(0.4*({len_ok}) + 0.3*(1.0 - least({punct_ratio}, 1.0)) "
            f"+ 0.3*(least({stop_ratio}, 0.5)/0.5), 4)"
        ),
    }


def lang_scores_sql(text: str) -> dict[str, str]:
    toks = f"list_filter(regexp_split_to_array(lower(coalesce({text},'')), '[^a-z0-9]+'), t -> t <> '')"
    nt = f"len({toks})"
    out = {}
    for lang in sorted(STOPWORDS):
        out[f"score_{lang}"] = (
            f"CASE WHEN {nt} > 0 THEN "
            f"round(cast({_hits_sql(toks, STOPWORDS[lang])} AS double)/{nt}, 6) "
            f"ELSE 0.0 END"
        )
    best = "greatest(" + ", ".join(out.values()) + ")"
    pred = f"CASE WHEN {best} <= 0 THEN 'und' "
    for lang in sorted(STOPWORDS):
        pred += f"WHEN {out[f'score_{lang}']} = {best} THEN '{lang}' "
    pred += "END"
    out["lang_pred"] = pred
    return out


def fingerprint_sql(text: str) -> str:
    return (
        f"coalesce(list_reduce(list_prepend(cast(0 AS bigint), "
        f"list_transform(split(lower(coalesce({text},'')), ''), "
        f"ch -> cast(ascii(ch) AS bigint))), "
        f"(a, b) -> (a*31 + b) % {_FP_MOD}), 0)"
    )


# ---------------------------------------------------------------------------
# Repetition signals (Gopher §A1.1 / C4-style quality rules, from the
# published descriptions): duplicate-line fraction, duplicate n-gram window
# fractions, top-bigram dominance. The canonical "document is degenerate
# boilerplate" detectors of a pretraining filter stack.
# ---------------------------------------------------------------------------

_TRIM_CHARS = " \t\r"


def _round6_half_up(x):
    """Half-up rounding to 6 places — matches Spark F.round / DuckDB round
    for the non-negative ratios produced here (numpy's default would bank)."""
    import numpy as np

    return np.floor(x * 1e6 + 0.5) / 1e6


def with_repetition(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition report:
      (id, n_lines, frac_dup_lines, frac_dup_bigram, frac_top_bigram,
       frac_dup_5gram)
    where frac_dup_lines = 1 - distinct/total over trimmed non-empty lines,
    frac_dup_{n}gram = 1 - distinct/total over word n-gram WINDOWS, and
    frac_top_bigram = occurrences of the most frequent bigram / windows
    (all 0.0 when the doc has no lines/windows; NULL text = empty).

    ONE fully-vectorized Arrow pass (the `_shingle_rows` machinery shape):
    tokens stay dictionary-encoded; every per-doc statistic is an np.unique
    / bincount segment reduction — no per-doc Python. Narrow scan, no
    shuffle: at 100 TB this runs at tokenizer speed like the rest of the
    textstats family.
    """
    from cuvs_lucene_spark.analysis import TOKEN_PATTERN

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        def per_doc_window_stats(codes, doc_of, n, n_docs):
            """(total, distinct, top_count) int64 arrays per doc for word
            n-gram windows (dictionary codes, flat across the batch)."""
            total = np.zeros(n_docs, dtype=np.int64)
            dist = np.zeros(n_docs, dtype=np.int64)
            top = np.zeros(n_docs, dtype=np.int64)
            g = codes.size - n + 1
            if g <= 0:
                return total, dist, top
            valid = doc_of[:g] == doc_of[n - 1:]
            if not valid.any():
                return total, dist, top
            rows = np.empty((int(valid.sum()), n + 1), dtype=np.int64)
            rows[:, 0] = doc_of[:g][valid]
            for i in range(n):
                rows[:, i + 1] = codes[i: i + g][valid]
            np.add.at(total, rows[:, 0], 1)
            v = np.ascontiguousarray(rows).view(
                np.dtype((np.void, rows.dtype.itemsize * rows.shape[1]))
            ).ravel()
            _, first, counts = np.unique(v, return_index=True, return_counts=True)
            udoc = rows[first, 0]
            np.add.at(dist, udoc, 1)
            np.maximum.at(top, udoc, counts)
            return total, dist, top

        def frac(num, den):
            out = np.zeros(den.shape, dtype=np.float64)
            nz = den > 0
            out[nz] = _round6_half_up(num[nz] / den[nz])
            return out

        for pdf in batches:
            if not len(pdf):
                continue
            n_docs = len(pdf)
            ids = pdf[id_col].to_numpy().astype(np.int64)
            texts = pa.array(pdf[text_col], type=pa.string(), from_pandas=True)

            # -- lines ------------------------------------------------------
            line_list = pc.split_pattern(
                pc.fill_null(texts, ""), pattern="\n"
            )
            ln = pc.list_value_length(line_list).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            ldoc = np.repeat(np.arange(n_docs, dtype=np.int64), ln)
            flat_lines = pc.utf8_trim(
                pc.list_flatten(line_list), characters=_TRIM_CHARS
            )
            keep = pc.not_equal(flat_lines, "").to_numpy(
                zero_copy_only=False
            ).astype(bool)
            ldoc = ldoc[keep]
            lcodes = pc.dictionary_encode(
                flat_lines.filter(pa.array(keep))
            ).indices.to_numpy(zero_copy_only=False).astype(np.int64)
            n_lines = np.zeros(n_docs, dtype=np.int64)
            np.add.at(n_lines, ldoc, 1)
            dist_lines = np.zeros(n_docs, dtype=np.int64)
            if ldoc.size:
                pair = ldoc * (lcodes.max() + 1) + lcodes
                _, first = np.unique(pair, return_index=True)
                np.add.at(dist_lines, ldoc[first], 1)

            # -- token windows ---------------------------------------------
            tok_list = pc.split_pattern_regex(pc.utf8_lower(texts), TOKEN_PATTERN)
            n_tok = pc.fill_null(pc.list_value_length(tok_list), 0)
            n_tok = n_tok.to_numpy(zero_copy_only=False).astype(np.int64)
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_tok)
            flat = pc.list_flatten(tok_list)
            tkeep = pc.not_equal(flat, "").to_numpy(
                zero_copy_only=False
            ).astype(bool)
            doc_of = doc_of[tkeep]
            codes = pc.dictionary_encode(
                flat.filter(pa.array(tkeep))
            ).indices.to_numpy(zero_copy_only=False).astype(np.int64)

            t2, d2, top2 = per_doc_window_stats(codes, doc_of, 2, n_docs)
            t5, d5, _ = per_doc_window_stats(codes, doc_of, 5, n_docs)

            yield pd.DataFrame({
                "id": ids,
                "n_lines": n_lines,
                "frac_dup_lines": frac(n_lines - dist_lines, n_lines),
                "frac_dup_bigram": frac(t2 - d2, t2),
                "frac_top_bigram": frac(top2, t2),
                "frac_dup_5gram": frac(t5 - d5, t5),
            })

    out = docs.select(id_col, text_col).mapInPandas(
        kernel,
        "id long, n_lines long, frac_dup_lines double, frac_dup_bigram double,"
        " frac_top_bigram double, frac_dup_5gram double",
    )
    return out.withColumnRenamed("id", id_col)


def repetition_report_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of with_repetition (full query, ORDER BY id)."""
    toks = (
        f"list_filter(regexp_split_to_array(lower(coalesce({text_col},'')),"
        f" '[^a-z0-9]+'), t -> t <> '')"
    )
    trim = "' ' || chr(9) || chr(13)"

    def grams(n: int) -> str:
        return (
            f"CASE WHEN len(toks) >= {n} THEN "
            f"list_transform(range(1, len(toks) - {n} + 2), "
            f"i -> array_to_string(toks[i:i+{n - 1}], ' ')) "
            f"ELSE [] END"
        )

    return f"""
WITH base AS (
  SELECT {id_col} AS id, {toks} AS toks,
         list_filter(
           list_transform(string_split(coalesce({text_col},''), chr(10)),
                          s -> trim(s, {trim})),
           s -> s <> '') AS lines
  FROM {table}
),
g AS (SELECT id, {grams(2)} AS g2, {grams(5)} AS g5, lines FROM base),
u2 AS (SELECT id, gx, count(*) AS c
       FROM (SELECT id, unnest(g2) AS gx FROM g) GROUP BY id, gx),
a2 AS (SELECT id, sum(c) AS total, count(*) AS dist, max(c) AS top
       FROM u2 GROUP BY id),
u5 AS (SELECT id, gx, count(*) AS c
       FROM (SELECT id, unnest(g5) AS gx FROM g) GROUP BY id, gx),
a5 AS (SELECT id, sum(c) AS total, count(*) AS dist FROM u5 GROUP BY id)
SELECT g.id AS {id_col},
       CAST(len(g.lines) AS BIGINT) AS n_lines,
       CASE WHEN len(g.lines) > 0 THEN
         round(1.0 - CAST(len(list_distinct(g.lines)) AS DOUBLE)/len(g.lines), 6)
       ELSE 0.0 END AS frac_dup_lines,
       coalesce(round((a2.total - a2.dist) / CAST(a2.total AS DOUBLE), 6), 0.0)
         AS frac_dup_bigram,
       coalesce(round(a2.top / CAST(a2.total AS DOUBLE), 6), 0.0)
         AS frac_top_bigram,
       coalesce(round((a5.total - a5.dist) / CAST(a5.total AS DOUBLE), 6), 0.0)
         AS frac_dup_5gram
FROM g LEFT JOIN a2 USING (id) LEFT JOIN a5 USING (id)
ORDER BY {id_col}
"""


def repetition_filter(
    docs: DataFrame,
    max_dup_lines: float = 0.30,
    max_top_bigram: float = 0.20,
    max_dup_5gram: float = 0.15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop degenerate-repetition docs (Gopher-style thresholds, from the
    published rule shapes; tune per corpus). Anti-joins the tiny flagged-id
    set back onto the source rows."""
    rep = with_repetition(docs, id_col, text_col)
    bad = rep.where(
        (F.col("frac_dup_lines") > max_dup_lines)
        | (F.col("frac_top_bigram") > max_top_bigram)
        | (F.col("frac_dup_5gram") > max_dup_5gram)
    ).select(id_col)
    return docs.join(F.broadcast(bad), id_col, "left_anti")
