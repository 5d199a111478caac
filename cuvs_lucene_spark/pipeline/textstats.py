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
