"""PII detection and redaction for training-data pipelines.

Regex-based scrubbing of the classic structured-PII shapes (emails, IPv4
addresses, US-style phone numbers, SSN-shaped ids) — the pre-training
hygiene pass that runs alongside dedup/decontamination. Reference analogy:
like the tokenizer (SURVEY §2.7 L1), the value of this operator is a FIXED
shared contract — the same pattern inventory evaluated identically by the
engine and the oracle — not pattern sophistication (production systems swap
in their own inventory; the plumbing is what this module pins).

Scale shape: every operator is a pure JVM Column expression
(``regexp_extract_all`` / ``regexp_replace``) — whole-stage codegen, zero
Python, zero shuffle; runs at full scan speed over a 100 TB corpus exactly
like `pipeline/textstats.py`.

Pattern portability contract: patterns use only syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, non-capturing groups, ``\\b`` — no lookaround, no
backreferences. Parity is pinned by `TestPII` on adversarial strings and by
the ``pii_scrub`` gate's value-hash over redacted text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered inventory: redaction applies top-to-bottom (email first so its
# digits can't be re-matched as phone fragments; ssn before phone so the
# 3-2-4 shape isn't partially consumed). Counting is order-independent
# because it runs each pattern against the ORIGINAL text.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}

PII_TOKENS: dict[str, str] = {
    "email": "<EMAIL>",
    "ipv4": "<IP>",
    "ssn": "<SSN>",
    "phone": "<PHONE>",
}


def _count(col: Column, pattern: str) -> Column:
    # size(regexp_extract_all) rather than regexp_count: DuckDB has no
    # regexp_count, and len(regexp_extract_all) is the twin both share.
    return F.coalesce(
        F.array_size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))),
        F.lit(0),
    )


def with_pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-kind PII match counts: pii_email, pii_ipv4, pii_ssn,
    pii_phone, pii_total (all int, NULL text counts 0)."""
    c = F.col(text_col)
    out = docs
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(f"pii_{kind}", _count(c, pat))
    return out.withColumn(
        "pii_total",
        sum(F.col(f"pii_{k}") for k in PII_PATTERNS),  # type: ignore[arg-type]
    )


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Append ``out_col``: the text with every PII match replaced by its
    typed token (``<EMAIL>``/``<IP>``/``<SSN>``/``<PHONE>``), applied in the
    fixed inventory order. NULL text stays NULL."""
    c: Column = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, PII_TOKENS[kind])
    return docs.withColumn(out_col, c)


# -- DuckDB twins -----------------------------------------------------------

def pii_counts_sql(text: str) -> dict[str, str]:
    """Column-expression twins of with_pii_counts (DuckDB RE2)."""
    out = {
        f"pii_{kind}": (
            f"coalesce(len(regexp_extract_all({text}, '{pat}')), 0)"
        )
        for kind, pat in PII_PATTERNS.items()
    }
    out["pii_total"] = " + ".join(
        f"({e})" for e in (out[f"pii_{k}"] for k in PII_PATTERNS)
    )
    return out


def redact_sql(text: str) -> str:
    """Expression twin of redact_pii (DuckDB regexp_replace needs the 'g'
    flag to replace ALL matches; Spark replaces all by default)."""
    e = text
    for kind, pat in PII_PATTERNS.items():
        e = f"regexp_replace({e}, '{pat}', '{PII_TOKENS[kind]}', 'g')"
    return e


def synth_pii_text_sql(id_col: str = "doc_id", text_col: str = "text") -> str:
    """Deterministic PII-bearing text built from existing columns — shared
    verbatim by the Spark gate (via F.expr) and the DuckDB oracle, so both
    engines scrub the IDENTICAL string. Mixes per-row which kinds appear."""
    return (
        f"CASE WHEN {id_col} % 3 = 0 THEN 'contact user' || CAST({id_col} AS STRING)"
        f" || '@example.com ' ELSE '' END"
        f" || CASE WHEN {id_col} % 4 = 1 THEN 'from 10.0.' ||"
        f" CAST({id_col} % 256 AS STRING) || '.7 ' ELSE '' END"
        f" || CASE WHEN {id_col} % 5 = 2 THEN 'call 555-0' ||"
        f" substring(CAST(100 + {id_col} % 100 AS STRING), 2, 2) || '-'"
        f" || substring(CAST(10000 + {id_col} % 10000 AS STRING), 2, 4) || ' '"
        f" ELSE '' END"
        f" || CASE WHEN {id_col} % 7 = 3 THEN 'ssn 123-45-'"
        f" || substring(CAST(10000 + {id_col} % 10000 AS STRING), 2, 4) || ' '"
        f" ELSE '' END"
        f" || coalesce({text_col}, '')"
    )
