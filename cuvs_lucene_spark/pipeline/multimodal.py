"""Multimodal-column plumbing for training-data pipelines.

Treats image/audio/video as opaque ``binary`` payload columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` kernels. The actual
codec decode (PIL/libav/etc.) is NOT available in this environment, so the
decode step is stubbed two ways, clearly marked:

  * ``decode_asset(...)`` raises NotImplementedError — the production hook
    where a real decoder plugs in;
  * ``fake_decode_features(...)`` — a deterministic pure-arithmetic stand-in
    used by tests/benchmarks so the REAL parts (schema, partitioning, UDF
    signature, Arrow batch shape) are exercised end-to-end and are
    oracle-checkable in SQL.

Scale notes: payloads stay in executor memory only for the life of one Arrow
batch (`mapInPandas` streams); `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds batch bytes; feature extraction is embarrassingly parallel with no
shuffle — the only wide op a real pipeline adds is the write.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]

FEATURE_DIM = 4
_FP_MOD = 2_147_483_647

FEATURES_SCHEMA = "asset_id long, kind string, features array<double>"


def derive_assets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic synthetic asset table from the documents corpus:
    payload = utf-8 bytes of the text (an opaque blob as far as the pipeline
    is concerned), kind cycles by id, typed metadata struct alongside."""
    payload = F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]),
        (F.col(id_col) % len(KINDS)).cast("int") + 1,
    )
    return docs.select(
        F.col(id_col).alias("asset_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("synthetic/v1").alias("codec"),
        ).alias("meta"),
    )


def decode_asset(kind: str, payload: bytes):
    """Production decode hook — requires PIL / libsndfile / pyav, none of
    which exist in this container. Deliberately unimplemented."""
    raise NotImplementedError(
        f"real {kind} decoding needs a codec library not present in this "
        "environment; use fake_decode_features for plumbing tests"
    )


# descending powers of 31 mod p for one chunk: _POW31[-c:] = 31^(c-1) .. 31^0
_POLY_CHUNK = 4096
_POW31 = np.empty(_POLY_CHUNK, dtype=np.int64)
_POW31[-1] = 1
for _j in range(_POLY_CHUNK - 2, -1, -1):
    _POW31[_j] = (_POW31[_j + 1] * 31) % _FP_MOD


def _poly_hash_bytes(b: bytes) -> int:
    """h = Σ b_i·31^(n-1-i) mod p, vectorized: per 4 KiB chunk one numpy
    multiply-accumulate against precomputed powers (values stay < 2^51, no
    overflow), with Horner only ACROSS chunks — O(n/4096) Python steps
    instead of the previous per-byte pure-Python loop."""
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
    h = 0
    for i in range(0, len(arr), _POLY_CHUNK):
        chunk = arr[i:i + _POLY_CHUNK]
        c = len(chunk)
        part = int((chunk * _POW31[_POLY_CHUNK - c:] % _FP_MOD).sum() % _FP_MOD)
        h = (h * pow(31, c, _FP_MOD) + part) % _FP_MOD
    return h


def fake_decode_features(kind: str, payload: bytes) -> list[float]:
    """Deterministic arithmetic stand-in for decode→feature-extract:
    [n_bytes, first_byte, last_byte, poly_hash % 1000]. Chosen to be exactly
    reproducible in ANSI SQL so the Arrow plumbing has a value-level oracle."""
    n = len(payload)
    return [
        float(n),
        float(payload[0]) if n else 0.0,
        float(payload[-1]) if n else 0.0,
        float(_poly_hash_bytes(payload) % 1000),
    ]


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas kernel: (asset_id, kind, payload) → fixed-dim features.

    The kernel shape (iterator of pandas batches, vectorized inner loop over
    the batch) is exactly what a real decoder would use — swap
    fake_decode_features for decode_asset + model forward pass."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_decode_features(k, bytes(p))
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        kernel, FEATURES_SCHEMA
    )


def frame_sample(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' over the opaque payload: one row per sampled offset
    (for video kinds). Pure JVM expression — the point is the row-explosion
    plumbing (each frame row carries (asset_id, frame_idx, offset))."""
    n_frames = F.greatest(
        (F.col("meta.n_bytes") / every_n_bytes).cast("int"), F.lit(1)
    )
    return (
        assets.where(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
    )


# ---------------------------------------------------------------------------
# SQL twins
# ---------------------------------------------------------------------------

def features_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of derive_assets + extract_features (ASCII-safe corpus:
    byte values == character codes)."""
    txt = f"coalesce({text_col}, '')"
    kinds = ", ".join(f"'{k}'" for k in KINDS)
    poly = (
        f"coalesce(list_reduce(list_prepend(cast(0 AS bigint), "
        f"list_transform(split({txt}, ''), ch -> cast(ascii(ch) AS bigint))), "
        f"(a, b) -> (a*31 + b) % {_FP_MOD}), 0)"
    )
    return f"""
SELECT {id_col} AS asset_id,
       ([{kinds}])[cast({id_col} % 3 AS int) + 1] AS kind,
       [cast(length({txt}) AS double),
        CASE WHEN length({txt}) > 0 THEN cast(ascii(substr({txt}, 1, 1)) AS double) ELSE 0.0 END,
        CASE WHEN length({txt}) > 0 THEN cast(ascii(substr({txt}, length({txt}), 1)) AS double) ELSE 0.0 END,
        cast({poly} % 1000 AS double)] AS features
FROM {table}
"""


def frames_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    every_n_bytes: int = 64,
) -> str:
    """DuckDB twin of derive_assets + frame_sample (ASCII-safe corpus ⇒
    n_bytes == length(text); // matches Spark's truncating double→int cast
    for non-negative values)."""
    txt = f"coalesce({text_col}, '')"
    return f"""
WITH fr AS (
  SELECT {id_col} AS asset_id,
         unnest(range(0, greatest(length({txt}) // {every_n_bytes}, 1))) AS frame_idx
  FROM {table}
  WHERE cast({id_col} % 3 AS int) = 2
)
SELECT asset_id, frame_idx, frame_idx * {every_n_bytes} AS byte_offset FROM fr
"""
