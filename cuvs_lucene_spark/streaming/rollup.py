"""Streaming rollups over the transcript feed: watermarked windowed term
counts and a custom stateful per-conversation accumulator.

The reference is batch-only (SURVEY.md §1.2), so these are beyond-reference
pipeline operators: the continuous-ingest analogs of the dictionary/stats
tables the batch build materializes (`operators/build.py` meta rows). Both
run entirely on Structured Streaming's incremental engine:

- `windowed_term_counts` — tokenize (the same JVM `tokenize_col` expression
  the index build pins) → explode → event-time window + watermark →
  streaming aggregation. In append mode a window emits exactly once, when
  the watermark passes its end; rows later than the watermark are DROPPED —
  the discipline that bounds state at 10^12-turn scale (state size is
  O(open windows × terms), never O(stream)).
- `conversation_state` — applyInPandasWithState: per-conv running
  (n_turns, n_tokens, max_turn_idx, last_ts), emitted each micro-batch in
  update mode. The state value is a fixed-width tuple, so executor state
  store size is O(active conversations), and the Arrow-batched handler
  vectorizes over every conv in the micro-batch partition (no per-row
  Python).

Scale notes: both shuffles hash on (window, term) / conv_id — the same keys
the batch jobs use, so skew handling (hot terms) inherits the AQE backstop;
tokenize+explode is map-side. File/Kafka source partitioning flows straight
through to the stateful exchange.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cuvs_lucene_spark.analysis import tokenize_col


def windowed_term_counts(
    stream_df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming (window_start, window_end, term, cnt): term occurrences per
    event-time tumbling window, late data bounded by `watermark`.

    Returns the unsunk streaming aggregation; sink it in append mode so each
    window emits exactly once when finalized (`rollup_to_parquet`), or
    update mode for a live dashboard table.
    """
    # watermarks require instant-typed event time; transcripts carry ts as
    # TIMESTAMP_NTZ, so normalize first (session tz interpretation)
    src = stream_df.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    toks = src.withWatermark("__ts", watermark).select(
        "__ts",
        F.explode(tokenize_col(F.col(text_col))).alias("term"),
    )
    win = F.window(F.col("__ts"), window)
    return (
        toks.groupBy(win.alias("w"), "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "term",
            "cnt",
        )
    )


def rollup_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Start the append-mode windowed rollup into a parquet sink. Append mode
    + watermark = exactly-once finalized windows; the trailing (not yet
    finalized) windows stay in state until a later run's watermark passes
    them — `availableNow` batch-drain runs therefore emit only windows ending
    ≤ max(event_time) − watermark, which is also what the tests assert."""
    agg = windowed_term_counts(stream_df, window, watermark, ts_col, text_col)
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


_CONV_STATE_SCHEMA = "n_turns long, n_tokens long, max_turn_idx long, last_ts timestamp"
_CONV_OUT_SCHEMA = (
    "conv_id string, n_turns long, n_tokens long, max_turn_idx long, last_ts timestamp"
)


def _conv_update(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful handler: fold this micro-batch's turns for one conv into the
    running tuple. Vectorized per Arrow batch — token counting reuses the
    analyzer's token definition via a regex count, not per-row Python."""
    n_turns, n_tokens, max_turn, last_ts = (
        state.get if state.exists else (0, 0, -1, None)
    )
    for pdf in pdfs:
        if not len(pdf):
            continue
        n_turns += len(pdf)
        # [a-z0-9]+ runs on the lowered text == analysis.TOKEN_PATTERN tokens
        n_tokens += int(
            pdf["text"].fillna("").str.lower().str.count(r"[a-z0-9]+").sum()
        )
        max_turn = max(max_turn, int(pdf["turn_idx"].max()))
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((n_turns, n_tokens, max_turn, last_ts))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "n_tokens": [n_tokens],
            "max_turn_idx": [max_turn],
            "last_ts": [last_ts],
        }
    )


def conversation_state(stream_df: DataFrame) -> DataFrame:
    """Streaming per-conversation running state via applyInPandasWithState:
    (conv_id, n_turns, n_tokens, max_turn_idx, last_ts), re-emitted whenever
    a micro-batch touches the conversation. Update-mode sink recommended."""
    return (
        stream_df.select("conv_id", "turn_idx", "text", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _conv_update,
            outputStructType=_CONV_OUT_SCHEMA,
            stateStructType=_CONV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Conversation sessionization — event-time session windows
# ---------------------------------------------------------------------------

def conversation_sessions(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming sessionization: one row per (conversation, session), where a
    session is a maximal run of turns with inter-turn gaps < ``gap``
    (``F.session_window`` — session end = last event + gap, the Spark/Flink
    session-window definition). Emits (key, session_start, session_end,
    n_turns, n_tokens); n_tokens uses the index's pinned tokenizer so
    session budgets line up with the engine's dl accounting.

    Scale shape: sessionization state is O(OPEN sessions) — the watermark
    closes sessions ``watermark`` past their last event and frees their
    state, which is what keeps a 10^12-turn feed bounded. One shuffle, on
    the session key (same key the batch pipeline uses; AQE backstops skew).
    Works identically on a batch DataFrame (no watermark needed) — the
    streaming/batch twin property the equivalence test pins.
    """
    src = stream_df.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    if stream_df.isStreaming:
        src = src.withWatermark("__ts", watermark)
    return (
        src.groupBy(
            F.session_window(F.col("__ts"), gap).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(
                F.coalesce(
                    F.array_size(tokenize_col(F.col(text_col))), F.lit(0)
                )
            ).alias("n_tokens"),
        )
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col("n_turns").cast("long").alias("n_turns"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
    )


def sessions_to_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    trigger_available_now: bool = True,
):
    """Append-mode session sink: a session emits exactly once, when the
    watermark passes its end (same exactly-once discipline as
    `rollup_to_parquet`)."""
    agg = conversation_sessions(stream_df, gap, watermark)
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming exact dedup — the continuous-ingest sibling of pipeline/dedup.py
# ---------------------------------------------------------------------------

def stream_exact_dedup(
    stream_df: DataFrame,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    watermark: str = "2 hours",
    ts_col: str = "ts",
    by_content: bool = False,
    text_col: str = "text",
) -> DataFrame:
    """Drop duplicate rows from a stream: the first arrival of a key wins,
    later arrivals within the watermark delay are discarded
    (``dropDuplicatesWithinWatermark`` — state per key is freed once the
    watermark passes it, which is what bounds dedup state on an unbounded
    feed; two duplicates farther apart than the watermark may BOTH emit,
    the documented at-least-once-per-watermark-window contract).

    by_content=True dedups on md5(text) instead of the key columns — the
    streaming twin of `pipeline/dedup.exact_duplicates` (retried producers /
    re-delivered batches collapse to one row regardless of their keys).
    """
    src = stream_df.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    src = src.withWatermark("__ts", watermark)
    if by_content:
        src = src.withColumn(
            "__k", F.md5(F.coalesce(F.col(text_col), F.lit("")))
        )
        return src.dropDuplicatesWithinWatermark(["__k"]).drop("__k", "__ts")
    return src.dropDuplicatesWithinWatermark(list(key_cols)).drop("__ts")
