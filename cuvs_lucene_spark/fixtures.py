"""Deterministic synthetic transcript corpus + reference query set.

Implements FIXTURES.md exactly: seed=42, Zipf(s=1.1) vocabulary of 50k words
with a 200-word hot head, 2-40 turns/conv with 1% long-tail 10x convs and one
mega conversation, ~1% empty / ~0.5% NULL texts (sparse-field tests, cf.
reference gap tests ``TestCuVSGaps.java:93-104``). Generation is pure numpy →
pyarrow parquet; no external data. Prefix-stable: the first N conversations
of a bigger tier equal the smaller tier.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
VOCAB_SIZE = 50_000
HOT_HEAD = [
    # 200 realistic hot words (deterministic list, not sampled)
    *(
        "the be to of and a in that have i it for not on with he as you do at "
        "this but his by from they we say her she or an will my one all would "
        "there their what so up out if about who get which go me when make can "
        "like time no just him know take people into year your good some could "
        "them see other than then now look only come its over think also back "
        "after use two how our work first well way even new want because any "
        "these give day most us is was are been has had were said did having "
        "may should am call world school still try last ask need too feel "
        "three state never become between high really something most another "
        "much family own leave put old while mean keep student great same big "
        "group begin seem country help talk where turn problem every start "
        "hand might show part against place such again few case week company "
        "system each right program hear question during play government run "
        "small number off always move night live point believe hold today "
        "bring happen next without before large million must home under water "
        "room write mother area national money story young fact month lot "
        "study book eye job word though business issue side kind four head far "
        "black both long both".split()
    ),
][:200]

TOOLS = [
    "search", "browser", "bash", "python", "calculator", "editor",
    "retrieval", "sql", "email", "calendar", "maps", "weather",
]

TIERS = {"tiny": 200, "small": 5_000, "bench": 50_000, "bench4": 200_000}

EPOCH_2026 = np.datetime64("2026-01-01T00:00:00")


def _vocab() -> np.ndarray:
    tail = np.array([f"w{r:05d}" for r in range(len(HOT_HEAD), VOCAB_SIZE)])
    return np.concatenate([np.array(HOT_HEAD, dtype=tail.dtype), tail])


def generate_transcripts(n_convs: int, seed: int = SEED) -> pa.Table:
    """Generate the transcripts table: (conv_id, turn_idx, role, text, tool, ts)."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()

    # turns per conversation: 2..40; 1% of convs 10x longer; conv 0 is "mega"
    turns = rng.integers(2, 41, size=n_convs)
    long_mask = rng.random(n_convs) < 0.01
    turns = np.where(long_mask, turns * 10, turns)
    if n_convs >= 1000:
        turns[0] = 2000  # mega conversation (partition-skew feature)
    turns = turns.astype(np.int64)
    total = int(turns.sum())

    conv_idx = np.repeat(np.arange(n_convs), turns)
    turn_idx = (np.arange(total) - np.repeat(np.cumsum(turns) - turns, turns)).astype(np.int32)

    # roles: user/assistant alternating, 10% seeded tool insertions
    role = np.where(turn_idx % 2 == 0, "user", "assistant")
    tool_mask = rng.random(total) < 0.10
    role = np.where(tool_mask, "tool", role)
    tool = np.where(tool_mask, np.array(TOOLS)[rng.integers(0, len(TOOLS), total)], None)

    # text: 20..200 Zipf(1.1) tokens; 1% empty, 0.5% NULL
    n_tok = rng.integers(20, 201, size=total)
    offsets = np.concatenate([[0], np.cumsum(n_tok)])
    all_ranks = rng.zipf(1.1, size=int(offsets[-1]))
    all_ranks = np.minimum(all_ranks, VOCAB_SIZE) - 1  # 0-based rank, clipped
    words = vocab[all_ranks]
    texts: list[str | None] = [
        " ".join(words[offsets[i]: offsets[i + 1]]) for i in range(total)
    ]
    empty_mask = rng.random(total) < 0.01
    null_mask = rng.random(total) < 0.005
    for i in np.flatnonzero(empty_mask):
        texts[i] = ""
    for i in np.flatnonzero(null_mask):
        texts[i] = None

    conv_id = np.char.add("conv-", np.char.zfill(conv_idx.astype("U8"), 8))
    conv_offset_s = conv_idx.astype("int64") * 3600  # 1h between conv starts
    ts = EPOCH_2026 + (conv_offset_s + 7 * turn_idx.astype("int64")).astype("timedelta64[s]")

    return pa.table(
        {
            "conv_id": pa.array(conv_id),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tool.tolist(), type=pa.string()),
            "ts": pa.array(ts.astype("datetime64[us]")),
        }
    )


def corpus_path(tier: str, root: str = "/root/repo/data") -> str:
    return os.path.join(root, f"transcripts_{tier}.parquet")


def ensure_corpus(tier: str, root: str = "/root/repo/data") -> str:
    """Generate-once cache of a tier's parquet file; returns path."""
    path = corpus_path(tier, root)
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        tbl = generate_transcripts(TIERS[tier])
        # small row groups so a single-file corpus still splits into enough
        # scan tasks to parallelize the read (default ~1M-row groups would
        # cap read parallelism at 1-2 tasks regardless of cores)
        pq.write_table(tbl, path, row_group_size=50_000)
    return path


# ---------------------------------------------------------------------------
# Reference query set (FIXTURES.md §3): 60 frozen queries, k=10 default.
# Built deterministically FROM the corpus dictionary so df-band constraints
# hold at any tier.
# ---------------------------------------------------------------------------

def build_query_set(term_df: dict[str, int], n_docs: int, seed: int = SEED) -> list[dict]:
    rng = np.random.default_rng(seed + 1)
    terms = np.array(sorted(term_df))
    dfs = np.array([term_df[t] for t in terms])

    def sample(mask: np.ndarray, n: int) -> list[str]:
        cand = terms[mask]
        if len(cand) == 0:
            return []
        idx = rng.choice(len(cand), size=min(n, len(cand)), replace=False)
        return [str(c) for c in cand[idx]]

    queries: list[dict] = []
    rare = sample((dfs >= 1) & (dfs <= 20), 10)
    for i, t in enumerate(rare):
        queries.append({"qid": f"rare-{i}", "text": t, "k": 10, "mode": "or"})
    hot = sample(dfs > 0.10 * n_docs, 10)
    for i, t in enumerate(hot):
        queries.append({"qid": f"hot-{i}", "text": t, "k": 10, "mode": "or"})
    for i in range(15):
        n = int(rng.integers(3, 7))
        qt = sample(dfs >= 1, n)
        queries.append({"qid": f"or-{i}", "text": " ".join(qt), "k": 10, "mode": "or"})
    for i in range(10):
        n = int(rng.integers(2, 4))
        qt = sample(dfs >= max(2, n_docs // 100), n)
        queries.append({"qid": f"and-{i}", "text": " ".join(qt), "k": 10, "mode": "and"})
    for i in range(10):
        qt = sample(dfs >= 1, int(rng.integers(3, 6)))
        filt = "role = 'user'" if i % 2 == 0 else "ts_range"
        queries.append(
            {"qid": f"filt-{i}", "text": " ".join(qt), "k": 10, "mode": "or", "filter": filt}
        )
    queries += [
        {"qid": "degen-absent", "text": "zzzzabsenttermzzzz", "k": 10, "mode": "or"},
        {"qid": "degen-empty", "text": "", "k": 10, "mode": "or"},
        {"qid": "degen-k0", "text": hot[0] if hot else "the", "k": 0, "mode": "or"},
        {"qid": "degen-bigk", "text": rare[0] if rare else "the", "k": 10_000_000, "mode": "or"},
        {"qid": "degen-mixed", "text": (hot[0] if hot else "the") + " zzzzabsenttermzzzz", "k": 10, "mode": "or"},
    ]
    return queries
