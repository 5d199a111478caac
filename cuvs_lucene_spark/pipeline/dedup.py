"""Deduplication operators for training-data pipelines.

Five families, each with a DuckDB-SQL twin for the oracle gate:

  * exact            — md5-of-normalized-text groupBy (one shuffle on a
                       16-byte key, never on raw text)
  * n-gram Jaccard   — EXACT near-dup pairs: docs sharing ≥1 word-shingle are
                       the only candidates (Jaccard > 0 ⇒ shared shingle), so
                       the shared-shingle self-join + exact Jaccard filter is
                       both complete and distributed
  * MinHash + LSH    — signature sketch → banded bucketing → candidate pairs
                       → exact-Jaccard verification
  * SimHash          — 32-bit fingerprint; banded exact search: for hamming
                       distance ≤ d and B > d bands, a matching band is
                       guaranteed (pigeonhole), so the band join is lossless
  * embedding cosine — see pipeline/similarity.py

Portability contract: every hash used in a correctness-gated path is defined
arithmetically ((a·x + b) mod p over CONTENT-hashed shingle ids — the md5
hex-prefix, computable bit-identically in Spark and DuckDB) so the oracle
reproduces it with no shared dictionary. Nothing in the gated path performs
a global sort or builds global state: feature extraction is one codegen'd
scan at any corpus size. hash_mode='xxhash' swaps in the cheaper JVM hash
for production runs where oracle parity is not needed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cuvs_lucene_spark.analysis import tokenize_col

MERSENNE_P = 2_147_483_647  # 2^31 - 1
SIMHASH_BITS = 32


def hash_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for (a·x + b) mod p; shared with the SQL twin."""
    rng = np.random.RandomState(seed)
    return [
        (int(rng.randint(1, MERSENNE_P)), int(rng.randint(0, MERSENNE_P)))
        for _ in range(n_hashes)
    ]


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rows belonging to exact-duplicate groups (normalized text equality).

    Returns (id, canonical_id, group_size): canonical = min id per group.
    Shuffles on md5(normalized) — constant-width key regardless of doc size.
    """
    norm = F.md5(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))))
    d = docs.select(F.col(id_col).alias("id"), norm.alias("h"))
    groups = (
        d.groupBy("h")
        .agg(F.min("id").alias("canonical_id"), F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") > 1)
    )
    return (
        d.join(groups, "h")
        .select("id", "canonical_id", "group_size")
    )


def exact_duplicates_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    return f"""
WITH d AS (
  SELECT {id_col} AS id, md5(lower(trim(coalesce({text_col}, '')))) AS h FROM {table}
),
g AS (
  SELECT h, min(id) AS canonical_id, count(*) AS group_size
  FROM d GROUP BY h HAVING count(*) > 1
)
SELECT d.id AS id, g.canonical_id AS canonical_id, g.group_size AS group_size
FROM d JOIN g USING (h)
"""


# ---------------------------------------------------------------------------
# word shingles
# ---------------------------------------------------------------------------

def shingles_col(text_col: str, n: int) -> Column:
    """DISTINCT word n-grams of the analyzer token stream (array<string>).

    Docs with fewer than n tokens yield an empty array (guarded explicitly:
    sequence(1, 0) would count DOWN in Spark and feed slice() a 0 start).
    """
    toks = tokenize_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.array_size(toks) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(
        F.coalesce(F.array_size(toks), F.lit(0)) >= n, F.array_distinct(grams)
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(text_col: str, n: int) -> str:
    toks = (
        f"list_filter(regexp_split_to_array(lower(coalesce({text_col},'')),"
        f" '[^a-z0-9]+'), t -> t <> '')"
    )
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks}) - {n} + 1, 0) + 1), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')))"
    )


def _shingle_rows(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, sh) rows — one per DISTINCT word n-gram per doc (ids cast long).

    Arrow-batched kernel, not the `shingles_col` Catalyst expression: the
    higher-order transform/slice tree is interpreted per token position
    (~1 ms/doc) and gets re-evaluated under every self-join branch, which
    made shingle extraction the dominant cost of the whole dedup family.
    Tokenization here is the same Arrow C++ lower→regex-split the index
    flush kernel uses, byte-identical to `tokenize_col`/`tokenize_sql`.

    Fully vectorized — no per-doc Python (input_hint contract): tokens stay
    dictionary-encoded in Arrow; n-gram candidates are n shifted views of the
    flat code array (a window is a gram iff it lies inside one doc); the
    per-doc DISTINCT is one np.unique over (doc, code_0..code_{n-1}) rows;
    shingle STRINGS are materialized only for the unique grams (Arrow
    binary_join_element_wise over dictionary takes) — the md5/join key the
    downstream operators and the SQL oracle share.
    """
    from cuvs_lucene_spark.analysis import TOKEN_PATTERN

    def kernel(batches):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        empty = pd.DataFrame(
            {"id": np.array([], dtype=np.int64), "sh": pd.Series([], dtype=str)}
        )
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy().astype(np.int64)
            texts = pa.array(pdf[text_col], type=pa.string(), from_pandas=True)
            tok_list = pc.split_pattern_regex(pc.utf8_lower(texts), TOKEN_PATTERN)
            # tokens per doc (NULL text → 0), doc index of every flat token
            n_tok = pc.fill_null(pc.list_value_length(tok_list), 0)
            n_tok = n_tok.to_numpy(zero_copy_only=False).astype(np.int64)
            doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), n_tok)
            flat = pc.list_flatten(tok_list)
            # drop the empty strings regex-split leaves at text boundaries
            keep = pc.not_equal(flat, "")
            keep_np = keep.to_numpy(zero_copy_only=False).astype(bool)
            d = doc_of[keep_np]
            if d.size < n:
                yield empty
                continue
            enc = flat.filter(keep).dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = enc.dictionary
            g = codes.size - n + 1
            valid = d[:g] == d[n - 1 :]  # window fully inside one doc
            if not valid.any():
                yield empty
                continue
            rows = np.empty((int(valid.sum()), n + 1), dtype=np.int64)
            rows[:, 0] = d[:g][valid]
            for i in range(n):
                rows[:, i + 1] = codes[i : i + g][valid]
            v = np.ascontiguousarray(rows).view(
                np.dtype((np.void, rows.dtype.itemsize * rows.shape[1]))
            ).ravel()
            _, first = np.unique(v, return_index=True)
            u = rows[first]
            parts = [pc.take(vocab, pa.array(u[:, i + 1])) for i in range(n)]
            sh = pc.binary_join_element_wise(*parts, pa.scalar(" "))
            yield pd.DataFrame({"id": ids[u[:, 0]], "sh": sh.to_pandas()})

    return docs.select(id_col, text_col).mapInPandas(kernel, "id long, sh string")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """EXACT near-duplicate pairs with shingle-set Jaccard ≥ threshold.

    (id_a < id_b, inter, union, jaccard). The self-join key is the shingle —
    hot shingles fan out quadratically, so at scale pass max_shingle_df to
    drop shingles shared by more than that many docs (standard frequency
    pruning; slightly lowers recall for pairs overlapping ONLY on ubiquitous
    shingles — leave None for oracle-exact mode).
    """
    sh = _shingle_rows(docs, id_col, text_col, n)
    if max_shingle_df is not None:
        keep = sh.groupBy("sh").count().where(F.col("count") <= max_shingle_df)
        sh = sh.join(keep.select("sh"), "sh", "left_semi")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "sh")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn("union", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .withColumn(
            "jaccard", F.round(F.col("inter").cast("double") / F.col("union"), 6)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "union", "jaccard")
    )


def ngram_jaccard_pairs_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> str:
    return f"""
WITH sh AS (
  SELECT {id_col} AS id, unnest({shingles_sql(text_col, n)}) AS sh FROM {table}
),
sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b USING (sh) WHERE a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b, inter,
       sa.sz + sb.sz - inter AS "union",
       round(cast(inter AS double) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE round(cast(inter AS double) / (sa.sz + sb.sz - inter), 6) >= {threshold}
"""


# ---------------------------------------------------------------------------
# shingle feature ids (portable content hash — no global state)
# ---------------------------------------------------------------------------

def shingle_ids(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    hash_mode: str = "md5",
) -> DataFrame:
    """(id, sid) rows; sid ∈ [0, 2^31-1) is a pure function of the shingle's
    CONTENT — no dictionary, no join, no global state, so the whole feature
    extraction is one codegen'd scan that partitions trivially at 100 TB.

    hash_mode:
      * 'md5'    (default) — sid = int(first 15 hex chars of md5) mod p.
        Reproducible bit-for-bit in ANSI SQL (the DuckDB oracle computes the
        identical value), so every downstream sketch stays hash-gated.
      * 'xxhash' — sid = xxhash64(shingle) mod p: the cheapest JVM hash for
        production runs where oracle parity is not required.
      * 'rank'   — legacy 1-based dense rank of the shingle in global
        lexicographic order. Kept for the historical oracle mode only: the
        rank dictionary is a single-partition global sort of the entire
        distinct-shingle set — NEVER use at scale.

    Hash collisions merge two shingles into one feature (p ≈ 2^31 ⇒ ~250
    expected collisions per 10^6 distinct shingles) — standard and harmless
    for MinHash/SimHash sketching, which is already an estimator.
    """
    sh = _shingle_rows(docs, id_col, text_col, n)
    if hash_mode == "md5":
        sid = (
            F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long")
            % F.lit(MERSENNE_P)
        )
        return sh.select("id", sid.alias("sid"))
    if hash_mode == "xxhash":
        return sh.select(
            "id", F.pmod(F.xxhash64("sh"), F.lit(MERSENNE_P)).alias("sid")
        )
    if hash_mode == "rank":
        dictionary = (
            sh.select("sh").distinct()
            .withColumn("sid", F.row_number().over(Window.orderBy("sh")).cast("long"))
        )
        return sh.join(dictionary, "sh").select("id", "sid")
    raise ValueError(f"unknown hash_mode: {hash_mode!r}")


def _shingle_ids_sql(table: str, id_col: str, text_col: str, n: int) -> str:
    """DuckDB twin of shingle_ids(hash_mode='md5'): hex-prefix of md5 → bigint
    (verified byte-identical to Spark's conv(substring(md5(..),1,15),16,10))."""
    return f"""
sh AS (
  SELECT {id_col} AS id, unnest({shingles_sql(text_col, n)}) AS sh FROM {table}
),
sids AS (
  SELECT id,
         cast(concat('0x', substr(md5(sh), 1, 15)) AS bigint) % {MERSENNE_P} AS sid
  FROM sh
)
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 32,
    seed: int = 42,
    hash_mode: str = "md5",
) -> DataFrame:
    """(id, sig array<long>[n_hashes]); sig_i = min over shingles of
    (a_i·sid + b_i) mod p — the classic permutation-sketch estimator.
    One scan + one groupBy(id): no dictionary join, no global sort."""
    sids = shingle_ids(docs, id_col, text_col, n, hash_mode)
    params = hash_params(n_hashes, seed)
    sig = F.array(*[
        F.min((F.lit(a) * F.col("sid") + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ])
    return sids.groupBy("id").agg(sig.alias("sig"))


def minhash_signatures_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 32,
    seed: int = 42,
) -> str:
    params = hash_params(n_hashes, seed)
    mins = ", ".join(
        f"min(({a}*sid + {b}) % {MERSENNE_P})" for a, b in params
    )
    return f"""
WITH {_shingle_ids_sql(table, id_col, text_col, n)}
SELECT id, [{mins}] AS sig FROM sids GROUP BY id
"""


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
    hash_mode: str = "md5",
) -> DataFrame:
    """Near-dup pairs via banded MinHash bucketing, VERIFIED with exact
    Jaccard (so emitted pairs are never false positives; LSH bounds which
    pairs are examined). Output schema matches ngram_jaccard_pairs.

    Verification cost is proportional to the CANDIDATE set, not the corpus:
    exact intersections are computed by fanning each candidate pair out to
    id_a's shingles and probing id_b's shingle rows — Σ_pairs |shingles(a)|
    joined rows, never the all-co-shingled-docs self-join. This is what makes
    LSH cheaper than the exact operator instead of strictly more expensive.
    """
    assert n_hashes % bands == 0
    r = n_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, n, n_hashes, seed, hash_mode)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.concat_ws(",", *[
                        F.col("sig")[bi * r + j].cast("string") for j in range(r)
                    ]).alias("key"),
                )
                for bi in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # exact verification restricted to candidates: cand ⨝ shingles(a) ⨝
    # shingles(b) counts the true intersection per candidate pair only.
    sh = _shingle_rows(docs, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        cand.join(sh.select(F.col("id").alias("id_a"), "sh"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn("union", F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        .withColumn(
            "jaccard", F.round(F.col("inter").cast("double") / F.col("union"), 6)
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "union", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    seed: int = 42,
    hash_mode: str = "md5",
) -> DataFrame:
    """(id, fp long): 32-bit SimHash over shingle features.

    Feature hash h = (a·sid + b) mod p; fingerprint bit j is 1 iff the count
    of features with bit j set exceeds half the feature count (the standard
    +1/−1 vote, expressed as 2·ones > total so it stays in integer SQL).
    Ties (exactly half) vote 0.
    """
    sids = shingle_ids(docs, id_col, text_col, n, hash_mode)
    (a, b) = hash_params(1, seed)[0]
    h = (F.lit(a) * F.col("sid") + F.lit(b)) % F.lit(MERSENNE_P)
    d = sids.select("id", h.alias("h"))
    aggs = [F.count(F.lit(1)).alias("total")] + [
        F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))).alias(f"ones{j}")
        for j in range(SIMHASH_BITS)
    ]
    votes = d.groupBy("id").agg(*aggs)
    fp = None
    for j in range(SIMHASH_BITS):
        bit = (F.lit(2) * F.col(f"ones{j}") > F.col("total")).cast("long") * F.lit(1 << j)
        fp = bit if fp is None else fp + bit
    return votes.select("id", fp.alias("fp"))


def simhash_fingerprints_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    seed: int = 42,
) -> str:
    (a, b) = hash_params(1, seed)[0]
    ones = ", ".join(
        f"sum((h >> {j}) & 1) AS ones{j}" for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN 2*ones{j} > total THEN cast({1 << j} AS bigint) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH {_shingle_ids_sql(table, id_col, text_col, n)},
hs AS (SELECT id, ({a}*sid + {b}) % {MERSENNE_P} AS h FROM sids),
votes AS (SELECT id, count(*) AS total, {ones} FROM hs GROUP BY id)
SELECT id, {fp} AS fp FROM votes
"""


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_hamming: int = 3,
    seed: int = 42,
    bands: int = 4,
    hash_mode: str = "md5",
) -> DataFrame:
    """EXACT pairs with hamming(fp_a, fp_b) ≤ max_hamming.

    Banded search: split the 32-bit fp into `bands` equal slices and join on
    slice equality — lossless for max_hamming < bands (pigeonhole: ≤ d
    differing bits cannot touch all B > d bands), so results equal the full
    quadratic scan while the join stays linear in bucket sizes.
    """
    assert max_hamming < bands and SIMHASH_BITS % bands == 0
    width = SIMHASH_BITS // bands
    mask = (1 << width) - 1
    fps = simhash_fingerprints(docs, id_col, text_col, n, seed, hash_mode)
    banded = fps.select(
        "id", "fp",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.shiftright(F.col("fp"), bi * width).bitwiseAND(F.lit(mask)).alias("key"),
                )
                for bi in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "fp", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"), F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return pairs.withColumn("hamming", ham.cast("int")).where(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def simhash_pairs_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_hamming: int = 3,
    seed: int = 42,
) -> str:
    """Oracle = full quadratic scan (no banding needed at oracle scale)."""
    fps = simhash_fingerprints_sql(table, id_col, text_col, n, seed)
    return f"""
WITH fps AS ({fps})
SELECT a.id AS id_a, b.id AS id_b,
       cast(bit_count(xor(a.fp, b.fp)) AS int) AS hamming
FROM fps a JOIN fps b ON a.id < b.id
WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# connected components → dedup group resolution
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Resolve near-dup PAIRS into dedup GROUPS: (id, component) where
    component = the MINIMUM doc id reachable through the pair graph — i.e.
    the deterministic canonical representative of each duplicate cluster.

    This is the stage every real dedup pipeline needs after pair generation
    (the reference stops at pair emission; a training-data pipeline must
    pick ONE survivor per transitive group, not per pair — A~B and B~C must
    drop two of {A,B,C} even though A~C was never emitted).

    Algorithm: min-label propagation with pointer jumping (the hash-to-min
    shape of Rastogi et al., "Finding Connected Components in Map-Reduce in
    Logarithmic Rounds", ICDE 2013 — public literature). Per round:

      1. label(u) ← min(label(u), min over neighbors v of label(v))
      2. label(u) ← label(label(u))        (pointer jumping)

    Step 1 alone converges in O(diameter) rounds; step 2 collapses chains
    exponentially, giving O(log n) rounds (pinned empirically by the
    100-vertex-chain pytest, which must converge well under 25 rounds).

    Scale shape: every round shuffles only the EDGE list (near-dup pairs —
    orders of magnitude smaller than the corpus) plus a |V|-row label table;
    each iteration's result is localCheckpoint-ed so the plan does not grow
    with iteration count (iterative-join lineage would otherwise overwhelm
    the optimizer long before data size matters). Skewed components (one
    giant cluster of boilerplate docs) hash-partition by label key and are
    handled by AQE skew splitting; the min-label itself is a single long.

    Raises RuntimeError if not converged after max_iters (loud, not silent).
    """
    edges = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    edges = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # 1) neighbor-min propagation (includes own label via the union)
        msgs = edges.join(labels.withColumnRenamed("id", "src"), "src").select(
            F.col("dst").alias("id"), "label"
        )
        new = (
            msgs.unionByName(labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # 2) pointer jumping: label(u) ← label(label(u)). Every label IS a
        # vertex id (labels start as ids and min() preserves membership), so
        # the self-join hits; left+coalesce guards the root (label == id).
        hop = new.select(
            F.col("id").alias("_lbl_id"), F.col("label").alias("_lbl2")
        )
        new = (
            new.join(hop, new["label"] == hop["_lbl_id"], "left")
            .select("id", F.coalesce("_lbl2", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.withColumnRenamed("label", "_old")
            .join(new, "id")
            .where(F.col("_old") != F.col("label"))
            .count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            edges.unpersist()
            return labels.select("id", F.col("label").alias("component"))
    edges.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        f"(pointer jumping makes this O(log n); a legitimate input needing "
        f"more rounds is astronomically large — raise max_iters explicitly)"
    )


def dedup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(id, canonical_id, group_size) for every doc in a duplicate group.

    canonical_id = the component label = min doc id of the group (the
    deterministic survivor); rows with id != canonical_id form the DROP
    list. Docs in no pair never appear (they are their own survivors).
    """
    comp = connected_components(pairs, id_a, id_b, max_iters)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("group_size"))
    return comp.join(sizes, "component").select(
        "id", F.col("component").alias("canonical_id"), "group_size"
    )


def dedup_groups_sql(pairs_sql: str) -> str:
    """DuckDB twin of dedup_groups over the SAME pair set: transitive
    closure via WITH RECURSIVE (enumerate every (node, reachable-node),
    MIN() per node == component label — tractable at oracle scale, where
    groups are tiny; the Spark side never materializes the closure).
    """
    return f"""
WITH RECURSIVE pairs AS (
{pairs_sql}
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(id, r) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.u, rr.r FROM edges e JOIN reach rr ON rr.id = e.v
),
comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
SELECT c.id, c.component AS canonical_id, g.group_size
FROM comp c
JOIN (
  SELECT component, COUNT(*) AS group_size FROM comp GROUP BY component
) g USING (component)
"""
