"""connected_components / dedup_groups: engine vs independent union-find.

The reference emits near-dup PAIRS only; group resolution (transitive
closure → canonical survivor) is the pipeline stage after it. Reference
analog for the test strategy: randomized inputs vs an independent oracle
(``TestCuVSRandomizedVectorSearch.java:154-183``), here a 20-line
union-find that shares no code with the Spark implementation.
"""

import random

import pytest

from cuvs_lucene_spark.pipeline.dedup import (
    connected_components,
    dedup_groups,
    dedup_groups_sql,
)


def _uf_components(edges):
    """Independent union-find reference: {vertex: min-id-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _spark_components(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_toy_graph_matches_union_find_and_sql(spark):
    edges = [(2, 1), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)]
    got = _spark_components(spark, edges)
    assert got == _uf_components(edges)

    rows = dedup_groups(
        spark.createDataFrame(edges, "id_a long, id_b long")
    ).collect()
    assert {(r["id"], r["canonical_id"], r["group_size"]) for r in rows} == {
        (1, 1, 3), (2, 1, 3), (3, 1, 3),
        (10, 10, 2), (11, 10, 2),
        (20, 20, 3), (21, 20, 3), (22, 20, 3),
    }

    duckdb = pytest.importorskip("duckdb")
    vals = ",".join(f"({a},{b})" for a, b in edges)
    sql = dedup_groups_sql(f"SELECT * FROM (VALUES {vals}) t(id_a, id_b)")
    oracle = {
        (int(i), int(c), int(g))
        for i, c, g in duckdb.sql(sql).fetchall()
    }
    assert {(r["id"], r["canonical_id"], r["group_size"]) for r in rows} == oracle


@pytest.mark.parametrize("seed", [7, 19, 42])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = rng.randint(40, 120)
    m = rng.randint(n // 4, 2 * n)
    # non-contiguous ids exercise the labels-are-ids invariant
    ids = rng.sample(range(0, 100_000), n)
    edges = [tuple(rng.sample(ids, 2)) for _ in range(m)]
    assert _spark_components(spark, edges) == _uf_components(edges)


def test_chain_converges_logarithmically(spark):
    """A 100-vertex path is the worst case for plain min-propagation
    (O(diameter) = 99 rounds); pointer jumping must finish in O(log n).
    max_iters=12 would fail loudly without the jumping step."""
    edges = [(i, i + 1) for i in range(100)]
    got = _spark_components(spark, edges, max_iters=12)
    assert set(got.values()) == {0}
    assert len(got) == 101


def test_nonconvergence_raises_loudly(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iters=1)
