"""Federated search over several indexes — the Lucene MultiReader analog.

Lucene's ``MultiReader`` composes leaf readers into one logical reader:
docIDs are re-based per leaf (``ReaderUtil``/``BaseCompositeReader`` doc-base
arithmetic), collection statistics are summed across leaves at the
IndexSearcher level, and nothing is copied or merged. This module is the
same composition for our engine: ``open_multi_reader(spark, dirs)`` returns
a normal :class:`~cuvs_lucene_spark.query.IndexReader` whose catalog unions
the sub-indexes' committed tables with each sub-index's docIDs shifted by a
constant base — the shift touches only the ``first_doc``/``last_doc`` block
anchors and the ``doc_dim.doc_id`` column (delta-encoded gap payloads are
shift-invariant, the same property operators/admin.py's addIndexes uses),
so every query surface (boolean, phrase, spans, multiterm, grouping, ...)
works unchanged on the federated handle.

Scale shape: a federated query plans one pruned scan per sub-index and
unions them; term/bucket predicates push through the union into every
parquet scan, so bytes read stay proportional to the query, not to the
number of federated indexes. Sub-index tombstones apply (keys are
index-independent); the handle is read-only (search-side federation —
imports go through addIndexes). Each sub-index may be pinned to a
historical commit by passing ``(dir, version)``.

Compatibility contract (validated at open): equal fields, analyzer,
buckets, and positions across sub-indexes — term→bucket addressing and
query-side analysis must agree, exactly like Lucene requiring consistent
field schemas across composite leaves.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.sources.catalog import IndexCatalog

_COMPAT_KEYS = ("buckets", "positions", "fields", "analyzer")


def _sig(seg: dict) -> tuple:
    return tuple(
        tuple(seg.get(k, [])) if isinstance(seg.get(k), list) else seg.get(k)
        for k in _COMPAT_KEYS
    )


class MultiIndexCatalog:
    """Read-only composite catalog over N sub-indexes with docID re-basing.

    Duck-types the read surface of :class:`IndexCatalog` that query paths
    use (read_postings / read_doc_dim / read_dictionary / global_stats /
    validate_for_read / read_manifest / fields); every mutator is absent by
    construction, and ``pinned_version`` semantics live in the sub-catalogs
    (pass ``(dir, version)`` to pin a leaf)."""

    def __init__(self, index_dirs: list[str | tuple[str, int]]):
        if not index_dirs:
            raise ValueError("MultiIndexCatalog needs at least one index")
        self.subs: list[IndexCatalog] = [
            IndexCatalog(d, version=v)
            for d, v in (
                e if isinstance(e, tuple) else (e, None) for e in index_dirs
            )
        ]
        self.index_dir = " + ".join(c.index_dir for c in self.subs)
        manifests = [c.validate_for_read() for c in self.subs]
        template = next(
            (m["segments"][0] for m in manifests if m["segments"]), None
        )
        for c, m in zip(self.subs, manifests):
            for s in m["segments"]:
                if _sig(s) != _sig(template):
                    raise ValueError(
                        f"incompatible sub-index {c.index_dir!r}: "
                        f"{dict(zip(_COMPAT_KEYS, _sig(s)))} != "
                        f"{dict(zip(_COMPAT_KEYS, _sig(template)))}"
                    )
        # leaf doc bases: prefix sums of each sub-index's docID span
        # (BaseCompositeReader.starts analog)
        self.bases: list[int] = []
        base = 0
        for m in manifests:
            self.bases.append(base)
            base += sum(s["total_rows"] for s in m["segments"])
        # synthetic merged manifest: segment ids namespaced by leaf ordinal
        # (hashable — feeds IndexReader._snap_key), commit identity = the
        # tuple of leaf identities (any leaf commit changes it)
        self._manifest = {
            "segments": [
                {**s, "id": (i, s["id"]), "doc_base": self.bases[i] + int(s.get("doc_base", 0))}
                for i, m in enumerate(manifests)
                for s in m["segments"]
            ],
            "version": tuple(m.get("version") for m in manifests),
            "committed_at": tuple(m.get("committed_at") for m in manifests),
            "format_version": manifests[0].get("format_version"),
            "codec": manifests[0].get("codec"),
            "delete_files": [],
        }

    # -- reader surface ---------------------------------------------------
    def reopen(self) -> "MultiIndexCatalog":
        return MultiIndexCatalog(
            [
                (c.index_dir, c.pinned_version)
                if c.pinned_version is not None
                else c.index_dir
                for c in self.subs
            ]
        )

    def read_manifest(self) -> dict:
        return self._manifest

    def validate_for_read(self) -> dict:
        return self._manifest

    def fields(self) -> list[str]:
        segs = self._manifest["segments"]
        return list(segs[0].get("fields", ["text"])) if segs else ["text"]

    def global_stats(self, field: str | None = None) -> tuple[int, int, float]:
        parts = [c.global_stats(field) for c in self.subs]
        n = sum(p[0] for p in parts)
        sdl = sum(p[1] for p in parts)
        return n, sdl, (sdl / n if n else 0.0)

    def _shifted(self, df: DataFrame, base: int, cols: tuple[str, ...]) -> DataFrame:
        for c in cols:
            df = df.withColumn(c, (F.col(c) + F.lit(base)).cast("long"))
        return df

    def read_postings(
        self, spark: SparkSession, seg_ids=None
    ) -> DataFrame:
        if seg_ids is not None:
            raise ValueError("MultiIndexCatalog is a whole-index read surface")
        return reduce(
            DataFrame.unionByName,
            [
                self._shifted(
                    c.read_postings(spark), b, ("first_doc", "last_doc")
                )
                for c, b in zip(self.subs, self.bases)
            ],
        )

    def read_doc_dim(self, spark: SparkSession, seg_ids=None) -> DataFrame:
        if seg_ids is not None:
            raise ValueError("MultiIndexCatalog is a whole-index read surface")
        return reduce(
            DataFrame.unionByName,
            [
                self._shifted(c.read_doc_dim(spark), b, ("doc_id",))
                for c, b in zip(self.subs, self.bases)
            ],
        )

    def read_dictionary(self, spark: SparkSession) -> DataFrame:
        # docID-free; term_stats sums df across the unioned rows exactly as
        # it sums across segments of one index
        return reduce(
            DataFrame.unionByName,
            [c.read_dictionary(spark) for c in self.subs],
        )

    # -- deletes (operators/deletes.py dispatches on this hook) -----------
    def delete_files(self) -> list[dict]:
        # non-empty iff ANY leaf has tombstones: has_deletes() gates the
        # anti-join; the actual keys come from multi_delete_keys
        return [e for c in self.subs for e in c.delete_files()]

    def multi_delete_keys(self, spark: SparkSession) -> DataFrame | None:
        from cuvs_lucene_spark.operators.deletes import read_delete_keys

        parts = [k for k in (read_delete_keys(spark, c) for c in self.subs) if k is not None]
        if not parts:
            return None
        return reduce(DataFrame.unionByName, parts).dropDuplicates(
            ["conv_id", "turn_idx"]
        )

    def check_index(self) -> dict:
        return {c.index_dir: c.check_index() for c in self.subs}


def open_multi_reader(spark: SparkSession, index_dirs: list[str | tuple[str, int]]):
    """One searchable handle over several indexes (MultiReader analog).
    Every query entry point accepts it via ``reader=``."""
    from cuvs_lucene_spark.query import IndexReader

    cat = MultiIndexCatalog(index_dirs)
    return IndexReader(spark, cat.index_dir, catalog=cat)
