"""Index catalog: on-disk layout, manifest, lineage (checkpoint-resume).

Plays the role of the reference's two-file meta+payload layout with versioned
headers and checksummed footers (``CuVS2510GPUVectorsFormat.java:39-42``,
``CuVS2510GPUVectorsWriter.java:154-165``): in our engine the "payload" is
parquet posting blocks partitioned by term bucket, and the "meta" is a JSON
manifest + small parquet side tables, with an atomically-moved manifest as
the snapshot pointer — the same commit protocol shape (write data → write
meta → atomic pointer swap, cf. ``finish()`` end-marker at
``CuVS2510GPUVectorsWriter.java:521-537``). ``index_dir`` may be a local
path or any filesystem URI both Spark and pyarrow.fs resolve (``file://``,
``hdfs://``, ``s3://``): tables go through Spark's Hadoop FS layer and the
manifest/side-files through :mod:`cuvs_lucene_spark.sources.fs`, so the
same index works on a laptop and against a 1000-executor object store.

Layout:
    <index_dir>/manifest.json                      # snapshot pointer (atomic rename)
    <index_dir>/seg=<sid>/doc_dim/                 # parquet
    <index_dir>/seg=<sid>/postings/bucket=<b>/     # parquet, hive-partitioned
    <index_dir>/seg=<sid>/dictionary/              # parquet (per-segment term stats)
    <index_dir>/lineage/                           # parquet append-only metric rows
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cuvs_lucene_spark.sources import fs

MANIFEST = "manifest.json"

# On-disk format version + codec tag, embedded in the manifest at commit and
# asserted at read-open — the analog of the reference's versioned headers /
# CorruptIndexException checks (``CuVS2510GPUVectorsReader.java:143-166``,
# ``CuVS2510GPUVectorsFormat.java:39-42``). Bump INDEX_FORMAT_VERSION whenever
# manifest/table layout changes; CODEC_NAME names the postings wire format
# (cuvs_lucene_spark.codec pack_u64: 13-byte header + MSB FOR bit-packing).
INDEX_FORMAT_VERSION = 1
CODEC_NAME = "for128-msb-v1"


class CorruptIndexError(RuntimeError):
    """The index on disk fails a structural/version invariant."""

LINEAGE_SCHEMA = (
    "run_id string, segment_id int, bucket int, status string, "
    "docs_indexed long, postings_written long, bytes_compressed long, "
    "committed_at timestamp"
)


class IndexCatalog:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        fs.mkdirs(index_dir)

    # -- paths ---------------------------------------------------------
    def seg_dir(self, sid: int) -> str:
        return fs.join(self.index_dir, f"seg={sid}")

    def doc_dim_path(self, sid: int) -> str:
        return fs.join(self.seg_dir(sid), "doc_dim")

    def postings_path(self, sid: int) -> str:
        return fs.join(self.seg_dir(sid), "postings")

    def dictionary_path(self, sid: int) -> str:
        return fs.join(self.seg_dir(sid), "dictionary")

    def lineage_path(self) -> str:
        return fs.join(self.index_dir, "lineage")

    # -- manifest (snapshot pointer) ------------------------------------
    def read_manifest(self) -> dict:
        p = fs.join(self.index_dir, MANIFEST)
        if not fs.exists(p):
            return {"segments": [], "version": 0}
        return json.loads(fs.read_bytes(p))

    def _write_manifest(self, m: dict) -> None:
        m["segments"].sort(key=lambda s: s["id"])
        m["version"] = m.get("version", 0) + 1
        m["committed_at"] = time.time()
        m["format_version"] = INDEX_FORMAT_VERSION
        m["codec"] = CODEC_NAME
        fs.write_bytes_atomic(
            fs.join(self.index_dir, MANIFEST),
            json.dumps(m, indent=1).encode(),
        )

    def commit_segment(self, seg_meta: dict) -> None:
        """Atomically add a segment to the manifest (idempotent by id)."""
        m = self.read_manifest()
        m["segments"] = [s for s in m["segments"] if s["id"] != seg_meta["id"]]
        m["segments"].append(seg_meta)
        self._write_manifest(m)

    def replace_segments(self, drop_ids: list[int], seg_meta: dict) -> None:
        """Compaction commit: swap merged-away segments for the new one."""
        m = self.read_manifest()
        m["segments"] = [s for s in m["segments"] if s["id"] not in drop_ids]
        m["segments"].append(seg_meta)
        self._write_manifest(m)

    def validate_for_read(self) -> dict:
        """Open-time structural validation (CorruptIndexException analog).

        Asserts: manifest format version + codec tag are the ones this code
        reads; every live segment's postings/doc_dim/dictionary directories
        exist; each segment's bucket partition dirs are a subset of
        range(buckets) (a stray/renamed bucket dir means the term→bucket map
        no longer addresses the data). Raises CorruptIndexError. Cheap —
        directory metadata only, no data files are opened."""
        m = self.read_manifest()
        if not m["segments"]:
            return m
        fv = m.get("format_version")
        if fv != INDEX_FORMAT_VERSION:
            raise CorruptIndexError(
                f"index format version {fv!r} != supported {INDEX_FORMAT_VERSION}"
            )
        codec = m.get("codec")
        if codec != CODEC_NAME:
            raise CorruptIndexError(f"codec {codec!r} != supported {CODEC_NAME!r}")
        for s in m["segments"]:
            sid = s["id"]
            pdir = self.postings_path(sid)
            for d, what in [
                (pdir, "postings"),
                (self.doc_dim_path(sid), "doc_dim"),
                (self.dictionary_path(sid), "dictionary"),
            ]:
                if not fs.isdir(d):
                    raise CorruptIndexError(f"segment {sid}: missing {what} at {d}")
            seen = set()
            for e in fs.listdir(pdir):
                if e.startswith("bucket="):
                    try:
                        seen.add(int(e.split("=", 1)[1]))
                    except ValueError as ex:
                        raise CorruptIndexError(
                            f"segment {sid}: unparsable partition dir {e!r}"
                        ) from ex
            if not seen <= set(range(s["buckets"])):
                raise CorruptIndexError(
                    f"segment {sid}: bucket dirs {sorted(seen - set(range(s['buckets'])))} "
                    f"outside range({s['buckets']})"
                )
        return m

    def committed_segment_ids(self) -> set[int]:
        return {s["id"] for s in self.read_manifest()["segments"]}

    # -- global stats (IndexSearcher-level; SURVEY §4.3.2) ---------------
    def global_stats(self) -> tuple[int, int, float]:
        """(n_docs, sum_dl, avgdl) summed across live segments."""
        m = self.read_manifest()
        n = sum(s["n_docs"] for s in m["segments"])
        sdl = sum(s["sum_dl"] for s in m["segments"])
        return n, sdl, (sdl / n if n else 0.0)

    def next_doc_base(self) -> int:
        m = self.read_manifest()
        return sum(s["total_rows"] for s in m["segments"])

    # -- table readers ---------------------------------------------------
    def _live_ids(self, seg_ids: list[int] | None) -> list[int]:
        live = [s["id"] for s in self.read_manifest()["segments"]]
        if seg_ids is None:
            return live
        missing = set(seg_ids) - set(live)
        if missing:
            raise ValueError(f"not live segments: {sorted(missing)}")
        return list(seg_ids)

    def read_doc_dim(
        self, spark: SparkSession, seg_ids: list[int] | None = None
    ) -> DataFrame:
        paths = [self.doc_dim_path(i) for i in self._live_ids(seg_ids)]
        return spark.read.parquet(*paths)

    def read_postings(
        self, spark: SparkSession, seg_ids: list[int] | None = None
    ) -> DataFrame:
        paths = [self.postings_path(i) for i in self._live_ids(seg_ids)]
        # each segment is its own hive-partitioned (bucket=N) tree; reading
        # them in one call trips partition-discovery root conflicts — union
        # per-segment scans instead (bucket pruning still applies per scan)
        from functools import reduce

        dfs = [spark.read.option("basePath", p).parquet(p) for p in paths]
        return reduce(DataFrame.unionByName, dfs)

    def read_dictionary(self, spark: SparkSession) -> DataFrame:
        segs = self.read_manifest()["segments"]
        paths = [self.dictionary_path(s["id"]) for s in segs]
        return spark.read.parquet(*paths)

    # -- lineage ----------------------------------------------------------
    def append_lineage(self, spark: SparkSession, rows: list[tuple]) -> None:
        df = spark.createDataFrame(rows, LINEAGE_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.lineage_path())

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.lineage_path())
