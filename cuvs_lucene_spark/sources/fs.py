"""Filesystem boundary for index metadata and kernel side-files.

Every non-Spark-managed byte of the index (manifest JSON, tombstone checks,
kernel side-written parquet parts, resume probes) goes through pyarrow.fs,
so an ``index_dir`` may be a plain local path, a ``file://`` URI, or an
object-store/HDFS URI (``s3://``, ``hdfs://``, ...) — resolved identically
on the driver and inside executor kernels (no SparkSession/py4j needed).
Parquet *tables* (postings, doc_dim, dictionary, lineage, deletes) are read
and written by Spark itself, whose Hadoop FS layer accepts the same URIs;
this module only covers the small metadata files Spark doesn't manage.

Reference analog: the reference never touches ``java.io.File`` for index
bytes — everything rides Lucene's Directory/IndexOutput abstraction
(``CuVS2510GPUVectorsWriter.java:154-165``); this is the same portability
boundary for our engine.

Atomicity note: ``move`` is a true atomic rename on local/HDFS filesystems.
On object stores it is copy+delete — not atomic, but safe here because (a)
manifest swaps are tiny single files whose readers tolerate the old version
until the copy lands, and (b) kernel part-files use deterministic final
names, so a speculative/retried task converges on identical content.
"""

from __future__ import annotations

import posixpath
import uuid

import pyarrow.fs as pafs


def join(path: str, *parts: str) -> str:
    """URI-safe path join (posix semantics work for every scheme we accept)."""
    return posixpath.join(path, *parts)


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """(FileSystem, fs-internal path) for a local path or URI."""
    return pafs.FileSystem.from_uri(path)


def mkdirs(path: str) -> None:
    fs, p = resolve(path)
    fs.create_dir(p, recursive=True)


def _info(path: str) -> pafs.FileInfo:
    fs, p = resolve(path)
    return fs.get_file_info(p)


def exists(path: str) -> bool:
    return _info(path).type != pafs.FileType.NotFound


def isdir(path: str) -> bool:
    return _info(path).type == pafs.FileType.Directory


def listdir(path: str) -> list[str]:
    """Base names of the direct children of ``path`` ([] if absent)."""
    fs, p = resolve(path)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    return [i.base_name for i in infos]


def list_files_recursive(path: str) -> list[tuple[str, int]]:
    """(path relative to ``path``, size) of every regular file under the
    directory, recursively ([] if the directory is absent)."""
    fs, p = resolve(path)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=True))
    except (FileNotFoundError, OSError):
        return []
    base = p.rstrip("/") + "/"
    return [
        (i.path[len(base):] if i.path.startswith(base) else i.base_name, i.size)
        for i in infos
        if i.type == pafs.FileType.File
    ]


def read_bytes(path: str) -> bytes:
    fs, p = resolve(path)
    with fs.open_input_stream(p) as f:
        return f.read()


def write_bytes_atomic(path: str, data: bytes) -> None:
    """Write via a same-directory temp file + move (see atomicity note)."""
    fs, p = resolve(path)
    tmp = f"{p}.tmp-{uuid.uuid4().hex[:12]}"
    with fs.open_output_stream(tmp) as f:
        f.write(data)
    fs.move(tmp, p)


def create_exclusive(path: str, data: bytes) -> bool:
    """Create ``path`` with ``data`` iff it does not exist; False when it
    does. On local filesystems this is a TRUE atomic create (O_CREAT|O_EXCL
    — the NativeFSLockFactory-class guarantee). On remote URIs it is
    best-effort: exists-check, atomic write, read-back token verification —
    the same portability contract as Lucene's SimpleFSLockFactory, which is
    likewise advisory on filesystems without an atomic create primitive."""
    fs, p = resolve(path)
    if isinstance(fs, pafs.LocalFileSystem):
        import os

        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        return True
    if exists(path):
        return False
    write_bytes_atomic(path, data)
    return read_bytes(path) == data


def move(src: str, dst: str) -> None:
    """Move/rename a file or directory within one filesystem (see atomicity
    note: true rename on local/HDFS; copy+delete on object stores)."""
    fs, p_src = resolve(src)
    _, p_dst = resolve(dst)
    fs.move(p_src, p_dst)


def delete_dir(path: str) -> None:
    fs, p = resolve(path)
    try:
        fs.delete_dir(p)
    except (FileNotFoundError, OSError):
        pass


def delete_file(path: str) -> None:
    fs, p = resolve(path)
    try:
        fs.delete_file(p)
    except (FileNotFoundError, OSError):
        pass


def mtime(path: str) -> float | None:
    """Modification time as a unix timestamp, or None when the filesystem
    does not report one (callers treating None conservatively)."""
    info = _info(path)
    if info.type == pafs.FileType.NotFound or info.mtime is None:
        return None
    return info.mtime.timestamp()


def write_parquet_atomic(table, path: str, compression: str = "snappy") -> None:
    """Executor-safe parquet part write: temp name + move to the final name.

    Deterministic final names (caller includes the partition id) make retried
    tasks idempotent — the kernel-side analog of Spark's output committer.
    """
    import pyarrow.parquet as pq

    fs, p = resolve(path)
    tmp = f"{p}.tmp-{uuid.uuid4().hex[:12]}"
    with fs.open_output_stream(tmp) as f:
        pq.write_table(table, f, compression=compression)
    fs.move(tmp, p)
