"""Posting-block compression kernels (numpy, Arrow-batch friendly).

The reference's block encoder sorts ids, dedups, delta-encodes and writes
VInt gaps per node (``Lucene99AcceleratedHNSWVectorsWriter.java:438-487``);
Lucene's own postings use FOR/PForDelta 128-doc blocks. We implement a
frame-of-reference fixed-width bit packer — fully vectorizable in numpy for
both encode AND decode (VByte decode is inherently sequential in Python),
which is what matters inside Arrow-batched pandas UDFs.

Wire format of one packed array (little header + packbits payload):
    byte 0      : width w in bits (0..64); w==0 → all values equal `base`
    bytes 1..8  : base (min value), little-endian uint64
    bytes 9..12 : count n, little-endian uint32
    bytes 13..  : ceil(n*w/8) bytes of MSB-first bit-packed (v - base)

Block layout & impact metadata: see operators/build.py. 128-doc blocks
(Lucene's block size) with per-block (max_tf, min_dl) — bound-safe inputs to
Block-Max WAND (SURVEY.md §4.3.6: bound ≥ max true score in block).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene posting block size


def pack_u64(vals: np.ndarray) -> bytes:
    """FOR-pack a uint64 array (values may be any non-negative ints)."""
    vals = np.asarray(vals, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return bytes([0]) + (0).to_bytes(8, "little") + (0).to_bytes(4, "little")
    base = int(vals.min())
    rel = vals - np.uint64(base)
    mx = int(rel.max())
    w = mx.bit_length()
    header = bytes([w]) + base.to_bytes(8, "little") + n.to_bytes(4, "little")
    if w == 0:
        return header
    # bits[i, j] = j-th most-significant bit of rel[i] (w bits each)
    shifts = np.arange(w - 1, -1, -1, dtype=np.uint64)
    bits = ((rel[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return header + np.packbits(bits.ravel()).tobytes()


def unpack_u64(buf: bytes) -> np.ndarray:
    w = buf[0]
    base = int.from_bytes(buf[1:9], "little")
    n = int.from_bytes(buf[9:13], "little")
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if w == 0:
        return np.full(n, base, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8, offset=13))[: n * w]
    weights = (np.uint64(1) << np.arange(w - 1, -1, -1, dtype=np.uint64))
    vals = (bits.reshape(n, w).astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    return vals + np.uint64(base)


def encode_gaps(doc_ids: np.ndarray) -> bytes:
    """Delta-gap encode a SORTED ascending doc_id array.

    Stores gaps[0] = doc_ids[0] - first-doc-anchor 0? No: the block row
    carries first_doc explicitly; we store gaps relative to the previous
    docID with gaps[0] = 0, so decode needs first_doc. This mirrors the
    reference's global-id delta encoding (``Lucene99Accelerated...:456-480``)
    with the base held in block metadata rather than the stream.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    gaps = np.diff(doc_ids, prepend=doc_ids[:1])  # first gap 0
    return pack_u64(gaps)


def decode_gaps(buf: bytes, first_doc: int) -> np.ndarray:
    gaps = unpack_u64(buf)
    if len(gaps) == 0:
        return gaps
    out = np.cumsum(gaps, dtype=np.uint64)
    return out + np.uint64(first_doc)


def encode_u32(vals: np.ndarray) -> bytes:
    """Pack small positive ints (tfs, quantized dls)."""
    return pack_u64(np.asarray(vals, dtype=np.uint64))


def decode_u32(buf: bytes) -> np.ndarray:
    return unpack_u64(buf).astype(np.int64)
