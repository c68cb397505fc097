"""Delta + varbyte posting-list codec (fully numpy-vectorized).

Posting lists are stored as two varbyte streams per chunk:
``data = varbyte(doc_gaps) || varbyte(tfs)`` where
``doc_gaps = [doc_id[0] - chunk_base, diff(doc_id)...]`` (doc_ids are
strictly increasing within a chunk). Varbyte uses 7 data bits per byte
with the high bit as a continuation flag (little-endian groups).

The reference keeps no postings at all — it aggregates DF and discards
the lists (/root/reference/snowball/src/vsm/VectorSpaceModel.java:40-45);
this codec is the index-native replacement required by the north rule
(delta-encode + varbyte-compress posting lists).
"""

from __future__ import annotations

import numpy as np


def encode_varbyte(values: np.ndarray) -> bytes:
    """Encode a uint array as a varbyte stream. Vectorized: loops only
    over the max byte-width (<=10), never over values."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.size, dtype=np.int64)
    x = v >> np.uint64(7)
    while x.any():
        nbytes += (x > 0).astype(np.int64)
        x = x >> np.uint64(7)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    for k in range(int(nbytes.max())):
        sel = nbytes > k
        pos = offsets[:-1][sel] + k
        byte = ((v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[sel] > k + 1).astype(np.uint8) << 7
        out[pos] = byte | cont
    return out.tobytes()


def decode_varbyte(buf: bytes | memoryview | np.ndarray) -> np.ndarray:
    """Decode a varbyte stream back to uint64. Vectorized via
    searchsorted group assignment."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    idx = np.arange(b.size, dtype=np.int64)
    group = np.searchsorted(ends, idx)
    shift = ((idx - starts[group]) * 7).astype(np.uint64)
    vals = np.zeros(ends.size, dtype=np.uint64)
    np.add.at(vals, group, (b & np.uint8(0x7F)).astype(np.uint64) << shift)
    return vals


# Bump when the on-disk chunk encoding changes — feeds the index cache
# fingerprint (pipelines.index_pipeline.index_format_fingerprint)
CODEC_VERSION = 1


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray | None = None,
    base: int = 0,
) -> bytes:
    """Encode one sorted posting chunk. ``doc_ids`` strictly increasing,
    all >= ``base`` (the chunk's base doc). Layout:
    varbyte(len) || varbyte(gaps) || varbyte(tfs) [|| varbyte(dls)].

    ``dls`` (per-posting document length) is embedded so the scorer
    needs NO separate doc-length lookup table — at 10^12-doc scale a
    broadcast doc_len array is impossible, and a forward-index join per
    query would be a shuffle; ~1 byte/posting buys a self-contained
    chunk (the classic impact-ready posting layout)."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    gaps = np.empty(doc_ids.size, dtype=np.uint64)
    if doc_ids.size:
        gaps[0] = np.uint64(doc_ids[0] - base)
        np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:], casting="unsafe")
    header = encode_varbyte(np.array([doc_ids.size], dtype=np.uint64))
    out = header + encode_varbyte(gaps) + encode_varbyte(tfs.astype(np.uint64))
    if dls is not None:
        out += encode_varbyte(dls.astype(np.uint64))
    return out


def decode_postings(
    buf: bytes, base: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Decode one posting chunk -> (doc_ids:int64, tfs:int32,
    dls:int32 | None)."""
    vals = decode_varbyte(buf)
    n = int(vals[0])
    gaps = vals[1 : 1 + n].astype(np.int64)
    tfs = vals[1 + n : 1 + 2 * n].astype(np.int32)
    dls = vals[1 + 2 * n : 1 + 3 * n].astype(np.int32) if vals.size >= 1 + 3 * n and n else None
    doc_ids = np.cumsum(gaps) + base
    return doc_ids, tfs, dls
