"""Posting-block codec: delta-gap + varint, fully vectorized in numpy.

The reference persists its whole index as one gzip-pickled Python dict
(bm25_functions.py:203-210,504-517). The engine instead stores posting
lists as columnar blocks:

    (term, shard, block_id, first_doc_id, last_doc_id, n_docs,
     doc_deltas BINARY, tfs BINARY, block_max_score DOUBLE)

- doc ids within a block are sorted; stored as first_doc_id (int64) +
  varint-encoded positive deltas
- term frequencies stored varint (they're small Zipfian ints — varint +
  parquet page compression ≈ a few bits each)
- block_max_score = max BM25 contribution of any posting in the block
  (computable at build time since idf/doc_len/avgdl are known) — the
  skipping metadata for block-max pruned query execution

Both encode and decode are loop-free numpy (no per-value Python), so the
codec runs inside Arrow-batched applyInPandas at full speed.
"""

from __future__ import annotations

import numpy as np

_MASK7 = np.uint64(0x7F)
_CONT = np.uint8(0x80)


def _encode_core(v: np.ndarray, nbytes: np.ndarray) -> bytes:
    """Encode with a precomputed per-value byte-length array."""
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # position of each output byte within its value (0 = lowest 7 bits)
    idx = np.arange(total, dtype=np.int64)
    owner = np.repeat(np.arange(v.size, dtype=np.int64), nbytes)
    pos = idx - starts[owner]
    chunk = (v[owner] >> (np.uint64(7) * pos.astype(np.uint64))) & _MASK7
    byte = chunk.astype(np.uint8)
    is_last = idx == (ends[owner] - 1)
    byte[~is_last] |= _CONT
    out[:] = byte
    return out.tobytes()


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a non-negative int array, vectorized."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    return _encode_core(v, varint_nbytes(v))


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 buffer to uint64 array, vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & _CONT) == 0
    if is_end.all():
        # every value fits 7 bits (the common case for doc gaps and tfs):
        # the buffer IS the value array — skips the scatter-add entirely
        vals = b.astype(np.uint64)
        if count is not None and vals.size != count:
            raise ValueError(f"decoded {vals.size} values, expected {count}")
        return vals
    # group id per byte: number of ends strictly before this byte
    gid = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_end[:-1], out=gid[1:])
    # position within group
    group_start = np.zeros(b.size, dtype=np.int64)
    ends_idx = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends_idx[:-1] + 1))
    pos = np.arange(b.size, dtype=np.int64) - starts[gid]
    vals = np.zeros(ends_idx.size, dtype=np.uint64)
    np.add.at(vals, gid, (b & np.uint8(0x7F)).astype(np.uint64)
              << (np.uint64(7) * pos.astype(np.uint64)))
    if count is not None and vals.size != count:
        raise ValueError(f"decoded {vals.size} values, expected {count}")
    return vals


def varint_nbytes(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized) — used to slice a single
    concatenated encode into per-block buffers without re-encoding."""
    v = np.asarray(values, dtype=np.uint64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while np.any(tmp > 0):
        nbits[tmp > 0] += 1
        tmp >>= np.uint64(1)
    return np.maximum((nbits + 6) // 7, 1)


def varint_encode_segmented(values: np.ndarray, seg_lengths: np.ndarray) -> list[bytes]:
    """Encode one concatenated array, then split into per-segment buffers.

    One vectorized pass over all postings of a shard instead of one
    encode call per block.
    """
    v = np.asarray(values, dtype=np.uint64)
    assert int(np.sum(seg_lengths)) == v.size
    per_val = varint_nbytes(v)  # computed once; shared by encode and slicing
    buf = (np.frombuffer(_encode_core(v, per_val), dtype=np.uint8)
           if v.size else np.empty(0, dtype=np.uint8))
    # byte offset where each segment starts
    seg_ends_vals = np.cumsum(np.asarray(seg_lengths, dtype=np.int64))
    byte_ends = np.cumsum(per_val)
    if v.size:
        # a zero-length segment ends where the previous one ended
        seg_byte_ends = np.where(seg_ends_vals > 0, byte_ends[seg_ends_vals - 1], 0)
    else:
        seg_byte_ends = np.zeros(len(seg_lengths), dtype=np.int64)
    out: list[bytes] = []
    start = 0
    for end in seg_byte_ends:
        out.append(buf[start:end].tobytes())
        start = int(end)
    return out


def encode_doc_block(doc_ids: np.ndarray) -> tuple[int, int, bytes]:
    """Sorted int64 doc ids → (first, last, delta-varint buffer).

    Deltas exclude the first id (stored in-column), so an n-doc block
    encodes n-1 deltas.
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        raise ValueError("empty block")
    deltas = np.diff(d).astype(np.uint64)  # sorted → non-negative
    return int(d[0]), int(d[-1]), varint_encode(deltas)


def decode_doc_blocks_batch(first_doc_ids: np.ndarray, n_docs: np.ndarray,
                            bufs: list[bytes]) -> np.ndarray:
    """Decode MANY doc-id blocks in one pass: concatenate the delta
    buffers, one varint decode, then a vectorized segmented
    reconstruction (global cumsum + per-block base rebasing). Replaces
    a per-block Python loop whose numpy-call overhead dominated decode
    (blocks hold ~128 postings; a query touches 10^4-10^5 blocks).
    Bit-identical to per-block decode_doc_block (each buffer holds
    complete varints, so concatenated decode == concatenated decodes).
    """
    n = np.asarray(n_docs, dtype=np.int64)
    first = np.asarray(first_doc_ids, dtype=np.int64)
    dl = n - 1                      # deltas per block (first id is in-column)
    deltas = varint_decode(b"".join(bufs), int(dl.sum()))
    total = int(n.sum())
    out = np.empty(total, dtype=np.int64)
    starts = np.cumsum(n) - n       # block starts in `out`
    dstarts = np.cumsum(dl) - dl    # block starts in `deltas`
    cs = np.cumsum(deltas.astype(np.int64))
    cs0 = np.concatenate(([0], cs))
    # value of delta g in block b = first[b] + (cs[g] - cs_before_block[b])
    base = first - cs0[dstarts]
    owner = np.repeat(np.arange(n.size, dtype=np.int64), dl)
    out[starts] = first
    if deltas.size:
        pos = starts[owner] + 1 + (np.arange(deltas.size, dtype=np.int64)
                                   - dstarts[owner])
        out[pos] = base[owner] + cs
    return out


def decode_doc_block(first_doc_id: int, n_docs: int, buf: bytes) -> np.ndarray:
    deltas = varint_decode(buf, count=n_docs - 1)
    out = np.empty(n_docs, dtype=np.int64)
    out[0] = first_doc_id
    if n_docs > 1:
        np.cumsum(deltas.astype(np.int64), out=out[1:])
        out[1:] += first_doc_id
    return out


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varint_encode(np.asarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes, n_docs: int) -> np.ndarray:
    return varint_decode(buf, count=n_docs).astype(np.int64)
