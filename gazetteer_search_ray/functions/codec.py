"""Posting-list codec: delta + varbyte compression and block-max metadata.

The reference hides postings inside ElasticSearch/Lucene; here they are
explicit (SURVEY.md §1.3): per (term, shard) a posting list is

* ``docs``  — doc_ids, strictly increasing, delta-encoded then varbyte
* ``tfs``   — term frequencies, varbyte (aligned with docs)
* blocks of ``BLOCK_SIZE`` postings with skip metadata
  ``(last_doc, max_tf, min_dl)`` from which the query layer derives
  block-max BM25 upper bounds (see ``bm25.block_upper_bound``).

Everything is vectorized numpy — no per-value Python loops: encoding
iterates over *byte positions* (≤10) not values, decoding reconstructs
all values with cumsum/scatter ops.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128


def varbyte_encode(values: np.ndarray) -> bytes:
    """Varbyte (7-bit groups, little-endian, MSB = continuation) encode.

    ``values`` must be non-negative integers (any integer dtype).
    """
    v = np.asarray(values)
    if v.size == 0:
        return b""
    v = v.astype(np.uint64, copy=True)
    # number of 7-bit groups per value (1..10)
    nb = np.ones(v.shape, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nb += (tmp != 0).astype(np.int64)
        tmp >>= np.uint64(7)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    max_nb = int(nb.max())
    for i in range(max_nb):
        m = nb > i
        byte = ((v[m] >> np.uint64(7 * i)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[m] - 1 > i).astype(np.uint8) << 7
        out[starts[m] + i] = byte | cont
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Inverse of :func:`varbyte_encode`; returns uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(ends)[:-1]
    start_flags = np.empty(b.size, dtype=bool)
    start_flags[0] = True
    start_flags[1:] = ends[:-1]
    start_pos = np.flatnonzero(start_flags)
    within = np.arange(b.size, dtype=np.int64) - start_pos[group]
    vals = np.zeros(int(ends.sum()), dtype=np.uint64)
    contrib = (b & 0x7F).astype(np.uint64) << (7 * within).astype(np.uint64)
    np.bitwise_or.at(vals, group, contrib)
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids → gaps (first value absolute)."""
    ids = np.asarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    out = np.empty_like(ids)
    out[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.uint64), dtype=np.uint64)


@dataclass
class Posting:
    """Decoded posting list with block-max skip metadata."""

    doc_ids: np.ndarray  # int64, strictly increasing
    tfs: np.ndarray  # int64
    block_last_doc: np.ndarray  # int64, one per block
    block_max_tf: np.ndarray  # int32
    block_min_dl: np.ndarray  # int32


def encode_posting(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Sort by doc_id, compress, and compute per-block skip metadata.

    Returns a plain dict (Arrow-friendly) with keys
    ``docs`` / ``tfs`` (binary), ``block_last_doc`` / ``block_max_tf`` /
    ``block_min_dl`` (lists), ``df`` (int).  ``dls`` are per-posting doc
    lengths (same order as doc_ids) — they feed the block bounds but are
    NOT stored per posting (doc lengths live in the doc store).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    order = np.argsort(doc_ids, kind="stable")
    doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
    if doc_ids.size > 1 and np.any(doc_ids[1:] == doc_ids[:-1]):
        raise ValueError("duplicate doc_id in posting list")
    n = doc_ids.size
    nblocks = (n + block_size - 1) // block_size
    pad = nblocks * block_size - n
    if n:
        tf_m = tfs if pad == 0 else np.concatenate([tfs, np.zeros(pad, np.int64)])
        dl_m = dls if pad == 0 else np.concatenate([dls, np.full(pad, np.iinfo(np.int64).max)])
        block_max_tf = tf_m.reshape(nblocks, block_size).max(axis=1)
        block_min_dl = dl_m.reshape(nblocks, block_size).min(axis=1)
        last_idx = np.minimum(np.arange(1, nblocks + 1) * block_size, n) - 1
        block_last_doc = doc_ids[last_idx]
    else:
        block_max_tf = np.empty(0, np.int64)
        block_min_dl = np.empty(0, np.int64)
        block_last_doc = np.empty(0, np.int64)
    return {
        "df": int(n),
        "docs": varbyte_encode(delta_encode(doc_ids)),
        "tfs": varbyte_encode(tfs),
        "block_last_doc": block_last_doc.astype(np.int64),
        "block_max_tf": block_max_tf.astype(np.int32),
        "block_min_dl": np.minimum(block_min_dl, np.iinfo(np.int32).max).astype(np.int32),
    }


def decode_posting(row: dict, block_size: int = BLOCK_SIZE) -> Posting:
    """Inverse of :func:`encode_posting` (block metadata passed through)."""
    doc_ids = delta_decode(varbyte_decode(row["docs"])).astype(np.int64)
    tfs = varbyte_decode(row["tfs"]).astype(np.int64)
    return Posting(
        doc_ids=doc_ids,
        tfs=tfs,
        block_last_doc=np.asarray(row["block_last_doc"], dtype=np.int64),
        block_max_tf=np.asarray(row["block_max_tf"], dtype=np.int32),
        block_min_dl=np.asarray(row["block_min_dl"], dtype=np.int32),
    )
