"""Posting-list codec: raw doc ids + varbyte tfs and block-max metadata.

The reference hides postings inside ElasticSearch/Lucene; here they are
explicit (SURVEY.md §1.3): per (term, shard) a posting list is

* ``docs``  — doc_ids, strictly increasing, raw little-endian int64.
  Doc ids are 63-bit content hashes, so within-list gaps average
  ``2^63/df`` — delta+varbyte emits 6–10 bytes per id (measured ≥ the
  raw 8 bytes on every real list) while costing a 10-pass byte-emission
  encode and a bit-scatter decode.  Raw fixed width is smaller-or-equal
  AND turns both sides into a single buffer view — the build's encode
  stage was 47% of pipeline CPU at 5.12M docs before this change.
* ``tfs``   — term frequencies, varbyte (aligned with docs; tfs are
  tiny, varbyte genuinely wins here)
* blocks of ``BLOCK_SIZE`` postings with skip metadata
  ``(last_doc, max_tf, min_dl)`` from which the query layer derives
  block-max BM25 upper bounds (see ``bm25.block_upper_bound``).

Everything is vectorized numpy — no per-value Python loops: encoding
iterates over *byte positions* (≤10) not values, decoding reconstructs
all values with cumsum/segment-reduce ops.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128


def _varbyte_encode_starts(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode; returns (uint8 buffer, per-value byte start offsets)."""
    v = np.asarray(values)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
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
    return out, starts


def varbyte_encode(values: np.ndarray) -> bytes:
    """Varbyte (7-bit groups, little-endian, MSB = continuation) encode.

    ``values`` must be non-negative integers (any integer dtype).
    """
    out, _ = _varbyte_encode_starts(values)
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Inverse of :func:`varbyte_encode`; returns uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0
    if ends.all():  # all values < 128 — one widening copy (typical tfs)
        return b.astype(np.uint64)
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(ends)[:-1]
    start_flags = np.empty(b.size, dtype=bool)
    start_flags[0] = True
    start_flags[1:] = ends[:-1]
    start_pos = np.flatnonzero(start_flags)
    within = np.arange(b.size, dtype=np.int64) - start_pos[group]
    contrib = (b & 0x7F).astype(np.uint64) << (7 * within).astype(np.uint64)
    # per-value byte contributions occupy disjoint bit ranges, so a
    # segment SUM equals the bitwise OR — and np.add.reduceat is ~20×
    # faster than the unbuffered np.bitwise_or.at scatter
    return np.add.reduceat(contrib, start_pos)


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

    @property
    def df(self) -> int:
        return int(self.doc_ids.size)


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
    tfs_buf, tfs_starts = _varbyte_encode_starts(tfs)
    nblk = (n + block_size - 1) // block_size
    return {
        "df": int(n),
        # raw absolute LE int64 — see module docstring for why 63-bit
        # hash ids make delta+varbyte strictly worse here
        "docs": doc_ids.astype("<i8", copy=False).tobytes(),
        "tfs": tfs_buf.tobytes(),
        "block_last_doc": block_last_doc.astype(np.int64),
        "block_max_tf": block_max_tf.astype(np.int32),
        "block_min_dl": np.minimum(block_min_dl, np.iinfo(np.int32).max).astype(np.int32),
        # byte offset of each block's first value — enables selective
        # (skip) decoding of individual blocks at query time
        "block_docs_off": (np.arange(nblk, dtype=np.int64) * (8 * block_size)),
        "block_tfs_off": tfs_starts[::block_size].astype(np.int64),
    }


def decode_blocks(
    row: dict, block_indices: np.ndarray, block_size: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the selected blocks of an encoded posting row.

    This is the skip-read primitive of the block-max query path: the
    ``docs`` payload is raw LE int64, so selected blocks are plain
    buffer views; the ``tfs`` varbyte stream is sliced at the stored
    per-block byte offsets and decoded in one vectorized pass.

    Returns (doc_ids:int64, tfs:int64) for the selected blocks in order.
    """
    sel = np.asarray(block_indices, dtype=np.int64)
    if sel.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    docs_off = np.asarray(row["block_docs_off"], dtype=np.int64)
    tfs_off = np.asarray(row["block_tfs_off"], dtype=np.int64)
    docs_buf = np.frombuffer(row["docs"], dtype=np.uint8)
    tfs_buf = np.frombuffer(row["tfs"], dtype=np.uint8)
    docs_end = np.append(docs_off[1:], len(docs_buf))
    tfs_end = np.append(tfs_off[1:], len(tfs_buf))

    docs = np.concatenate(
        [docs_buf[docs_off[b]: docs_end[b]] for b in sel]
    ).view("<i8").astype(np.int64, copy=False)
    tfs = varbyte_decode(
        np.concatenate([tfs_buf[tfs_off[b]: tfs_end[b]] for b in sel])
    ).astype(np.int64)
    return docs, tfs


def encode_posting_groups(
    docs: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    group_offsets: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode MANY posting lists in one vectorized pass.

    ``docs``/``tfs``/``dls`` are the concatenated entries of G groups;
    ``group_offsets`` (len G+1) delimits them.  Entries need not be
    sorted within a group — a single lexsort handles all groups at once.
    Returns columns (lists of length G) with the exact same per-group
    content as :func:`encode_posting`, verified by differential test.

    This exists because a per-group Python call (Ray ``map_groups``)
    costs ~10ms/group — fatal at vocabulary scale; here the whole block
    of groups is one numpy pipeline (sort, delta, varbyte, reduceat).
    """
    docs = np.asarray(docs, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    off = np.asarray(group_offsets, dtype=np.int64)
    ngroups = off.size - 1
    n = docs.size
    lens = np.diff(off)
    if n == 0:
        return {
            "df": [], "docs": [], "tfs": [], "block_last_doc": [],
            "block_max_tf": [], "block_min_dl": [],
            "block_docs_off": [], "block_tfs_off": [],
        }
    gid = np.repeat(np.arange(ngroups, dtype=np.int64), lens)
    order = np.lexsort((docs, gid))
    docs_s, tfs_s, dls_s = docs[order], tfs[order], dls[order]

    starts = off[:-1]
    nonstart = np.ones(n, dtype=bool)
    nonstart[starts] = False
    if np.any((docs_s[1:] == docs_s[:-1]) & nonstart[1:]):
        raise ValueError("duplicate doc_id within a posting group")

    tfs_buf, tfs_starts = _varbyte_encode_starts(tfs_s)
    tfs_starts_end = np.append(tfs_starts, len(tfs_buf))

    # block boundaries: every block_size-th entry within each group
    idx_within = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    bstart = np.flatnonzero(idx_within % block_size == 0)
    bgid = gid[bstart]
    group_end = off[1:][bgid]
    blast = np.minimum(bstart + block_size, group_end) - 1

    block_last_doc = docs_s[blast]
    block_max_tf = np.maximum.reduceat(tfs_s, bstart).astype(np.int32)
    block_min_dl = np.minimum(
        np.minimum.reduceat(dls_s, bstart), np.iinfo(np.int32).max
    ).astype(np.int32)
    # byte offsets relative to each group's slice of the buffers
    # (docs are raw fixed-width int64 → offset is 8 × index-in-group)
    bdocs_off = (bstart - starts[bgid]) * 8
    btfs_off = tfs_starts[bstart] - tfs_starts[starts[bgid]]

    nblocks = np.bincount(bgid, minlength=ngroups)
    boff = np.concatenate(([0], np.cumsum(nblocks)))

    docs_bytes = docs_s.astype("<i8", copy=False).tobytes()
    tfs_bytes = tfs_buf.tobytes()
    docs_col = [
        docs_bytes[int(off[g]) * 8: int(off[g + 1]) * 8]
        for g in range(ngroups)
    ]
    tfs_col = [
        tfs_bytes[int(tfs_starts[off[g]]): int(tfs_starts_end[off[g + 1]])]
        for g in range(ngroups)
    ]
    return {
        "df": lens.tolist(),
        "docs": docs_col,
        "tfs": tfs_col,
        "block_last_doc": [block_last_doc[boff[g]: boff[g + 1]].tolist() for g in range(ngroups)],
        "block_max_tf": [block_max_tf[boff[g]: boff[g + 1]].tolist() for g in range(ngroups)],
        "block_min_dl": [block_min_dl[boff[g]: boff[g + 1]].tolist() for g in range(ngroups)],
        "block_docs_off": [bdocs_off[boff[g]: boff[g + 1]].tolist() for g in range(ngroups)],
        "block_tfs_off": [btfs_off[boff[g]: boff[g + 1]].tolist() for g in range(ngroups)],
    }


def decode_posting(row: dict, block_size: int = BLOCK_SIZE) -> Posting:
    """Inverse of :func:`encode_posting` (block metadata passed through)."""
    doc_ids = np.frombuffer(row["docs"], dtype="<i8").astype(np.int64)
    tfs = varbyte_decode(row["tfs"]).astype(np.int64)
    return Posting(
        doc_ids=doc_ids,
        tfs=tfs,
        block_last_doc=np.asarray(row["block_last_doc"], dtype=np.int64),
        block_max_tf=np.asarray(row["block_max_tf"], dtype=np.int32),
        block_min_dl=np.asarray(row["block_min_dl"], dtype=np.int32),
    )
