"""Postings codec fixtures (FIXTURES.md §5): roundtrip + block-max
invariants on empty / singleton / dense / random-gap / large lists."""

import numpy as np
import pytest

from gazetteer_search_ray.functions.codec import (
    BLOCK_SIZE,
    decode_posting,
    delta_decode,
    delta_encode,
    encode_posting,
    varbyte_decode,
    varbyte_encode,
)

rng = np.random.default_rng(42)

CASES = [
    np.array([], dtype=np.int64),
    np.array([0], dtype=np.int64),
    np.array([2**62], dtype=np.int64),
    np.arange(1000, dtype=np.int64),  # dense run
    np.cumsum(rng.integers(1, 10_000, size=5000)).astype(np.int64),  # random gaps
    np.cumsum(rng.integers(1, 3, size=10 * BLOCK_SIZE + 7)).astype(np.int64),
]


@pytest.mark.parametrize("ids", CASES, ids=range(len(CASES)))
def test_varbyte_roundtrip(ids):
    enc = varbyte_encode(ids)
    dec = varbyte_decode(enc)
    np.testing.assert_array_equal(dec.astype(np.int64), ids)


def test_varbyte_boundaries():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**63 - 1], dtype=np.uint64)
    np.testing.assert_array_equal(varbyte_decode(varbyte_encode(vals)), vals)


@pytest.mark.parametrize("ids", [c for c in CASES if c.size], ids=range(5))
def test_delta_roundtrip(ids):
    np.testing.assert_array_equal(delta_decode(delta_encode(ids)).astype(np.int64), ids)


def test_varbyte_smaller_than_raw():
    ids = np.cumsum(rng.integers(1, 50, size=100_000)).astype(np.int64)
    enc = varbyte_encode(delta_encode(ids))
    assert len(enc) < ids.nbytes / 4  # gaps <50 fit in 1 byte


def test_encode_posting_roundtrip_and_blocks():
    n = 5 * BLOCK_SIZE + 17
    doc_ids = np.cumsum(rng.integers(1, 100, size=n)).astype(np.int64)
    tfs = rng.integers(1, 30, size=n).astype(np.int64)
    dls = rng.integers(5, 500, size=n).astype(np.int64)
    # shuffle input — encoder must sort by doc_id
    perm = rng.permutation(n)
    row = encode_posting(doc_ids[perm], tfs[perm], dls[perm])
    assert row["df"] == n
    p = decode_posting(row)
    np.testing.assert_array_equal(p.doc_ids, doc_ids)
    np.testing.assert_array_equal(p.tfs, tfs)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(p.block_last_doc) == nblocks
    # block invariants: last_doc is the max doc in block; max_tf/min_dl bound the block
    for bi in range(nblocks):
        lo, hi = bi * BLOCK_SIZE, min((bi + 1) * BLOCK_SIZE, n)
        assert p.block_last_doc[bi] == doc_ids[hi - 1]
        assert p.block_max_tf[bi] == tfs[lo:hi].max()
        assert p.block_min_dl[bi] == dls[lo:hi].min()


def test_encode_posting_rejects_duplicates():
    with pytest.raises(ValueError):
        encode_posting(
            np.array([1, 1, 2]), np.array([1, 1, 1]), np.array([3, 3, 3])
        )


def test_empty_posting():
    row = encode_posting(np.array([]), np.array([]), np.array([]))
    p = decode_posting(row)
    assert p.doc_ids.size == 0 and row["df"] == 0


def test_decode_blocks_selective():
    from gazetteer_search_ray.functions.codec import decode_blocks

    n = 7 * BLOCK_SIZE + 13
    doc_ids = np.cumsum(rng.integers(1, 1000, size=n)).astype(np.int64)
    tfs = rng.integers(1, 99, size=n).astype(np.int64)
    dls = rng.integers(1, 400, size=n).astype(np.int64)
    row = encode_posting(doc_ids, tfs, dls)
    # every subset of blocks decodes to exactly the right slice
    for sel in ([0], [7], [1, 3], [0, 2, 7], list(range(8))):
        d, t = decode_blocks(row, np.array(sel))
        exp_d = np.concatenate(
            [doc_ids[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE] for b in sel]
        )
        exp_t = np.concatenate(
            [tfs[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE] for b in sel]
        )
        np.testing.assert_array_equal(d, exp_d)
        np.testing.assert_array_equal(t, exp_t)


def test_encode_posting_groups_differential():
    """encode_posting_groups must byte-match per-group encode_posting."""
    from gazetteer_search_ray.functions.codec import encode_posting_groups

    r = np.random.default_rng(3)
    lens = [1, 5, BLOCK_SIZE, BLOCK_SIZE + 1, 700, 2]
    docs_l, tfs_l, dls_l = [], [], []
    for L in lens:
        ids = np.cumsum(r.integers(1, 500, size=L)).astype(np.int64)
        perm = r.permutation(L)  # groups arrive unsorted
        docs_l.append(ids[perm])
        tfs_l.append(r.integers(1, 20, size=L).astype(np.int64)[perm])
        dls_l.append(r.integers(1, 300, size=L).astype(np.int64)[perm])
    off = np.concatenate(([0], np.cumsum(lens)))
    out = encode_posting_groups(
        np.concatenate(docs_l), np.concatenate(tfs_l), np.concatenate(dls_l), off
    )
    for g, L in enumerate(lens):
        exp = encode_posting(docs_l[g], tfs_l[g], dls_l[g])
        assert out["df"][g] == exp["df"] == L
        assert out["docs"][g] == exp["docs"]
        assert out["tfs"][g] == exp["tfs"]
        for k in ("block_last_doc", "block_max_tf", "block_min_dl",
                  "block_docs_off", "block_tfs_off"):
            np.testing.assert_array_equal(out[k][g], np.asarray(exp[k]))


def test_encode_posting_groups_rejects_dup():
    from gazetteer_search_ray.functions.codec import encode_posting_groups

    with pytest.raises(ValueError):
        encode_posting_groups(
            np.array([1, 1]), np.array([1, 1]), np.array([2, 2]), np.array([0, 2])
        )


def test_varbyte_rows_roundtrip():
    """Per-row varbyte payloads (the slim partial-postings encoding):
    random row shapes incl. empty rows, with and without delta."""
    from gazetteer_search_ray.stages.tokenize import (
        varbyte_flat_from_binary_col,
        varbyte_rows,
    )

    r = np.random.default_rng(9)
    for trial in range(5):
        lens = r.integers(0, 40, size=30)
        lens[r.integers(0, 30)] = 0  # force an empty row
        off = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        flat = r.integers(0, 2**40, size=int(lens.sum())).astype(np.int64)
        col = varbyte_rows(flat, off)
        got, cnt = varbyte_flat_from_binary_col(col)
        np.testing.assert_array_equal(got, flat)
        np.testing.assert_array_equal(cnt, lens)
        # delta mode needs strictly increasing rows
        parts = [np.cumsum(r.integers(1, 2**33, size=n)).astype(np.int64)
                 for n in lens]
        flat2 = np.concatenate(parts) if parts else np.empty(0, np.int64)
        col2 = varbyte_rows(flat2, off, delta=True)
        got2, cnt2 = varbyte_flat_from_binary_col(col2, delta=True)
        np.testing.assert_array_equal(got2, flat2)
        np.testing.assert_array_equal(cnt2, lens)


def test_varbyte_rows_sliced_column():
    """Decode must respect Arrow array offsets (sliced blocks)."""
    from gazetteer_search_ray.stages.tokenize import (
        varbyte_flat_from_binary_col,
        varbyte_rows,
    )

    flat = np.arange(1, 101, dtype=np.int64) * 7
    off = np.arange(0, 101, 10, dtype=np.int64)
    col = varbyte_rows(flat, off)
    tbl = __import__("pyarrow").table({"x": col}).slice(3, 4)
    got, cnt = varbyte_flat_from_binary_col(tbl["x"])
    np.testing.assert_array_equal(got, flat[30:70])
    np.testing.assert_array_equal(cnt, [10, 10, 10, 10])
