"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference's only dedup is first-wins distinct-by-name (M15/Q11);
training-data pipelines at 100 TB need the full family.  Design rules:

* signatures are computed per batch, fully vectorized (one blake2b per
  token via a cached vocabulary dict, then numpy for the permutations);
* candidate generation is a ``groupby(band_id, band_hash)`` shuffle of
  SMALL signature rows — document text never travels through the
  shuffle;
* candidate pairs are verified from the signatures (estimate) or, for
  :func:`ngram_jaccard_pairs`, exactly from broadcast shingle sets
  (``ray.put`` once — valid while the shingle table fits the object
  store; at larger scale verification becomes a doc_id-bucketed join).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = np.uint64((1 << 61) - 1)


def _stable_hash64(tokens: list[str]) -> np.ndarray:
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            for t in tokens
        ],
        dtype=np.uint64,
    )


def _shingles(text: str, n: int) -> list[str]:
    toks = (text or "").lower().split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def add_sha256(ds, text_col: str = "text", out_col: str = "sha256"):
    def f(t: pa.Table) -> pa.Table:
        hs = [
            hashlib.sha256((x or "").encode("utf-8", "surrogatepass")).hexdigest()
            for x in t[text_col].to_pylist()
        ]
        return t.append_column(out_col, pa.array(hs, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def dedup_exact(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Hash-partitioned exact dedup: keeper (min id) + group size per
    distinct content hash.  The groupby ships 80-byte hash rows, never
    the content."""
    from ray.data.aggregate import Count, Min

    hashed = add_sha256(ds.select_columns([id_col, text_col]), text_col)
    return (
        hashed.select_columns([id_col, "sha256"])
        .groupby("sha256")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="dup_count"))
    )


class MinHasher:
    """Per-batch MinHash signatures (actor state: permutation params)."""

    def __init__(self, num_perm: int = 64, shingle_n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n
        self.text_col = text_col
        self.id_col = id_col
        self._token_cache: dict[str, int] = {}

    def _sig(self, text: str) -> np.ndarray:
        sh = set(_shingles(text, self.shingle_n))
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.int64).max, dtype=np.uint64)
        cache = self._token_cache
        miss = [s for s in sh if s not in cache]
        if miss:
            for s, h in zip(miss, _stable_hash64(miss)):
                cache[s] = int(h)
        hs = np.array([cache[s] for s in sh], dtype=np.uint64)
        # universal hashing family (a*h + b) mod p, min per permutation
        vals = (hs[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        sigs = [self._sig(x) for x in t[self.text_col].to_pylist()]
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "sig": pa.array([s.astype(np.int64).tolist() for s in sigs],
                                 pa.list_(pa.int64())),
            }
        )


def minhash_signatures(ds, num_perm=64, shingle_n=3, text_col="text",
                       id_col="doc_id", concurrency: int = 2):
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, shingle_n=shingle_n,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _band_rows(sig_table: pa.Table, bands: int, id_col: str) -> pa.Table:
    """Explode signatures → (band_id, band_hash, doc_id) rows."""
    sigs = np.array(sig_table["sig"].to_pylist(), dtype=np.uint64)
    ids = sig_table[id_col].to_numpy()
    n, num_perm = sigs.shape
    rows_per = num_perm // bands
    band_ids = np.repeat(np.arange(bands, dtype=np.int32), n)
    doc_ids = np.tile(ids, bands)
    hashes = np.empty(bands * n, dtype=np.int64)
    for b in range(bands):
        chunk = sigs[:, b * rows_per : (b + 1) * rows_per]
        acc = np.zeros(n, dtype=np.uint64)
        for c in range(rows_per):
            acc = acc * np.uint64(1099511628211) + chunk[:, c]
        hashes[b * n : (b + 1) * n] = acc.astype(np.int64)
    return pa.table(
        {
            "band_id": pa.array(band_ids),
            "band_hash": pa.array(hashes),
            id_col: pa.array(doc_ids, pa.int64()),
        }
    )


def minhash_lsh_pairs(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    shingle → minhash → band → ``groupby(band_id, band_hash)`` bucket →
    pairs within bucket → estimate from full signatures → dedup pairs.
    Returns columns (doc_a, doc_b, est_jaccard), doc_a < doc_b.
    """
    import ray

    sigs = minhash_signatures(ds, num_perm, shingle_n, text_col, id_col)
    # signatures are small (num_perm * 8B per doc); broadcast for the
    # verification stage
    sig_tbl = sigs.to_pandas()
    sig_ref = ray.put(
        dict(zip(sig_tbl[id_col], [np.asarray(s, dtype=np.int64) for s in sig_tbl["sig"]]))
    )
    band_tbl = _band_rows(pa.Table.from_pandas(sig_tbl), bands, id_col)
    import ray.data as rd

    bands_ds = rd.from_arrow(band_tbl)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        if ids.size < 2 or ids.size > 1000:  # skip degenerate mega-buckets
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        ia, ib = np.triu_indices(ids.size, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    pairs = (
        bands_ds.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    pdf = pairs.to_pandas().drop_duplicates()
    if pdf.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "est_jaccard": pd.Series([], dtype="float64")})
    sig_map = ray.get(sig_ref)
    a = np.stack([sig_map[d] for d in pdf["doc_a"]])
    b = np.stack([sig_map[d] for d in pdf["doc_b"]])
    est = (a == b).mean(axis=1)
    pdf = pdf.assign(est_jaccard=est)
    pdf = pdf[pdf["est_jaccard"] >= threshold]
    return pdf.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


class SimHasher:
    """64-bit SimHash over token hashes (actor-pool stage)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._cache: dict[str, int] = {}

    def _hash(self, text: str) -> int:
        toks = (text or "").lower().split()
        if not toks:
            return 0
        cache = self._cache
        miss = [t for t in set(toks) if t not in cache]
        if miss:
            for t, h in zip(miss, _stable_hash64(miss)):
                cache[t] = int(h)
        hs = np.array([cache[t] for t in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, t: pa.Table) -> pa.Table:
        hs = [self._hash(x) for x in t[self.text_col].to_pylist()]
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "simhash": pa.array(np.array(hs, dtype=np.uint64).astype(np.int64)),
            }
        )


def simhash_pairs(ds, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", concurrency: int = 2):
    """Near-dup pairs by SimHash: 4×16-bit band grouping guarantees any
    pair with hamming ≤ 3 shares at least one exact band (pigeonhole);
    verify hamming within buckets.  Columns (doc_a, doc_b, hamming)."""
    sigs = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def explode(t: pa.Table) -> pa.Table:
        h = t["simhash"].to_numpy().astype(np.uint64)
        ids = t[id_col].to_numpy()
        out_band, out_key, out_id, out_h = [], [], [], []
        for b in range(4):
            out_band.append(np.full(h.size, b, dtype=np.int32))
            out_key.append(((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
            out_id.append(ids)
            out_h.append(h.astype(np.int64))
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(out_band)),
                "band_key": pa.array(np.concatenate(out_key)),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "simhash": pa.array(np.concatenate(out_h)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if ids.size < 2 or ids.size > 2000:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        ia, ib = np.triu_indices(ids.size, k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.array([bin(v).count("1") for v in x], dtype=np.int64)
        m = ham <= max_hamming
        return pd.DataFrame({"doc_a": ids[ia][m], "doc_b": ids[ib][m], "hamming": ham[m]})

    pairs = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    pdf = pairs.to_pandas().drop_duplicates(subset=["doc_a", "doc_b"])
    return pdf.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_pairs(
    ds,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
):
    """Exact n-gram Jaccard over MinHash-LSH candidates.

    Candidates from :func:`minhash_lsh_pairs` (low threshold), verified
    exactly against broadcast shingle sets.  Columns
    (doc_a, doc_b, jaccard ≥ threshold)."""
    import ray

    cands = minhash_lsh_pairs(
        ds, num_perm=num_perm, bands=bands, shingle_n=n,
        threshold=min(0.3, threshold), text_col=text_col, id_col=id_col,
    )
    sh_tbl = ds.select_columns([id_col, text_col]).to_pandas()
    shingle_map = {
        int(d): set(_shingles(t, n))
        for d, t in zip(sh_tbl[id_col], sh_tbl[text_col])
    }
    out_a, out_b, out_j = [], [], []
    for da, db in zip(cands["doc_a"], cands["doc_b"]):
        sa, sb = shingle_map[int(da)], shingle_map[int(db)]
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out_a.append(int(da))
            out_b.append(int(db))
            out_j.append(j)
    return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "jaccard": out_j})
