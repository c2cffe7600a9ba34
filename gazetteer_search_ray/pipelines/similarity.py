"""Similarity search over an embedding column (list<float>).

* :func:`ann_topk_bruteforce` — exact cosine top-k: per-batch numpy
  matmul against a broadcast query matrix (``ray.put`` once, read in
  every task), per-batch partial top-k, tiny final merge.  The baseline
  and the oracle-checkable path.
* :func:`ann_topk_lsh` — random-hyperplane LSH bucketing: candidates
  share a bucket with the query (multi-probe over 1-bit flips), scored
  distributed like the brute force but over the probed fraction only.
  ``build_lsh_index`` persists the bucket assignment as
  bucket-partitioned parquet so repeated query sets read only their
  probed buckets (partition-pruned ``read_parquet``).
* :func:`embedding_neardup_pairs` — all pairs with cosine ≥ threshold,
  EXACT, via blocked pairwise matmul: the corpus is normalized into
  object-store blocks once and every block pair (i ≤ j) is one Ray
  task holding just two blocks — O(N²/P) flops per task, O(N·d/B)
  memory per task, nothing O(N) on the driver.  (The Dataset API has
  no self-cross-product, so this is one of the documented raw-task
  escapes; partitioning assumption: a single block pair fits a worker.)
* :func:`ann_topk_ivf` — IVF: distributed Lloyd k-means (per-batch
  (sum,count) partials against broadcast centroids), candidates
  filtered to the probed clusters and scored distributed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def _list_array(m: np.ndarray) -> pa.ListArray:
    """(n, d) float matrix → Arrow list<float64> without a Python-list
    round trip (``m.tolist()`` costs ~100× at block scale)."""
    n, d = m.shape
    return pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
        pa.array(np.ascontiguousarray(m, dtype=np.float64).ravel()),
    )


def _merge_partial_topk(partials: pd.DataFrame, q_count: int, k: int) -> pd.DataFrame:
    """Driver-side merge of per-batch partial top-ks (≤ batches×Q×k
    rows — bounded by the plan, not the corpus)."""
    out = []
    for qi in range(q_count):
        g = partials[partials["qid"] == qi]
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    if not out:
        return pd.DataFrame({"qid": [], "rank": [], "vec_id": [], "cosine": []})
    res = pd.concat(out, ignore_index=True)
    return res[["qid", "rank", "vec_id", "cosine"]]


def _scored_partials(ds, q: np.ndarray, k: int, vec_col: str, id_col: str,
                     probe_clusters: np.ndarray | None = None,
                     cluster_col: str = "cluster") -> pd.DataFrame:
    """Distributed scoring stage shared by brute-force / LSH / IVF:
    each batch multiplies against the broadcast query matrix and emits
    its per-query partial top-k.  With ``probe_clusters`` (Q × nprobe),
    a candidate only scores for queries probing its cluster."""
    import ray

    q_ref = ray.put(q)
    probe_ref = ray.put(probe_clusters)

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)  # broadcast once per actor
            self.probe = ray.get(probe_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"qid": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            m = _normalize(_emb_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy()
            sims = m @ self.q.T  # (B, Q)
            if self.probe is not None:
                cl = batch[cluster_col].to_numpy()
                for qi in range(self.q.shape[0]):
                    sims[~np.isin(cl, self.probe[qi]), qi] = -np.inf
            nq = self.q.shape[0]
            kk = min(k, m.shape[0])
            out = {"qid": [], "vec_id": [], "cosine": []}
            for qi in range(nq):
                s = sims[:, qi]
                part = np.argpartition(-s, kk - 1)[:kk] if s.size > kk else np.arange(s.size)
                part = part[np.isfinite(s[part])]
                out["qid"].extend([qi] * part.size)
                out["vec_id"].extend(ids[part].tolist())
                out["cosine"].extend(s[part].tolist())
            return pa.table(
                {
                    "qid": pa.array(out["qid"], pa.int64()),
                    "vec_id": pa.array(out["vec_id"], pa.int64()),
                    "cosine": pa.array(out["cosine"], pa.float64()),
                }
            )

    return ds.map_batches(Score, batch_format="pyarrow", concurrency=2).to_pandas()


def ann_topk_bruteforce(ds, query_vecs: np.ndarray, k: int = 10,
                        vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k for each query row. Returns a pandas frame
    (qid, rank, vec_id, cosine) with ties broken (cos desc, vec_id asc)."""
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    partials = _scored_partials(ds, q, k, vec_col, id_col)
    return _merge_partial_topk(partials, q.shape[0], k)


def _lsh_planes(dim: int, planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, planes))


def _bucketize_fn(H: np.ndarray, planes: int, vec_col: str, id_col: str):
    def bucketize(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, vec_col))
        bits = (m @ H) > 0
        bucket = (bits @ (1 << np.arange(planes))).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(bucket),
                vec_col: batch[vec_col],
            }
        )

    return bucketize


def build_lsh_index(ds, path: str, planes: int = 8, vec_col: str = "embedding",
                    id_col: str = "vec_id", seed: int = 11) -> str:
    """Persist the LSH bucket assignment as bucket-partitioned parquet.

    One directory per bucket value → a query-time read touches only the
    probed partitions (partition-pruned ``read_parquet``), the on-disk
    analog of a bucket hash table.  Plane params are derived from
    (dim, planes, seed), so queries regenerate them deterministically.
    """
    first = ds.limit(1).to_pandas()
    dim = len(first[vec_col].iloc[0])
    H = _lsh_planes(dim, planes, seed)
    ds.map_batches(
        _bucketize_fn(H, planes, vec_col, id_col), batch_format="pyarrow"
    ).write_parquet(path, partition_cols=["bucket"])
    return path


def ann_topk_lsh(ds, query_vecs: np.ndarray, k: int = 10, planes: int = 8,
                 vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 11,
                 multiprobe: int | str = 1, index_path: str | None = None):
    """Approximate cosine top-k via random-hyperplane buckets.

    Candidates = rows in a query's bucket or any 1-bit-flip neighbor
    (multiprobe), scored exactly through the distributed partial-top-k
    stage.  With ``index_path`` (from :func:`build_lsh_index`) the scan
    reads only the probed bucket partitions instead of bucketizing the
    corpus per query set.

    ``multiprobe="all"`` probes every bucket — the result is then
    rank-identical to :func:`ann_topk_bruteforce` *iff* the bucket
    partition neither drops nor duplicates vectors, which is exactly
    what the driver's SQL oracle checks; approximation quality of the
    1-probe configuration is covered by the recall pytest.
    """
    import pyarrow.compute as pc

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    dim = q.shape[1]
    H = _lsh_planes(dim, planes, seed)
    qbits = (q @ H) > 0
    qbuckets = (qbits @ (1 << np.arange(planes))).astype(np.int64)
    probe: set[int] = set()
    if multiprobe == "all":
        probe.update(range(1 << planes))
    else:
        for qb in qbuckets.tolist():
            probe.add(qb)
            if multiprobe >= 1:
                for p in range(planes):
                    probe.add(qb ^ (1 << p))
    probe_arr = sorted(probe)

    if index_path is not None:
        import os

        import ray.data as rd

        # explicit partition pruning: only the probed bucket directories
        # are ever opened (the on-disk bucket table is hive-partitioned
        # by ``build_lsh_index``)
        import glob

        paths = [
            f
            for b in probe_arr
            for f in sorted(
                glob.glob(os.path.join(index_path, f"bucket={b}", "*.parquet"))
            )
        ]
        if not paths:
            return pd.DataFrame({"qid": [], "rank": [], "vec_id": [], "cosine": []})
        cand = rd.read_parquet(paths)
    else:
        bucketed = ds.map_batches(
            _bucketize_fn(H, planes, vec_col, id_col), batch_format="pyarrow"
        )
        cand = bucketed.map_batches(
            lambda t: t.filter(pc.is_in(t["bucket"], value_set=pa.array(probe_arr))),
            batch_format="pyarrow",
        )
    partials = _scored_partials(cand, q, k, vec_col, id_col)
    return _merge_partial_topk(partials, q.shape[0], k)


def embedding_neardup_pairs(ds, threshold: float = 0.95,
                            vec_col: str = "embedding", id_col: str = "vec_id",
                            block_rows: int = 8192,
                            exact_limit: int = 100_000,
                            planes: int | None = None, tables: int = 8,
                            seed: int = 11):
    """All pairs with cosine ≥ threshold (vec_a < vec_b).

    Two regimes:

    * ≤ ``exact_limit`` rows — EXACT blocked pairwise matmul (the
      oracle-checkable contract; every block pair is one Ray task).
    * above it — multi-table hyperplane LSH pre-bucket: ``tables``
      independent ``planes``-bit bucketings; each vector emits one
      16-byte ``(band_key, id)`` row per table (exact-bucket matching —
      NO neighbor-bucket replication, which would multiply bucket
      occupancy and blow candidate pairs up quadratically).  The rows
      go through the SAME distributed ``sort(band_key)`` + vectorized
      run-expansion shuffle as MinHash dedup
      (``dedup._pairs_from_band_rows``); candidates are then verified
      with exact cosines over a candidate-bounded vector gather.  Task
      count is O(N·tables / block) — not O((N/B)²) — and driver memory
      is O(candidate pairs).  Reported pairs are exact (every cosine is
      re-computed, so precision is 1); recall for a pair at angle θ is
      1 − (1 − (1 − θ/π)^planes)^tables — near-identical duplicates
      (θ≈0) are found with probability ≈ 1, pairs exactly AT a loose
      threshold may be missed; raise ``tables`` (linear cost) to push
      recall up.  Planted-dup recall is pytest-checked.
    """
    import ray

    n_rows = ds.count()
    if n_rows > exact_limit:
        if planes is None:
            # bucket count ≥ corpus size keeps expected occupancy ~1 and
            # candidate volume ~N·tables instead of quadratic-in-bucket
            planes = int(min(24, max(16, np.ceil(np.log2(max(n_rows, 2))) + 2)))
        return _embedding_neardup_lsh(
            ds, threshold, vec_col, id_col,
            planes=planes, tables=tables, seed=seed,
        )

    def norm_block(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, vec_col))
        return pa.table(
            {
                id_col: batch[id_col],
                "nvec": _list_array(m),
            }
        )

    norm = ds.select_columns([id_col, vec_col]).map_batches(
        norm_block, batch_format="pyarrow", batch_size=block_rows
    )
    refs = norm.to_arrow_refs()

    @ray.remote
    def block_pair(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        if ta.num_rows == 0 or tb.num_rows == 0:
            return pa.table({"vec_a": pa.array([], pa.int64()),
                             "vec_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        ma = _emb_matrix(ta, "nvec")
        mb = _emb_matrix(tb, "nvec")
        ia = ta[id_col].to_numpy()
        ib = tb[id_col].to_numpy()
        sims = ma @ mb.T
        ai, bj = np.nonzero(sims >= threshold)
        a, b = ia[ai], ib[bj]
        # same-block: each unordered pair shows up twice (and self pairs
        # on the diagonal) → keep the a<b half.  Cross-block: blocks are
        # disjoint row sets, each unordered pair appears exactly once —
        # keep everything and normalize the id order.
        keep = (a < b) if same else np.ones(a.size, dtype=bool)
        return pa.table(
            {
                "vec_a": pa.array(np.minimum(a, b)[keep], pa.int64()),
                "vec_b": pa.array(np.maximum(a, b)[keep], pa.int64()),
                "cosine": pa.array(sims[ai, bj][keep], pa.float64()),
            }
        )

    futs = []
    for i in range(len(refs)):
        for j in range(i, len(refs)):
            futs.append(block_pair.remote(refs[i], refs[j], i == j))
    parts = [t.to_pandas() for t in ray.get(futs)]
    if not parts:
        return pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                             "vec_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    res = pd.concat(parts, ignore_index=True)
    # i==j diagonal task already emits a<b only; cross tasks may emit a
    # pair once from (i,j) — pairs are unique by construction, just sort
    return res.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


def _embedding_neardup_lsh(ds, threshold: float, vec_col: str, id_col: str,
                           planes: int = 16, tables: int = 8, seed: int = 11,
                           max_bucket: int = 4000):
    """LSH-bucketed near-dup pair scan (the >exact_limit regime of
    :func:`embedding_neardup_pairs`); see its docstring for the shape.
    """
    import ray

    from .dedup import _gather_rows, _pairs_from_band_rows

    first = ds.limit(1).to_pandas()
    dim = len(first[vec_col].iloc[0])
    rng = np.random.default_rng(seed)
    # one independent hyperplane set per table
    H = rng.standard_normal((tables, dim, planes))
    H_ref = ray.put(H)
    shifts = 1 << np.arange(planes)

    def norm_block(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch, vec_col))
        return pa.table(
            {
                id_col: batch[id_col],
                "nvec": _list_array(m),
            }
        )

    norm = ds.select_columns([id_col, vec_col]).map_batches(
        norm_block, batch_format="pyarrow"
    ).materialize()

    def emit_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"bkey": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        planes_mats = ray.get(H_ref)
        m = _emb_matrix(batch, "nvec")
        ids = batch[id_col].to_numpy().astype(np.int64)
        out_k, out_i = [], []
        for t in range(tables):
            bits = (m @ planes_mats[t]) > 0
            bkt = (bits @ shifts).astype(np.int64)
            out_k.append((np.int64(t) << np.int64(planes + 1)) | bkt)
            out_i.append(ids)
        return pa.table(
            {
                "bkey": pa.array(np.concatenate(out_k)),
                "doc_id": pa.array(np.concatenate(out_i)),
            }
        )

    band_ds = norm.map_batches(emit_bands, batch_format="pyarrow")
    pairs = _pairs_from_band_rows(band_ds, max_bucket=max_bucket)

    empty = pd.DataFrame({"vec_a": pd.Series([], dtype="int64"),
                          "vec_b": pd.Series([], dtype="int64"),
                          "cosine": pd.Series([], dtype="float64")})
    if pairs.size == 0:
        return empty

    cand = _gather_rows(norm, id_col, pairs.ravel(), [id_col, "nvec"])
    cand_ids = cand[id_col].to_numpy(np.int64)
    order = np.argsort(cand_ids)
    cand_ids = cand_ids[order]
    mat = np.array(cand["nvec"].tolist(), dtype=np.float64)[order]
    ia = np.searchsorted(cand_ids, pairs[:, 0])
    ib = np.searchsorted(cand_ids, pairs[:, 1])
    cos = np.einsum("ij,ij->i", mat[ia], mat[ib])
    keep = cos >= threshold
    return (
        pd.DataFrame({"vec_a": pairs[keep, 0], "vec_b": pairs[keep, 1],
                      "cosine": cos[keep]})
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )


def ivf_train(ds, n_clusters: int = 16, iters: int = 5,
              vec_col: str = "embedding", seed: int = 13) -> np.ndarray:
    """Deterministic mini k-means for IVF: Lloyd iterations where each
    batch emits partial (sum, count) per cluster against broadcast
    centroids — one pass over the data per iteration, no shuffle of
    vectors (the partials are n_clusters × dim floats per batch)."""
    import ray

    first = ds.limit(n_clusters).to_pandas()
    cent = _normalize(np.array(first[vec_col].tolist(), dtype=np.float64))
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _normalize(_emb_matrix(batch, vec_col))
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=c.shape[0])
            return pa.table(
                {
                    "cluster": pa.array(np.arange(c.shape[0]), pa.int32()),
                    "sum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                    "count": pa.array(counts.astype(np.int64)),
                }
            )

        sums = np.zeros_like(cent)
        counts = np.zeros(cent.shape[0])
        for t in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow", batch_size=None):
            if t.num_rows == 0:
                continue
            cl = t["cluster"].to_numpy()
            np.add.at(sums, cl,
                      np.asarray(t["sum"].to_pylist(), dtype=np.float64))
            np.add.at(counts, cl, t["count"].to_numpy())
        nonzero = counts > 0
        cent[nonzero] = _normalize(sums[nonzero] / counts[nonzero, None])
    return cent


def ann_topk_ivf(ds, query_vecs: np.ndarray, k: int = 10, n_clusters: int = 16,
                 nprobe: int = 4, vec_col: str = "embedding",
                 id_col: str = "vec_id", seed: int = 13):
    """IVF ANN: cluster the corpus (k-means), probe the ``nprobe``
    nearest centroids per query, score candidates through the
    distributed partial-top-k stage (per-query probe mask applied
    inside the scoring actors — candidate embeddings never collect on
    the driver)."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    cent = ivf_train(ds, n_clusters=n_clusters, seed=seed, vec_col=vec_col)
    cent_ref = ray.put(cent)
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]
    wanted = np.unique(probe)

    def assign_and_filter(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_emb_matrix(batch, vec_col))
        a = np.argmax(m @ c.T, axis=1)
        keep = np.isin(a, wanted)
        return pa.table(
            {
                id_col: batch[id_col].filter(pa.array(keep)),
                vec_col: batch[vec_col].filter(pa.array(keep)),
                "cluster": pa.array(a[keep].astype(np.int32)),
            }
        )

    cand = ds.map_batches(assign_and_filter, batch_format="pyarrow")
    partials = _scored_partials(cand, q, k, vec_col, id_col,
                                probe_clusters=probe)
    return _merge_partial_topk(partials, q.shape[0], k)
