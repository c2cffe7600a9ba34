"""Similarity search over an embedding column (list<float>).

* :func:`ann_topk_bruteforce` — exact cosine top-k: per-batch numpy
  matmul against a broadcast query matrix (``ray.put`` once, read in
  every task), per-batch partial top-k, tiny final merge.  The baseline
  and the oracle-checkable path.
* :func:`ann_topk_lsh` — random-hyperplane LSH bucketing: candidates
  share a bucket with the query (multi-probe over 1-bit flips), exact
  cosine within candidates.  The scale path: each query touches a few
  buckets instead of every row.
* :func:`embedding_neardup_pairs` — all-pairs cosine ≥ threshold via
  per-batch matmul against the broadcast (normalized) matrix, upper
  triangle only.
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


def ann_topk_bruteforce(ds, query_vecs: np.ndarray, k: int = 10,
                        vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k for each query row. Returns a pandas frame
    (qid, rank, vec_id, cosine) with ties broken (cos desc, vec_id asc)."""
    import ray

    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(q)

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)  # broadcast once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy()
            sims = m @ self.q.T  # (B, Q)
            nq = self.q.shape[0]
            kk = min(k, m.shape[0])
            out = {"qid": [], "vec_id": [], "cosine": []}
            for qi in range(nq):
                s = sims[:, qi]
                part = np.argpartition(-s, kk - 1)[:kk] if s.size > kk else np.arange(s.size)
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

    partials = ds.map_batches(Score, batch_format="pyarrow", concurrency=2).to_pandas()
    out = []
    for qi, g in partials.groupby("qid"):
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else partials.assign(rank=[])
    return res[["qid", "rank", "vec_id", "cosine"]]


def ann_topk_lsh(ds, query_vecs: np.ndarray, k: int = 10, planes: int = 8,
                 vec_col: str = "embedding", id_col: str = "vec_id", seed: int = 11,
                 multiprobe: int = 1):
    """Approximate cosine top-k via random-hyperplane buckets.

    Index side: one pass assigns each vector its LSH bucket
    (``map_batches``); query side probes the query's bucket plus all
    1-bit-flip neighbors (multiprobe), scoring candidates exactly.
    """
    rng = np.random.default_rng(seed)
    q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    dim = q.shape[1]
    H = rng.standard_normal((dim, planes))

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

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    qbits = (q @ H) > 0
    qbuckets = (qbits @ (1 << np.arange(planes))).astype(np.int64)
    probe: set[int] = set()
    for qb in qbuckets.tolist():
        probe.add(qb)
        if multiprobe >= 1:
            for p in range(planes):
                probe.add(qb ^ (1 << p))
    import pyarrow.compute as pc

    cand = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=pa.array(sorted(probe)))),
        batch_format="pyarrow",
    ).to_pandas()
    if cand.empty:
        return pd.DataFrame({"qid": [], "rank": [], "vec_id": [], "cosine": []})
    m = _normalize(np.array(cand[vec_col].tolist(), dtype=np.float64))
    ids = cand[id_col].to_numpy()
    sims = m @ q.T
    out = []
    for qi in range(q.shape[0]):
        s = sims[:, qi]
        order = np.lexsort((ids, -s))[:k]
        out.append(
            pd.DataFrame(
                {
                    "qid": qi,
                    "rank": np.arange(1, order.size + 1),
                    "vec_id": ids[order],
                    "cosine": s[order],
                }
            )
        )
    return pd.concat(out, ignore_index=True)


def embedding_neardup_pairs(ds, threshold: float = 0.95,
                            vec_col: str = "embedding", id_col: str = "vec_id"):
    """All pairs with cosine ≥ threshold (doc_a < doc_b).

    Each batch multiplies against the broadcast normalized matrix —
    O(N·B·d) flops distributed across tasks; at larger N swap the
    broadcast side for LSH buckets (see :func:`ann_topk_lsh`).
    """
    import ray

    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy()
    m_all = _normalize(np.array(full[vec_col].tolist(), dtype=np.float64))
    ref = ray.put((ids_all, m_all))

    class Pairs:
        def __init__(self):
            self.ids_all, self.m_all = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_emb_matrix(batch, vec_col))
            ids = batch[id_col].to_numpy()
            sims = m @ self.m_all.T
            bi, aj = np.nonzero(sims >= threshold)
            a = ids[bi]
            b = self.ids_all[aj]
            keep = a < b  # upper triangle, no self pairs
            return pa.table(
                {
                    "vec_a": pa.array(a[keep], pa.int64()),
                    "vec_b": pa.array(b[keep], pa.int64()),
                    "cosine": pa.array(sims[bi, aj][keep], pa.float64()),
                }
            )

    res = ds.map_batches(Pairs, batch_format="pyarrow", concurrency=2).to_pandas()
    return res.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


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

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(cent)
        counts = np.zeros(cent.shape[0])
        for _, row in parts.iterrows():
            sums[row["cluster"]] += np.asarray(row["sum"])
            counts[row["cluster"]] += row["count"]
        nonzero = counts > 0
        cent[nonzero] = _normalize(sums[nonzero] / counts[nonzero, None])
    return cent


def ann_topk_ivf(ds, query_vecs: np.ndarray, k: int = 10, n_clusters: int = 16,
                 nprobe: int = 4, vec_col: str = "embedding",
                 id_col: str = "vec_id", seed: int = 13):
    """IVF ANN: cluster the corpus (k-means), probe the ``nprobe``
    nearest centroids per query, score candidates exactly.  The scale
    path: each query touches ~nprobe/n_clusters of the corpus."""
    import pyarrow.compute as pc
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

    cand = ds.map_batches(assign_and_filter, batch_format="pyarrow").to_pandas()
    if cand.empty:
        return pd.DataFrame({"qid": [], "rank": [], "vec_id": [], "cosine": []})
    m = _normalize(np.array(cand[vec_col].tolist(), dtype=np.float64))
    ids = cand[id_col].to_numpy()
    clusters = cand["cluster"].to_numpy()
    out = []
    for qi in range(q.shape[0]):
        mask = np.isin(clusters, probe[qi])
        s = m[mask] @ q[qi]
        cids = ids[mask]
        order = np.lexsort((cids, -s))[:k]
        out.append(
            pd.DataFrame(
                {
                    "qid": qi,
                    "rank": np.arange(1, order.size + 1),
                    "vec_id": cids[order],
                    "cosine": s[order],
                }
            )
        )
    return pd.concat(out, ignore_index=True)
