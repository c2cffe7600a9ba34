"""Round-5 scale smokes for the reworked distributed operators.

* union_find_labels_distributed over 10^7 planted pairs (mixed
  2-cliques and 10-node chains) — the star-contraction rewrite; the
  round-4 label-propagation design took 2,671 s on the same input.
* ngram_jaccard_pairs over a planted corpus producing ≥10^5 MinHash
  candidate pairs — the verify stage now runs inside map_batches
  workers (two hash joins attach the shingle sets); the driver holds
  only candidate ids and the final thresholded rows.

Prints one JSON line; recorded as BENCH_newops1m_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    out: dict = {"metric": "newops_scale_smoke_r5"}

    # -- distributed union-find (star contraction), 10^7 pairs ------------
    from gazetteer_search_ray.pipelines.dedup import (
        union_find_labels_distributed,
    )

    n_pairs = 10_000_000
    n_clique_pairs = int(n_pairs * 0.9)

    def gen_pairs(b):
        ids = np.asarray(b["id"], dtype=np.int64)
        a = np.empty(ids.size, dtype=np.int64)
        bb = np.empty(ids.size, dtype=np.int64)
        cl = ids < n_clique_pairs  # 2-cliques: (2i, 2i+1)
        a[cl] = ids[cl] * 2
        bb[cl] = ids[cl] * 2 + 1
        ch = ~cl                   # 10-node chains in a disjoint id space
        j = ids[ch] - n_clique_pairs
        chain, off = j // 9, j % 9
        a[ch] = 10**9 + chain * 10 + off
        bb[ch] = 10**9 + chain * 10 + off + 1
        return pa.table({"a": a, "b": bb})

    pairs = rd.range(n_pairs).map_batches(gen_pairs, batch_format="pyarrow")
    t0 = time.monotonic()
    labels = union_find_labels_distributed(pairs).materialize()
    n_nodes = labels.count()
    dt = time.monotonic() - t0
    df = labels.filter(lambda r: r["doc_id"] >= 10**9).limit(50).to_pandas()
    chains_ok = bool(
        (((df["cluster_id"].to_numpy() - 10**9) % 10) == 0).all()
    )
    out["union_find_10m_pairs"] = {
        "sec": round(dt, 1),
        "nodes": int(n_nodes),
        "chain_labels_ok": chains_ok,
        "r4_label_propagation_sec": 2671.0,
    }
    print(json.dumps({"union_find_10m_pairs": out["union_find_10m_pairs"]}),
          flush=True)

    # -- distributed ngram-Jaccard verify, ≥10^5 candidate pairs ----------
    from gazetteer_search_ray.pipelines.dedup import ngram_jaccard_pairs

    n_groups = 120_000  # identical doc pairs → ≥1.2e5 LSH candidates
    vocab = [f"tok{i}" for i in range(400)]

    def gen_docs(b):
        ids = np.asarray(b["id"], dtype=np.int64)
        rngs = [np.random.default_rng(int(i) // 2) for i in ids]
        texts = [" ".join(r.choice(vocab, size=12)) for r in rngs]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    docs = rd.range(n_groups * 2).map_batches(
        gen_docs, batch_format="pyarrow", batch_size=8192
    )
    t0 = time.monotonic()
    pairs_df = ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    dt = time.monotonic() - t0
    exact = int((pairs_df["jaccard"] >= 0.999).sum())
    out["ngram_verify_100k_pairs"] = {
        "sec": round(dt, 1),
        "verified_pairs": int(len(pairs_df)),
        "exact_dup_pairs": exact,
    }
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
