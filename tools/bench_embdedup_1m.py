"""1M-vector smoke for the LSH-bucketed embedding near-dup scan.

Round-2 finding #1: ``embedding_neardup_pairs`` was an exact all-pairs
block grid — O((N/B)^2) Ray tasks.  This benchmark drives the
>exact_limit LSH regime at 10^6 vectors (dim 64) with planted
duplicates and reports wall time + planted-pair recall, the analog of
``BENCH_dedup1m_r2.json`` for the embedding family.  Task count is
O(N·tables·planes/B) band-row work + one sort exchange — nothing
quadratic.

Usage: python tools/bench_embdedup_1m.py  → BENCH_embdedup1m_r3.json
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("GSR_EMB_N", 1_000_000))
D = 64
N_PLANTED = 2_000
THRESHOLD = 0.95
DATA = "/tmp/embdedup_bench.parquet"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH_embdedup1m_r3.json")


def generate() -> None:
    if os.path.exists(DATA):
        t = pq.read_metadata(DATA)
        if t.num_rows == N:
            return
    rng = np.random.default_rng(42)
    chunk = 100_000
    writer = None
    base = None  # first chunk rows reused for the planted duplicates
    half = N // 2
    for start in range(0, N, chunk):
        n = min(chunk, N - start)
        m = rng.standard_normal((n, D))
        if start == 0:
            base = m[:N_PLANTED].copy()
        # plant near-duplicates: rows [half, half+N_PLANTED) ≈ rows
        # [0, N_PLANTED) + small noise → cosine ≈ 0.9999
        lo, hi = max(half, start), min(half + N_PLANTED, start + n)
        if lo < hi:
            m[lo - start:hi - start] = (
                base[lo - half:hi - half]
                + rng.standard_normal((hi - lo, D)) * 0.01
            )
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(start, start + n), pa.int64()),
                "embedding": pa.array(m.tolist(), pa.list_(pa.float64())),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(DATA, t.schema)
        writer.write_table(t)
    writer.close()


def main() -> None:
    import ray
    import ray.data as rd

    generate()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from gazetteer_search_ray.pipelines.similarity import embedding_neardup_pairs

    ds = rd.read_parquet(DATA)
    t0 = time.monotonic()
    pairs = embedding_neardup_pairs(ds, threshold=THRESHOLD)  # auto planes
    dt = time.monotonic() - t0

    half = N // 2
    got = set(map(tuple, pairs[["vec_a", "vec_b"]].values.tolist()))
    planted_found = sum((i, half + i) in got for i in range(N_PLANTED))
    rec = {
        "n_vectors": N,
        "dim": D,
        "threshold": THRESHOLD,
        "planes": "auto (min(24, log2(N)+2))",
        "tables": 8,
        "sec": round(dt, 2),
        "pairs_found": int(len(pairs)),
        "planted": N_PLANTED,
        "planted_found": int(planted_found),
        "planted_recall": round(planted_found / N_PLANTED, 4),
        "note": "LSH regime of embedding_neardup_pairs: band rows through "
                "sort(bkey), candidate-bounded exact verify; no O((N/B)^2) grid",
    }
    print(json.dumps(rec))
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
