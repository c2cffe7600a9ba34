"""1M-doc MinHash-LSH dedup smoke (reproducible version of the ad-hoc
round-2 run that produced ``BENCH_dedup1m_r2.json``).

Full distributed path: vectorized signature actor pool → 16M band rows
→ ``sort(band_key)`` exchange → run expansion → candidate-bounded
verification.  The synthetic corpus has no near-duplicates, so 0 pairs
is the correct output; the measurement is wall time and the absence of
any O(corpus) driver collect.

Usage: python tools/bench_dedup_1m.py  → BENCH_dedup1m_r3.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("GSR_DEDUP_N", 1_000_000))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   f"BENCH_dedup1m_r3.json")
SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from gazetteer_search_ray.pipelines.dedup import minhash_lsh_pairs
    from gazetteer_search_ray.sources.corpus import (
        read_corpus,
        write_synthetic_corpus,
    )

    corpus = f"{SCRATCH}/gsr_bench_corpus_{N_DOCS}"
    if not os.path.exists(os.path.join(corpus, "corpus-0063.parquet")):
        write_synthetic_corpus(corpus, n_docs=N_DOCS, n_files=64)
    ds = read_corpus(corpus).map_batches(
        lambda t: t.rename_columns(
            [c if c != "content" else "text" for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    t0 = time.monotonic()
    pairs = minhash_lsh_pairs(ds, threshold=0.5)
    dt = time.monotonic() - t0
    rec = {
        "metric": "dedup_minhash_1m_smoke",
        "docs": N_DOCS,
        "sec": round(dt, 1),
        "docs_per_sec": round(N_DOCS / dt, 1),
        "pairs": int(len(pairs)),
        "num_cpus": 32,
        "note": "vectorized signature path (Arrow shingles + reduceat minima) "
                "-> 16M band rows -> sort(band_key) -> run expansion; no "
                "O(corpus) driver collect; synthetic corpus has no near-dups "
                "so 0 pairs is correct",
    }
    print(json.dumps(rec))
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
