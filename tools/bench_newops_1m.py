"""1M-doc smoke for the round-3 operators: decontamination, Misra-Gries
top-k, and near-dup clustering over the synthetic code corpus — proves
the streaming/broadcast shapes hold at 25× the bench corpus (no
driver-side corpus materialization, no scale cliffs).

Usage: python tools/bench_newops_1m.py [corpus_dir]
Prints one JSON line; writes nothing to the repo.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/gsr_corpus_1m"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from gazetteer_search_ray.sources.corpus import read_corpus

    def docs():
        # corpus schema -> (doc_id, text); doc ids assigned by the reader
        return read_corpus(corpus).map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"],
                                "text": pc.cast(t["content"], pa.string())}),
            batch_format="pyarrow",
        )

    out = {"corpus": corpus, "n_docs": 1_000_000}

    # --- decontamination: 1/97th of the corpus plays the eval set ----
    from gazetteer_search_ray.pipelines.contamination import (
        contamination_report, eval_shingle_hashes)

    def split(is_eval):
        def f(t):
            ids = t["doc_id"].to_numpy()
            m = (ids % 97) == 0
            return t.filter(pa.array(m if is_eval else ~m))
        return docs().map_batches(f, batch_format="pyarrow")

    t0 = time.monotonic()
    ev_h = eval_shingle_hashes(split(True), n=3)
    t_ev = time.monotonic() - t0
    t0 = time.monotonic()
    rep = contamination_report(split(False), ev_h, n=3)
    n_contam = sum(b.num_rows for b in rep.iter_batches(
        batch_format="pyarrow", batch_size=None))
    t_rep = time.monotonic() - t0
    out["decontam"] = {"eval_hashes": int(ev_h.size),
                       "eval_s": round(t_ev, 1),
                       "scan_s": round(t_rep, 1),
                       "contaminated_docs": int(n_contam)}

    # --- Misra-Gries top-k tokens ------------------------------------
    from gazetteer_search_ray.pipelines.textstats import top_tokens

    t0 = time.monotonic()
    tt = top_tokens(docs(), k=20, capacity=50_000)
    out["top_tokens"] = {"s": round(time.monotonic() - t0, 1),
                        "top1": str(tt.iloc[0]["term"]),
                        "top1_cnt": int(tt.iloc[0]["cnt"])}

    # --- near-dup clustering (pairs + union-find + drop count) -------
    from gazetteer_search_ray.pipelines.dedup import neardup_clusters

    t0 = time.monotonic()
    cl = neardup_clusters(docs(), threshold=0.5)
    out["neardup_clusters"] = {
        "s": round(time.monotonic() - t0, 1),
        "clustered_docs": int(len(cl)),
        "clusters": int(cl["cluster_id"].nunique()) if len(cl) else 0,
    }

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
