"""1M-row smoke for the round-5 late operators: keyed_scan (per-key
ordered window functions) over a 1M-event log with 50k hot-ish keys,
and lm_score (bigram-LM quality scoring) over the 1M-doc synthetic
corpus.  Proves the segmented-scan shape (one sort exchange +
O(#blocks) carry chain) and the broadcast-LM scoring pass hold at 25×
the bench scale with nothing row-cardinality-sized on the driver: the
scan's correctness witnesses are streaming aggregates compared against
vectorized-numpy expectations of the generated input.

Usage: python tools/bench_scan_1m.py [corpus_dir]
Prints one JSON line; writes BENCH_scan1m_r5.json (temp+rename).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = 1_000_000
N_KEYS = 50_000


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/gsr_corpus_1m"
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    import ray.data as rd
    from ray.data import DataContext
    from ray.data.aggregate import Count, Sum

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from gazetteer_search_ray.pipelines.packing import keyed_scan
    from gazetteer_search_ray.pipelines.textstats import lm_score
    from gazetteer_search_ray.sources.corpus import read_corpus

    result: dict = {"metric": "scan_scale_smoke_r5", "corpus": corpus}

    # --- 1) keyed_scan over 1M events / 50k keys (Zipf-ish skew:
    #     key = min of two uniforms, so low keys are hot) -------------
    rng = np.random.default_rng(5)
    key = np.minimum(rng.integers(0, N_KEYS, N_EVENTS),
                     rng.integers(0, N_KEYS, N_EVENTS)).astype(np.int64)
    ts = rng.integers(0, 10**12, N_EVENTS).astype(np.int64)
    ids = rng.permutation(N_EVENTS).astype(np.int64)
    val = rng.integers(0, 10_000, N_EVENTS).astype(np.int64)

    # expected aggregates, vectorized on the generated arrays
    df = pd.DataFrame({"k": key, "ts": ts, "i": ids, "v": val})
    s = df.sort_values(["k", "ts", "i"], kind="mergesort")
    g = s.groupby("k", sort=False)
    exp_sum_seq = int((g.cumcount().to_numpy() + 1).sum())
    exp_sum_cum = int(g["v"].cumsum().sum())
    d = s["ts"].to_numpy()
    kk = s["k"].to_numpy()
    inner = kk[1:] == kk[:-1]
    exp_sum_delta = int((d[1:] - d[:-1])[inner].sum())
    exp_null_deltas = int(len(np.unique(key)))

    ds = rd.from_arrow(
        pa.table({"k": key, "ts": ts, "i": ids, "v": val})
    ).repartition(64)
    t0 = time.time()
    out = keyed_scan(ds, "k", "ts", "i", "v")
    agg = out.aggregate(Count(), Sum("seq"), Sum("cum"), Sum("delta"))
    null_deltas = int(out.map_batches(
        lambda t: pa.table({"n": pa.array([t["delta"].null_count],
                                          pa.int64())}),
        batch_format="pyarrow").sum("n"))
    el = time.time() - t0
    result["keyed_scan_1m"] = {
        "sec": round(el, 1),
        "events_per_sec": round(N_EVENTS / el, 1),
        "rows": int(agg["count()"]),
        "sum_seq_exact": bool(int(agg["sum(seq)"]) == exp_sum_seq),
        "sum_cum_exact": bool(int(agg["sum(cum)"]) == exp_sum_cum),
        "sum_delta_exact": bool(int(agg["sum(delta)"]) == exp_sum_delta),
        "null_deltas_exact": bool(null_deltas == exp_null_deltas),
    }

    # --- 2) lm_score over the 1M-doc corpus ------------------------
    docs = read_corpus(corpus).map_batches(
        lambda t: t.select(["doc_id", "content"]), batch_format="pyarrow")
    n_docs = docs.count()
    t0 = time.time()
    scored = lm_score(docs, text_col="content", min_count=10)
    sagg = scored.aggregate(Count(), Sum("n_known"), Sum("lp"))
    el = time.time() - t0
    result["lm_score_1m"] = {
        "sec": round(el, 1), "docs": n_docs,
        "docs_per_sec": round(n_docs / el, 1),
        "rows": int(sagg["count()"]),
        "rows_cover_all_docs": bool(int(sagg["count()"]) == n_docs),
        "scored_bigrams": int(sagg["sum(n_known)"]),
        "mean_lp_overall": round(float(sagg["sum(lp)"]) / n_docs, 4),
    }

    line = json.dumps(result)
    print(line)
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_scan1m_r5.json")
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(line + "\n")
    os.replace(tmp, out_path)
    ray.shutdown()


if __name__ == "__main__":
    main()
