"""1M-doc smoke for the global-order primitives (pipelines/packing.py):
global_row_number, pack_spans and exact_quantiles over the synthetic
code corpus — proves the prefix-sum shape (one sort exchange +
O(#blocks) driver reduction + rebase pass) holds at 25× the bench
corpus with no driver-side corpus materialization.

Usage: python tools/bench_packing_1m.py [corpus_dir]
Prints one JSON line; writes BENCH_packing1m_r5.json (temp+rename).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/gsr_corpus_1m"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from gazetteer_search_ray.pipelines.packing import (
        exact_quantiles,
        global_row_number,
        pack_spans,
    )
    from gazetteer_search_ray.pipelines.textstats import token_stats
    from gazetteer_search_ray.sources.corpus import read_corpus

    result: dict = {"metric": "packing_scale_smoke_r5", "corpus": corpus}

    def docs():
        return read_corpus(corpus).map_batches(
            lambda t: t.select(["doc_id", "content"]),
            batch_format="pyarrow",
        )

    # 0) per-doc token counts once (reused by pack_spans); stays a
    #    lazy Dataset — only the checks below consume it streaming
    t0 = time.time()
    lens = token_stats(docs(), text_col="content").select_columns(
        ["doc_id", "token_count"]
    ).materialize()
    n_docs = lens.count()
    total_tokens = int(lens.sum("token_count"))
    tok_sec = time.time() - t0
    result["token_counts"] = {
        "sec": round(tok_sec, 1), "docs": n_docs,
        "total_tokens": total_tokens,
    }

    # 1) global_row_number: ids must be a dense 0..n-1 permutation —
    #    checked streaming via count / min / max / sum (n(n-1)/2)
    from ray.data.aggregate import Count, Max, Min, Sum

    t0 = time.time()
    numbered = global_row_number(lens, ["doc_id"])
    agg = numbered.aggregate(Min("row_id"), Max("row_id"), Sum("row_id"))
    el = time.time() - t0
    dense = (agg["min(row_id)"] == 0
             and agg["max(row_id)"] == n_docs - 1
             and agg["sum(row_id)"] == n_docs * (n_docs - 1) // 2)
    result["row_number_1m"] = {
        "sec": round(el, 1), "docs_per_sec": round(n_docs / el, 1),
        "dense_permutation": bool(dense),
    }

    # 2) pack_spans at L=1024: spans must tile the token stream —
    #    sum(span n_tokens) == total corpus tokens and the window count
    #    is ceil(total/L); consumed via streaming aggregates only
    L = 1024
    t0 = time.time()
    spans = pack_spans(lens, L, len_col="token_count")
    sagg = spans.aggregate(Count(), Sum("n_tokens"), Max("seq_id"))
    el = time.time() - t0
    n_windows = int(sagg["max(seq_id)"]) + 1
    result["pack_spans_1m"] = {
        "sec": round(el, 1), "seq_len": L,
        "span_rows": int(sagg["count()"]),
        "docs_per_sec": round(n_docs / el, 1),
        "tokens_tiled_exactly": bool(
            int(sagg["sum(n_tokens)"]) == total_tokens),
        "windows": n_windows,
        "window_count_exact": bool(
            n_windows == -(-total_tokens // L)),
    }

    # 3) exact quantiles of token_count — only len(qs) rows on driver
    t0 = time.time()
    qf = exact_quantiles(lens, "token_count",
                         [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0])
    el = time.time() - t0
    result["quantiles_1m"] = {
        "sec": round(el, 1),
        "values": {str(q): int(v) for q, v in zip(qf.q, qf.value)},
    }

    line = json.dumps(result)
    print(line)
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_packing1m_r5.json")
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(line + "\n")
    os.replace(tmp, out_path)
    ray.shutdown()


if __name__ == "__main__":
    main()
