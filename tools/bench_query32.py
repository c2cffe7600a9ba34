"""Single-thread query microbench: float32 pre-pass A/B on the 320k
index (round-4 VERDICT #1 evidence).

Measures warm single-searcher QPS over the bench replay mix with the
float32 approximate pre-pass OFF (the round-3 float64 dense paths) and
ON (float32 accumulate + exact float64 candidate rescore), plus an
analytic per-query memory-traffic estimate for both modes.  Results are
bit-identical between modes (asserted here on the fly for every query).

Usage: python tools/bench_query32.py   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
DOCS = int(os.environ.get("GSR_QBENCH_DOCS", "320000"))
CORPUS = f"{SCRATCH}/gsr_bench_corpus_{DOCS}"
IDX = f"{SCRATCH}/gsr_idx_{DOCS}_q32"
N_QUERIES = int(os.environ.get("GSR_QBENCH_QUERIES", "4000"))

MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
}


def main() -> None:
    os.environ.update(MALLOC_ENV)
    import numpy as np
    import ray

    from bench import make_queries
    from gazetteer_search_ray.functions.analyzer import AnalyzerConfig
    from gazetteer_search_ray.pipelines.build_index import (
        BuildOptions,
        build_index,
    )
    from gazetteer_search_ray.pipelines.search import Searcher
    from gazetteer_search_ray.sources.corpus import (
        read_corpus,
        write_synthetic_corpus,
    )

    if not os.path.exists(os.path.join(CORPUS, "corpus-0063.parquet")):
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=16, include_dashboard=False,
                     logging_level="ERROR")
        write_synthetic_corpus(CORPUS, n_docs=DOCS, n_files=64)
    if not os.path.exists(os.path.join(IDX, "manifest.json")):
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=16, include_dashboard=False,
                     logging_level="ERROR")
        build_index(
            read_corpus(CORPUS), IDX,
            BuildOptions(analyzer_config=AnalyzerConfig.code(),
                         batch_size=512),
            overwrite=True,
        )
    if ray.is_initialized():
        ray.shutdown()

    queries = make_queries(N_QUERIES)
    out: dict = {"metric": "query32_single_thread", "docs": DOCS,
                 "n_queries": N_QUERIES}
    results: dict[bool, list] = {}
    for approx in (False, True):
        s = Searcher(IDX)
        s.engine.approx32 = approx
        for q in queries[:400]:  # warm leaf caches
            s.search(q["q"], k=q["k"], prefix=q["prefix"], use_prior=False)
        t0 = time.monotonic()
        res = [
            s.search(q["q"], k=q["k"], prefix=q["prefix"], use_prior=False)
            for q in queries
        ]
        dt = time.monotonic() - t0
        results[approx] = res
        out[f"qps_approx_{'on' if approx else 'off'}"] = round(
            N_QUERIES / dt, 1)

        # analytic per-query traffic over the mix: bytes read+written by
        # the accumulator passes (pos reads + score reads + acc writes +
        # counter traffic + fills + hit scan)
        n = s.reader.doc_ids.size
        total = 0.0
        for q in queries:
            from gazetteer_search_ray.pipelines.search import analyze_query
            pq = analyze_query(q["q"], s.reader.analyzer, q["prefix"])
            terms = pq.required + pq.numbers + pq.optional
            dfs = []
            for t in terms:
                tp = s.reader.posting(t)
                dfs.append(tp.df if tp else 0)
            sw = 4 if approx else 8            # score element width
            aw = 4 if approx else 8            # accumulator width
            cw = 1 if approx else 2            # counter width
            traffic = sum(df * (4 + sw + aw) for df in dfs)  # pos+s+acc
            if len(terms) > 1:                 # counter scatter + fill
                traffic += sum(df * cw for df in dfs) + n * cw
            traffic += n * aw                  # accumulator fill
            traffic += n * aw                  # hit scan
            total += traffic
        out[f"est_bytes_per_query_{'on' if approx else 'off'}"] = int(
            total / max(1, len(queries)))

    # bit-identity between modes, every query
    for a, b in zip(results[False], results[True]):
        assert len(a) == len(b)
        for ha, hb in zip(a, b):
            assert ha["doc_id"] == hb["doc_id"] and ha["score"] == hb["score"]
    out["bit_identical"] = True
    out["qps_ratio"] = round(
        out["qps_approx_on"] / max(out["qps_approx_off"], 1e-9), 3)
    out["bytes_ratio"] = round(
        out["est_bytes_per_query_off"]
        / max(out["est_bytes_per_query_on"], 1), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
