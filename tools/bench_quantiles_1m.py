"""1M-row comparison of the two exact-quantile paths over the same
materialized column: sort-exchange (`exact_quantiles`) vs shuffle-free
bin-refinement selection (`quantiles_select`).  Asserts the two return
identical order statistics; reports both wall times.

Usage: python tools/bench_quantiles_1m.py [corpus_dir]
Prints one JSON line; writes BENCH_quantiles1m_r5.json (temp+rename).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/dev/shm/gsr_corpus_1m"
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
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
        quantiles_select,
    )
    from gazetteer_search_ray.sources.corpus import read_corpus

    docs = read_corpus(corpus).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(t["content"]), pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()
    n = docs.count()

    t0 = time.time()
    a = exact_quantiles(docs, "n_chars", QS)
    ta = time.time() - t0
    t0 = time.time()
    b = quantiles_select(docs, "n_chars", QS)
    tb = time.time() - t0
    same = (a["value"].astype(np.int64).tolist()
            == b["value"].astype(np.int64).tolist())

    result = {
        "metric": "quantiles_1m_r5", "rows": n,
        "sort_path_sec": round(ta, 1),
        "select_path_sec": round(tb, 1),
        "speedup": round(ta / tb, 2),
        "values_identical": bool(same),
        "values": b["value"].astype(np.int64).tolist(),
    }
    line = json.dumps(result)
    print(line)
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_quantiles1m_r5.json")
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(line + "\n")
    os.replace(tmp, out_path)
    ray.shutdown()


if __name__ == "__main__":
    main()
