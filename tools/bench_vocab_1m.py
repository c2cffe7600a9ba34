"""1.28M-doc smoke for the late round-5 additions: per-group top-k
tokens (top_tokens_by_group), corpus vocabulary-health stats
(vocab_stats) and exactly-n deterministic sampling (sample_fixed) —
proves the combiner→one-exchange shapes hold at 32× the bench corpus
with nothing vocabulary- or corpus-sized on the driver, and
cross-checks the invariants the three operators share.

Usage: python tools/bench_vocab_1m.py [corpus_dir]
Prints one JSON line; writes BENCH_vocab1m_r5.json (temp+rename).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANGS = ["en", "de", "fr", "es", "pt"]


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gsr_scale_corpus_1280k"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import numpy as np
    import pyarrow as pa

    from gazetteer_search_ray.pipelines.relational import sample_fixed
    from gazetteer_search_ray.pipelines.textstats import (
        top_tokens_by_group,
        vocab_stats,
    )
    from gazetteer_search_ray.sources.corpus import read_corpus

    def docs():
        # deterministic synthetic group: lang = LANGS[doc_id % 5]
        def adapt(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            lang = np.asarray(LANGS, dtype=object)[ids % len(LANGS)]
            return pa.table({
                "doc_id": t["doc_id"],
                "lang": pa.array(lang.astype(str)),
                "text": t["content"],
            })

        return read_corpus(corpus).map_batches(adapt, batch_format="pyarrow")

    n_docs = docs().count()
    result: dict = {"metric": "vocab_scale_smoke_r5", "corpus": corpus,
                    "n_docs": n_docs}

    # 1) vocabulary health: one term exchange, 1 row out
    t0 = time.time()
    vs = vocab_stats(docs())
    result["vocab_stats"] = {
        "sec": round(time.time() - t0, 1),
        "n_tokens": int(vs["n_tokens"][0]),
        "n_types": int(vs["n_types"][0]),
        "n_hapax": int(vs["n_hapax"][0]),
        "ttr": float(vs["type_token_ratio"][0]),
        "docs_per_sec": round(n_docs / (time.time() - t0)),
    }

    # 2) per-group top-k tokens: 5 groups × k rows out
    t0 = time.time()
    tt = top_tokens_by_group(docs(), k=20, group_col="lang")
    sec = time.time() - t0
    ok_shape = (sorted(tt["lang"].unique()) == sorted(LANGS)
                and (tt.groupby("lang").size() == 20).all())
    # per-group counts are rank-monotone and bounded by the corpus total
    mono = all(
        (g["cnt"].to_numpy()[:-1] >= g["cnt"].to_numpy()[1:]).all()
        for _, g in tt.groupby("lang"))
    bounded = int(tt["cnt"].sum()) <= result["vocab_stats"]["n_tokens"]
    result["top_tokens_by_group"] = {
        "sec": round(sec, 1), "rows": len(tt),
        "docs_per_sec": round(n_docs / sec),
        "shape_ok": bool(ok_shape), "rank_monotone": bool(mono),
        "bounded_by_corpus": bool(bounded),
        "top_en": tt[tt.lang == "en"]["term"].iloc[0],
    }

    # 3) exactly-n sample: n rows out, prefix-nesting verified at scale
    t0 = time.time()
    s1k = sample_fixed(docs().select_columns(["doc_id", "lang"]), 1000)
    sec = time.time() - t0
    s100 = sample_fixed(docs().select_columns(["doc_id", "lang"]), 100)
    result["sample_fixed"] = {
        "sec": round(sec, 1), "rows": len(s1k),
        "docs_per_sec": round(n_docs / sec),
        "exact_n": len(s1k) == 1000,
        "prefix_nests": bool(set(s100["doc_id"]) <= set(s1k["doc_id"])),
    }

    line = json.dumps(result)
    print(line)
    tmp = "BENCH_vocab1m_r5.json.tmp"
    with open(tmp, "w") as f:
        f.write(line + "\n")
    os.replace(tmp, "BENCH_vocab1m_r5.json")
    ray.shutdown()


if __name__ == "__main__":
    main()
