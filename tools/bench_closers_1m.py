"""1.28M-doc smoke for the closing round-5 operators: passage
chunking (char + token windows), codepoint-entropy scoring, and the
resumable partitioned sink with a simulated crash + resume — proves
the shuffle-free map shapes and the atomic-commit/resume contract hold
at 32× the bench corpus with nothing corpus-sized on the driver.

Usage: python tools/bench_closers_1m.py [corpus_dir]
Prints one JSON line; writes BENCH_closers1m_r5.json (temp+rename).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    from ray.data.aggregate import Mean, Sum

    from gazetteer_search_ray.pipelines.chunking import (
        chunk_text,
        chunk_tokens,
    )
    from gazetteer_search_ray.pipelines.sink import (
        SINK_MANIFEST,
        write_partitioned,
    )
    from gazetteer_search_ray.pipelines.textstats import char_entropy
    from gazetteer_search_ray.sources.corpus import read_corpus

    def docs():
        return read_corpus(corpus).map_batches(
            lambda t: t.select(["doc_id", "content"])
                       .rename_columns(["doc_id", "text"]),
            batch_format="pyarrow",
        )

    n_docs = docs().count()
    result: dict = {"metric": "closers_scale_smoke_r5", "corpus": corpus,
                    "n_docs": n_docs}

    # 1) char chunking: consumed by a streaming aggregate (chunk count
    #    + total chunk chars) — nothing chunk-sized on the driver
    t0 = time.time()
    import pyarrow as pa
    import pyarrow.compute as pc

    def _chunk_partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "chars": pa.array(
                [pc.sum(pc.utf8_length(t["chunk"])).as_py() or 0],
                pa.int64()),
        })

    ct = chunk_text(docs(), size=512, stride=384) \
        .map_batches(_chunk_partial, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="chunks"),
                   Sum("chars", alias_name="chars"))
    result["chunk_text"] = {"sec": round(time.time() - t0, 1),
                            "chunks": int(ct["chunks"]),
                            "chars": int(ct["chars"])}

    # 2) token chunking: Sum(n_tokens) must tile the corpus token
    #    stream exactly once per window overlap pattern
    t0 = time.time()
    tk = chunk_tokens(docs(), size=128, stride=96) \
        .aggregate(Sum("n_tokens", alias_name="toks"))
    result["chunk_tokens"] = {"sec": round(time.time() - t0, 1),
                              "window_tokens": int(tk["toks"])}

    # 3) entropy: full-corpus quality scan
    t0 = time.time()
    ent = char_entropy(docs()).aggregate(
        Mean("entropy", alias_name="mean_entropy"))
    result["char_entropy"] = {"sec": round(time.time() - t0, 1),
                              "mean_entropy":
                                  round(float(ent["mean_entropy"]), 4)}

    # 4) resumable sink: full write, then a simulated crash (4 of 64
    #    partitions lost) and a resume that must rewrite ONLY those
    out = tempfile.mkdtemp(prefix="gsr_sink1m_") + "/docs"
    t0 = time.time()
    s1 = write_partitioned(docs(), out, "doc_id", num_partitions=64)
    full_sec = round(time.time() - t0, 1)
    mp = os.path.join(out, SINK_MANIFEST)
    man = json.load(open(mp))
    lost = ["3", "17", "31", "55"]
    for p in lost:
        shutil.rmtree(os.path.join(out, f"part={p}"))
        del man["committed"][p]
    json.dump(man, open(mp, "w"))
    t0 = time.time()
    s2 = write_partitioned(docs(), out, "doc_id", num_partitions=64)
    resume_sec = round(time.time() - t0, 1)
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)
    result["sink"] = {
        "full_write_sec": full_sec, "rows": s1["rows_total"],
        "resume_sec": resume_sec,
        "resume_rewrote": sorted(s2["written"], key=int),
        "resume_rows_written": s2["rows_written"],
        "rows_total_after_resume": s2["rows_total"],
        "resume_ok": (sorted(s2["written"], key=int) == lost
                      and s2["rows_total"] == n_docs),
    }

    line = json.dumps(result)
    print(line)
    tmp = "BENCH_closers1m_r5.json.tmp"
    with open(tmp, "w") as f:
        f.write(line + "\n")
    os.replace(tmp, "BENCH_closers1m_r5.json")
    ray.shutdown()


if __name__ == "__main__":
    main()
