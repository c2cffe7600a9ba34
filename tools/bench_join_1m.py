"""4M×200k equi-join smoke for `relational.equi_join`: the same
fact⋈dim join run through BOTH strategies (broadcast Arrow hash join
vs Ray hash-shuffle `Dataset.join`), verified by streaming checksums
(row count + Σb over joined rows) computed independently from the
generated arrays with numpy — nothing row-cardinality-sized reaches
the driver.  Proves the operator's scale shape at 100× the sf0.01
entry (`join_enrich` is 15k×1.5k rows; this is 4M×200k with ~25%
unmatched fact keys and duplicate dim keys expanding m×n).

Usage: python tools/bench_join_1m.py
Prints one JSON line; writes BENCH_join4m_r5.json (temp+rename).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FACT = 4_000_000
N_DIM = 200_000
KEYSPACE = 250_000  # dim covers 200k of 250k → ~20% fact rows unmatched


def main():
    import numpy as np
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

    from gazetteer_search_ray.pipelines.relational import equi_join

    rng = np.random.default_rng(9)
    fk = rng.integers(0, KEYSPACE, N_FACT).astype(np.int64)
    fv = rng.integers(0, 1000, N_FACT).astype(np.int64)
    # dim: 200k distinct keys, ~5% duplicated once (m×n expansion)
    dk_base = rng.permutation(KEYSPACE)[:N_DIM].astype(np.int64)
    dk = np.concatenate([dk_base, dk_base[: N_DIM // 20]])
    dv = rng.integers(0, 1000, len(dk)).astype(np.int64)

    # expected invariants, vectorized on the generated arrays: for each
    # fact row, the join emits one row per dim occurrence of its key
    occ = np.bincount(dk, minlength=KEYSPACE)
    dimsum = np.zeros(KEYSPACE, dtype=np.int64)
    np.add.at(dimsum, dk, dv)
    exp_rows = int(occ[fk].sum())
    exp_sum_b = int(dimsum[fk].sum())
    exp_sum_a = int((fv * occ[fk]).sum())

    fact = rd.from_arrow(pa.table({"k": fk, "a": fv})).repartition(64)
    dim = rd.from_arrow(pa.table({"k": dk, "b": dv})).repartition(8)

    result: dict = {"metric": "join_scale_smoke_r5",
                    "fact_rows": N_FACT, "dim_rows": int(len(dk))}
    for strat in ("broadcast", "shuffle"):
        t0 = time.time()
        out = equi_join(fact, dim, "k", how="inner", strategy=strat)
        agg = out.aggregate(Count(), Sum("a"), Sum("b"))
        el = time.time() - t0
        result[f"join_{strat}"] = {
            "sec": round(el, 1),
            "fact_rows_per_sec": round(N_FACT / el, 1),
            "rows": int(agg["count()"]),
            "rows_exact": bool(int(agg["count()"]) == exp_rows),
            "sum_a_exact": bool(int(agg["sum(a)"]) == exp_sum_a),
            "sum_b_exact": bool(int(agg["sum(b)"]) == exp_sum_b),
        }

    line = json.dumps(result)
    print(line)
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_join4m_r5.json")
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        f.write(line + "\n")
    os.replace(tmp, out_path)
    ray.shutdown()


if __name__ == "__main__":
    main()
