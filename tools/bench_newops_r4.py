"""Round-4 scale smokes (VERDICT r3 'Next' #2/#3/#5 done-criteria):

* grouped_topk over 10^6 groups, consumed as a Dataset — O(k·groups)
  never materializes on the driver;
* session_windows over 10^5 keys — new sort-exchange kernel timed
  against the legacy per-group ``map_groups`` implementation;
* union_find_labels_distributed over ≥10^7 planted pairs (mixed
  2-cliques and 10-node chains) — completes without any driver-sized
  array and labels a sample correctly.

Prints one JSON line; recorded as BENCH_newops1m_r4.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa


def main() -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    out: dict = {"metric": "newops_scale_smoke_r4"}

    # -- grouped_topk, 10^6 groups ----------------------------------------
    from gazetteer_search_ray.pipelines.relational import grouped_topk

    n_rows, n_groups, k = 4_000_000, 1_000_000, 2

    def gen(b):
        ids = np.asarray(b["id"], dtype=np.int64)
        return pa.table({
            "g": ids % n_groups,
            "v": (ids * 2654435761) % 1_000_003,
            "doc_id": ids,
        })

    ds = rd.range(n_rows).map_batches(gen, batch_format="pyarrow")
    t0 = time.monotonic()
    fin = grouped_topk(ds, "g", "v", k, id_col="doc_id", as_pandas=False)
    cnt = fin.count()
    dt = time.monotonic() - t0
    expect = n_groups * min(k, n_rows // n_groups)
    assert cnt == expect, (cnt, expect)
    out["grouped_topk_1m_groups"] = {
        "rows_in": n_rows, "groups": n_groups, "rows_out": int(cnt),
        "sec": round(dt, 1),
    }
    print(json.dumps({"grouped_topk_1m_groups":
                      out["grouped_topk_1m_groups"]}), flush=True)

    # -- session_windows, 10^5 keys: new kernel vs legacy map_groups ------
    n_ev, n_keys = 2_000_000, 100_000
    base = np.datetime64("2024-01-01T00:00:00")

    def gen_ev(b):
        ids = np.asarray(b["id"], dtype=np.int64)
        ts = base + ((ids * 48271) % 400_000).astype("timedelta64[s]")
        return pa.table({
            "user_id": ids % n_keys,
            "ts": pa.array(ts.astype("datetime64[us]")),
        })

    from gazetteer_search_ray.pipelines.windows import session_windows

    ev = rd.range(n_ev).map_batches(gen_ev, batch_format="pyarrow")
    t0 = time.monotonic()
    n_sessions = session_windows(ev, 600).count()
    dt_new = time.monotonic() - t0
    print(json.dumps({"session_sort_exchange":
                      {"events": n_ev, "keys": n_keys,
                       "sessions": int(n_sessions),
                       "sec": round(dt_new, 1)}}), flush=True)

    # legacy shape (the round-3 implementation): per-group pandas callback
    def legacy_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="stable")
        ts = g["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        new = np.ones(len(g), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > 600
        sid = np.cumsum(new) - 1
        agg = (
            pd.DataFrame({"session_id": sid, "ts_sec": ts})
            .groupby("session_id")
            .agg(session_start=("ts_sec", "min"),
                 session_end=("ts_sec", "max"),
                 n_events=("ts_sec", "size"))
            .reset_index(drop=True)
        )
        agg["user_id"] = g["user_id"].iloc[0]
        return agg[["user_id", "session_start", "session_end", "n_events"]]

    # the legacy per-group pandas callback costs ~10 ms/group (repo
    # measurement) — 10^5 keys would take ~17 min of pure callback time,
    # so the legacy leg runs at 1/10 scale and the comparison normalizes
    # per event (both legs are event-linear at fixed keys/event ratio)
    n_ev_leg, n_keys_leg = n_ev // 10, n_keys // 10

    def gen_ev_leg(b):
        ids = np.asarray(b["id"], dtype=np.int64)
        ts = base + ((ids * 48271) % 400_000).astype("timedelta64[s]")
        return pa.table({
            "user_id": ids % n_keys_leg,
            "ts": pa.array(ts.astype("datetime64[us]")),
        })

    ev2 = rd.range(n_ev_leg).map_batches(gen_ev_leg, batch_format="pyarrow")
    t0 = time.monotonic()
    n_leg = (
        ev2.groupby("user_id").map_groups(legacy_sessions,
                                          batch_format="pandas").count()
    )
    dt_legacy = time.monotonic() - t0
    ev3 = rd.range(n_ev_leg).map_batches(gen_ev_leg, batch_format="pyarrow")
    t0 = time.monotonic()
    n_new_leg = session_windows(ev3, 600).count()
    dt_new_leg = time.monotonic() - t0
    assert n_leg == n_new_leg, (n_leg, n_new_leg)
    out["session_windows_100k_keys"] = {
        "events": n_ev, "keys": n_keys, "sessions": int(n_sessions),
        "sec_sort_exchange": round(dt_new, 1),
        "legacy_leg_events": n_ev_leg, "legacy_leg_keys": n_keys_leg,
        "sec_legacy_map_groups_leg": round(dt_legacy, 1),
        "sec_sort_exchange_leg": round(dt_new_leg, 1),
        "speedup_same_input": round(dt_legacy / max(dt_new_leg, 1e-9), 2),
    }
    print(json.dumps({"session_windows_100k_keys":
                      out["session_windows_100k_keys"]}), flush=True)

    # -- distributed union-find, 10^7 pairs --------------------------------
    from gazetteer_search_ray.pipelines.dedup import (
        union_find_labels_distributed,
    )

    n_pairs = 10_000_000
    n_clique_pairs = int(n_pairs * 0.9)

    def gen_pairs(b):
        ids = np.asarray(b["id"], dtype=np.int64)
        a = np.empty(ids.size, dtype=np.int64)
        bb = np.empty(ids.size, dtype=np.int64)
        cl = ids < n_clique_pairs  # 2-cliques: (2i, 2i+1)
        a[cl] = ids[cl] * 2
        bb[cl] = ids[cl] * 2 + 1
        ch = ~cl                   # 10-node chains in a disjoint id space
        j = ids[ch] - n_clique_pairs
        chain, off = j // 9, j % 9
        a[ch] = 10**9 + chain * 10 + off
        bb[ch] = 10**9 + chain * 10 + off + 1
        return pa.table({"a": a, "b": bb})

    pairs = rd.range(n_pairs).map_batches(gen_pairs, batch_format="pyarrow")
    t0 = time.monotonic()
    labels = union_find_labels_distributed(pairs).materialize()
    n_nodes = labels.count()
    dt = time.monotonic() - t0
    # verify a sample: chain nodes label to their chain head
    import pyarrow.compute as pc

    sample = labels.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["doc_id"], 10**9),
                    pc.less(t["doc_id"], 10**9 + 100))),
        batch_format="pyarrow",
    ).to_pandas()
    assert len(sample) == 100
    for _, r in sample.iterrows():
        chain = (r["doc_id"] - 10**9) // 10
        assert r["cluster_id"] == 10**9 + chain * 10, r
    out["union_find_10m_pairs"] = {
        "pairs": n_pairs, "nodes": int(n_nodes), "sec": round(dt, 1),
    }

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
