"""1M-node / 4M-edge smoke for the round-5 graph + engagement
operators: PageRank (broadcast strategy — rank vector via ray.put once
per round, the edge set never shuffles) and rolling active users
(distinct-pair combiner + window fan-out, events never shuffle) at
~25× the driver-query graph — proves the per-round exchange volume is
node/day-sized, never edge/event-sized, and the driver holds only the
final node vector.

Usage: python tools/bench_graph_1m.py
Prints one JSON line; writes BENCH_graph1m_r5.json (temp+rename).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_NODES = 1_000_000
N_EDGES = 4_000_000
N_EVENTS = 4_000_000
N_USERS = 200_000


def main():
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
    import ray.data as rd

    from gazetteer_search_ray.pipelines.graph import pagerank
    from gazetteer_search_ray.pipelines.windows import rolling_active_users

    # deterministic edge list, generated distributed (one range block
    # per task — the driver never holds the edge set)
    def mk_edges(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy()
        src = (i * 2654435761) % N_NODES
        dst = (i * 40503 + (i >> 4) * 2246822519 + 1) % N_NODES
        return pa.table({"src": pa.array(src.astype(np.int64)),
                         "dst": pa.array(dst.astype(np.int64))})

    edges = rd.range(N_EDGES).map_batches(
        lambda b: pa.table({"id": pa.array(b["id"])}),
        batch_format="numpy").map_batches(mk_edges, batch_format="pyarrow")

    t0 = time.time()
    pr = pagerank(edges, iters=3, strategy="broadcast")
    t_pr = time.time() - t0
    assert len(pr) == N_NODES, len(pr)
    total_mass = float(pr["rank"].sum())

    def mk_events(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy()
        u = (i * 2654435761) % N_USERS
        day = 19_000 + ((i * 40507) % 60)  # 60-day log (40507 ⊥ 60)
        ts = day * 86_400_000_000 + (i % 86_400_000_000)
        return pa.table({
            "user_id": pa.array(u.astype(np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
        })

    events = rd.range(N_EVENTS).map_batches(
        lambda b: pa.table({"id": pa.array(b["id"])}),
        batch_format="numpy").map_batches(mk_events, batch_format="pyarrow")

    t0 = time.time()
    au = rolling_active_users(events, window_days=7)
    t_au = time.time() - t0
    assert len(au) == 60, len(au)

    out = {
        "metric": "graph_engagement_1m_smoke",
        "pagerank": {"nodes": N_NODES, "edges": N_EDGES, "iters": 3,
                     "sec": round(t_pr, 1),
                     "edges_per_sec_per_iter":
                         int(N_EDGES * 3 / max(t_pr, 1e-9)),
                     "total_mass": round(total_mass, 4)},
        "active_users": {"events": N_EVENTS, "users": N_USERS,
                         "days": 60, "sec": round(t_au, 1),
                         "events_per_sec": int(N_EVENTS / max(t_au, 1e-9)),
                         "wau_day_59": int(au["active_users"].iloc[-1])},
    }
    line = json.dumps(out)
    print(line)
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_graph1m_r5.json")
    tmp = dest + ".tmp"
    with open(tmp, "w") as f:
        f.write(line + "\n")
    os.replace(tmp, dest)
    ray.shutdown()


if __name__ == "__main__":
    main()
