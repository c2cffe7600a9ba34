"""Graph rank propagation: distributed PageRank over an edge list.

Web-corpus curation ranks crawl sources by link authority (the
Common-Crawl domain-ranking shape); the reference has no graph
operator (its closest analog is the street-usage backfill join,
``imp/addr/UpdateStreetsUsage.java:47-132``, a one-hop count
propagation) — PageRank generalizes that one-hop enrichment to the
fixed-point iteration a link graph needs.

Semantics (mirrored exactly by the SQL oracle):

* edges are deduplicated (multi-edges count once);
* nodes = distinct(src) ∪ distinct(dst);
* ``r_0(v) = 1/N``;
* ``r_{t+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} r_t(u)/outdeg(u)``;
* dangling nodes (no out-edges) leak their mass — no redistribution
  term, matching the plain unrolled-SQL formulation.

Scale shapes (the 100-TB lens):

* **Edge dedup + out-degrees** — per-batch Arrow ``group_by`` combiner
  partials, then ONE ``groupby(src,dst)`` exchange; out-degrees are a
  further combiner pass over the *deduped* edges (O(#nodes) rows out).
* **``strategy="broadcast"``** — the rank vector (O(#nodes) float64 +
  a node→slot lookup) ships once per iteration via ``ray.put`` and is
  fetched per ACTOR; each batch of edges bincounts its contributions
  into per-batch ``(dst, contrib)`` partials (vectorized ``np.bincount``
  over slot ids — no Python loop).  The partials reduce by streaming
  into the driver's dense accumulator (``np.add.at`` over
  ``iter_batches`` — bounded by the edge count, measured 3× faster
  than a #nodes-group Ray groupby on the 1M-node smoke) while the
  edge count is ≤ ``driver_reduce_limit``, else through ONE
  ``groupby(dst).sum()`` exchange per round.  The edge set streams
  through untouched every round; driver state is O(#nodes), the same
  declared bound as every broadcast join in this engine.
* **``strategy="shuffle"``** — nothing node-sized on the driver: ranks
  stay a Dataset and each iteration is
  ``equi_join(edges, ranks, on=src, strategy="shuffle")`` →
  per-batch contribution combiner → ``groupby(dst).sum()`` →
  left join back onto the node set for the teleport term.  K
  iterations cost K hash-join exchanges — the honest price of a
  node set too large to broadcast.
* ``strategy="auto"`` broadcasts iff ``N ≤ broadcast_limit``.

Both strategies are differentially tested against each other and
against a dense numpy power iteration (``tests/test_graph.py``); the
driver oracle (dq:``pagerank``) unrolls the same iteration in SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DAMPING = 0.85


def _dedup_edges(edges, src_col: str, dst_col: str):
    """Distinct (src, dst) pairs: per-batch Arrow group_by combiner →
    ONE groupby exchange over pre-deduped partials."""

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([src_col, dst_col])
        return (t.select([src_col, dst_col])
                .group_by([src_col, dst_col]).aggregate([]))

    parts = edges.map_batches(part, batch_format="pyarrow")
    return parts.groupby([src_col, dst_col]).count().drop_columns(["count()"])


def _out_degrees(dedup, src_col: str):
    """(src, outdeg) from the deduped edge set — combiner + ONE small
    groupby; output is node-sized, never edge-sized."""
    from ray.data.aggregate import Sum

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({src_col: t[src_col], "_pd": pa.array([], pa.int64())})
        g = t.select([src_col]).group_by([src_col]).aggregate([([], "count_all")])
        return g.rename_columns([src_col, "_pd"])

    parts = dedup.map_batches(part, batch_format="pyarrow")
    return parts.groupby(src_col).aggregate(Sum("_pd", alias_name="outdeg"))


def _node_ids(dedup, src_col: str, dst_col: str):
    """Distinct node ids (src ∪ dst) as ONE groupby over stacked
    per-batch-deduped partials."""

    def stack(t: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([t[src_col].combine_chunks().cast(pa.int64()),
                                t[dst_col].combine_chunks().cast(pa.int64())])
        return pa.table({"node": pa.compute.unique(ids)})

    parts = dedup.map_batches(stack, batch_format="pyarrow")
    return parts.groupby("node").count().drop_columns(["count()"])


def pagerank(edges, damping: float = DAMPING, iters: int = 5,
             strategy: str = "auto", broadcast_limit: int = 4_000_000,
             src_col: str = "src", dst_col: str = "dst",
             seeds=None) -> pd.DataFrame:
    """PageRank over an int-keyed edge Dataset → ``(node, rank)``
    pandas frame (node-sized — the caller's declared driver bound).

    ``strategy``: ``"broadcast"`` (rank vector via ``ray.put`` each
    round, edge set never shuffles), ``"shuffle"`` (ranks stay a
    Dataset; per-round hash-join exchange), or ``"auto"``.

    ``seeds``: optional node-id array → PERSONALIZED PageRank: the
    teleport term (and the initial mass) is uniform over the seed set
    instead of all nodes — the recommendation / related-entity shape
    (public random-walk-with-restart formulation).  ``r_0 = e_S/|S|``
    and ``r_{t+1}(v) = (1-d)·e_S(v)/|S| + d·Σ r_t(u)/outdeg(u)``.
    Seeds not present in the graph's node set are ignored.
    """
    dedup = _dedup_edges(edges, src_col, dst_col).materialize()
    nodes = _node_ids(dedup, src_col, dst_col).to_pandas()["node"].to_numpy(np.int64)
    nodes = np.sort(nodes)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": np.array([], np.int64),
                             "rank": np.array([], np.float64)})
    sv = None
    if seeds is not None:
        sv = np.intersect1d(np.asarray(seeds, np.int64), nodes)
        if sv.size == 0:
            raise ValueError("no seed id is present in the graph")
    if strategy == "auto":
        strategy = "broadcast" if n <= broadcast_limit else "shuffle"
    if strategy == "broadcast":
        return _pagerank_broadcast(dedup, nodes, damping, iters,
                                   src_col, dst_col, seeds_sorted=sv)
    return _pagerank_shuffle(dedup, nodes, damping, iters, src_col, dst_col,
                             seeds_sorted=sv)


def _pagerank_broadcast(dedup, nodes: np.ndarray, damping: float,
                        iters: int, src_col: str, dst_col: str,
                        driver_reduce_limit: int = 200_000_000,
                        seeds_sorted: np.ndarray | None = None) -> pd.DataFrame:
    import ray
    from ray.data.aggregate import Sum

    n = len(nodes)
    # slot ids: searchsorted over the sorted node array (broadcast once)
    nodes_ref = ray.put(nodes)

    def slotify(t: pa.Table) -> pa.Table:
        nd = ray.get(nodes_ref)
        s = np.searchsorted(nd, t[src_col].to_numpy(zero_copy_only=False))
        d = np.searchsorted(nd, t[dst_col].to_numpy(zero_copy_only=False))
        return pa.table({"s": pa.array(s, pa.int64()),
                         "d": pa.array(d, pa.int64())})

    slots = dedup.map_batches(slotify, batch_format="pyarrow").materialize()
    outdeg = np.zeros(n, np.float64)
    od = _out_degrees(dedup, src_col).to_pandas()
    outdeg[np.searchsorted(nodes, od[src_col].to_numpy(np.int64))] = (
        od["outdeg"].to_numpy(np.float64))
    outdeg_ref = ray.put(outdeg)  # ship the node-sized vector ONCE

    # Per-iteration reduce: the sparse (dst, contrib) partials stream
    # straight to the driver's dense accumulator (np.add.at) when the
    # per-iteration partial volume is edge-bounded-small — broadcast
    # mode already holds the O(#nodes) rank vector, and streaming
    # ≤ #edges partial rows through iter_batches avoids a full Ray
    # groupby with #nodes groups per round (measured 3x faster on the
    # 1M-node/4M-edge smoke).  Above the limit, fall back to the
    # groupby merge so the driver never ingests an edge-scale stream.
    n_edges = slots.count()
    stream_reduce = n_edges <= driver_reduce_limit

    if seeds_sorted is None:
        tele = np.full(n, 1.0 / n)
    else:
        tele = np.zeros(n, np.float64)
        tele[np.searchsorted(nodes, seeds_sorted)] = 1.0 / seeds_sorted.size
    rank = tele.copy()
    for _ in range(iters):
        rank_ref = ray.put(rank)

        def contrib(t: pa.Table, _ref=rank_ref, _odref=outdeg_ref) -> pa.Table:
            r = ray.get(_ref)
            odv = ray.get(_odref)
            s = t["s"].to_numpy()
            d = t["d"].to_numpy()
            w = r[s] / np.maximum(odv[s], 1.0)
            # per-batch combiner: bincount over the batch's own dst set
            uniq, inv = np.unique(d, return_inverse=True)
            agg = np.bincount(inv, weights=w)
            return pa.table({"d": pa.array(uniq, pa.int64()),
                             "c": pa.array(agg, pa.float64())})

        parts = slots.map_batches(contrib, batch_format="pyarrow")
        acc = np.zeros(n, np.float64)
        if stream_reduce:
            for b in parts.iter_batches(batch_format="pyarrow"):
                np.add.at(acc, b["d"].to_numpy(), b["c"].to_numpy())
        else:
            summed = parts.groupby("d").aggregate(
                Sum("c", alias_name="c")).to_pandas()
            acc[summed["d"].to_numpy(np.int64)] = (
                summed["c"].to_numpy(np.float64))
        rank = (1.0 - damping) * tele + damping * acc
    return pd.DataFrame({"node": nodes, "rank": rank})


def _pagerank_shuffle(dedup, nodes: np.ndarray, damping: float,
                      iters: int, src_col: str, dst_col: str,
                      seeds_sorted: np.ndarray | None = None) -> pd.DataFrame:
    """Fully distributed: ranks live in a Dataset; each round is one
    hash-join exchange + one contribution groupby.  Only the final
    node-sized result reaches the driver.  Personalization seeds (a
    SMALL id set by nature) broadcast once via ``ray.put``; the
    per-node teleport term is recomputed by membership per batch."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .relational import equi_join

    n = len(nodes)
    outdeg = _out_degrees(dedup, src_col)
    # weighted edges (src, dst, w=1/outdeg) — outdeg is node-sized, so
    # the join strategy resolves per its own auto rule
    we = equi_join(dedup, outdeg, on=src_col, how="inner",
                   strategy="shuffle").materialize()

    def weight(t: pa.Table) -> pa.Table:
        w = 1.0 / np.maximum(t["outdeg"].to_numpy(zero_copy_only=False), 1.0)
        return pa.table({src_col: t[src_col], dst_col: t[dst_col],
                         "w": pa.array(w, pa.float64())})

    we = we.map_batches(weight, batch_format="pyarrow").materialize()
    if seeds_sorted is None:
        init = np.full(n, 1.0 / n)
        seeds_ref = None
    else:
        init = np.zeros(n, np.float64)
        init[np.searchsorted(nodes, seeds_sorted)] = 1.0 / seeds_sorted.size
        seeds_ref = ray.put(seeds_sorted)
    ranks = rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "rank": pa.array(init, pa.float64())}))
    teleport = (1.0 - damping) / n  # uniform case (scalar)
    n_seeds = 0 if seeds_sorted is None else int(seeds_sorted.size)
    for _ in range(iters):
        j = equi_join(we, ranks, on=src_col, right_on="node",
                      how="inner", strategy="shuffle")

        def contrib(t: pa.Table) -> pa.Table:
            c = t["w"].to_numpy(zero_copy_only=False) * \
                t["rank"].to_numpy(zero_copy_only=False)
            d = t[dst_col].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(d, return_inverse=True)
            return pa.table({"node": pa.array(uniq, pa.int64()),
                             "c": pa.array(np.bincount(inv, weights=c),
                                           pa.float64())})

        summed = (j.map_batches(contrib, batch_format="pyarrow")
                  .groupby("node").aggregate(Sum("c", alias_name="c")))
        base = rd.from_arrow(pa.table({"node": pa.array(nodes, pa.int64())}))
        nxt = equi_join(base, summed, on="node", how="left_outer",
                        strategy="shuffle")

        def finish(t: pa.Table, _tp=teleport, _d=damping,
                   _sref=seeds_ref, _ns=n_seeds) -> pa.Table:
            c = t["c"].to_numpy(zero_copy_only=False)
            c = np.where(np.isnan(c), 0.0, c)
            if _sref is None:
                tp = _tp
            else:
                sd = ray.get(_sref)
                nd = t["node"].to_numpy(zero_copy_only=False)
                idx = np.minimum(np.searchsorted(sd, nd), sd.size - 1)
                tp = np.where(sd[idx] == nd, (1.0 - _d) / _ns, 0.0)
            return pa.table({"node": t["node"],
                             "rank": pa.array(tp + _d * c, pa.float64())})

        ranks = nxt.map_batches(finish, batch_format="pyarrow").materialize()
    out = ranks.to_pandas().sort_values("node").reset_index(drop=True)
    out["node"] = out["node"].astype(np.int64)
    return out


def connected_components(edges, src_col: str = "src", dst_col: str = "dst",
                         driver_pair_limit: int = 20_000_000) -> pd.DataFrame:
    """Weakly-connected components of the (undirected view of the)
    edge list → ``(node, component_id)`` with component_id = the
    minimum node id in the component — the dedup family's clustering
    semantics applied to an explicit graph.

    Edges dedupe through the same combiner+groupby exchange as
    :func:`pagerank`; under ``driver_pair_limit`` distinct pairs the
    driver runs the vectorized min-label propagation
    (:func:`~gazetteer_search_ray.pipelines.dedup.union_find_labels`),
    above it the star-contraction rounds over the pairs Dataset
    (:func:`~...dedup.union_find_labels_distributed`) keep everything
    distributed.  Output is node-sized either way.
    """
    from .dedup import union_find_labels, union_find_labels_distributed

    dedup = _dedup_edges(edges, src_col, dst_col).materialize()
    n_pairs = dedup.count()
    if n_pairs == 0:
        return pd.DataFrame({"node": np.array([], np.int64),
                             "component_id": np.array([], np.int64)})
    if n_pairs <= driver_pair_limit:
        import ray

        blocks = [t for t in ray.get(dedup.to_arrow_refs()) if t.num_rows]
        pairs = np.concatenate([
            np.stack([t[src_col].to_numpy(zero_copy_only=False),
                      t[dst_col].to_numpy(zero_copy_only=False)], axis=1)
            for t in blocks]).astype(np.int64)
        nodes, labels = union_find_labels(pairs)
        return pd.DataFrame({"node": nodes.astype(np.int64),
                             "component_id": labels.astype(np.int64)})
    out = union_find_labels_distributed(
        dedup.map_batches(
            lambda t: pa.table({"a": t[src_col], "b": t[dst_col]}),
            batch_format="pyarrow"))
    out = out.to_pandas().rename(columns={"a": "node", "label": "component_id"})
    return out.sort_values("node").reset_index(drop=True)


def degree_stats(edges, src_col: str = "src", dst_col: str = "dst") -> pd.DataFrame:
    """Per-node (out_deg, in_deg) over the DEDUPED edge set — the
    link-graph audit table (hub/authority detection, dangling-node
    counts).  Two combiner+groupby passes over the deduped edges (each
    node-sized out), merged on the driver's node-sized frame."""
    dedup = _dedup_edges(edges, src_col, dst_col).materialize()
    od = _out_degrees(dedup, src_col).to_pandas().rename(
        columns={src_col: "node", "outdeg": "out_deg"})
    idg = _out_degrees(
        dedup.map_batches(
            lambda t: pa.table({src_col: t[dst_col]}),
            batch_format="pyarrow"),
        src_col).to_pandas().rename(
        columns={src_col: "node", "outdeg": "in_deg"})
    out = od.merge(idg, on="node", how="outer").fillna(0)
    out["node"] = out["node"].astype(np.int64)
    out["out_deg"] = out["out_deg"].astype(np.int64)
    out["in_deg"] = out["in_deg"].astype(np.int64)
    return out.sort_values("node").reset_index(drop=True)
