"""Distributed interval (range) join: each left "point" row matches
every interval row with ``start <= on <= end`` (and equal key, when a
key column is given) — the attribution-window / sensor-enrichment join
that Ray Data has no native operator for.

Not in the reference (a geocoder — SURVEY.md §2.5); the standard
composition is bin-and-replicate (e.g. Chawda et al., "Processing
Interval Joins On Map-Reduce", EDBT 2014):

1. points hash to ONE time bucket ``on // W``; intervals REPLICATE to
   every bucket they overlap (``flat_map``, fan-out = interval length /
   W, bounded by construction);
2. one ``groupby(bucket).map_groups`` co-partition; each bucket
   resolves vectorized — points lexsorted by (key, on − bucket_lo) into
   a composite int64 rank, interval endpoints ``np.searchsorted`` into
   it, matches emitted with the ragged-arange trick.  No per-row or
   per-interval Python loop;
3. a (point, interval) pair meets in exactly one bucket — the point's —
   so the union of bucket outputs IS the join, no dedup pass.

Partitioning assumptions (documented, same class as the session-window
op): one bucket's rows fit a worker (pick ``bucket_width`` ≈ a few
median interval lengths; replication stays O(1) while buckets stay
fine); key skew inside a bucket is fine (vectorized), bucket-level
time skew wants a smaller W.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_BUCKET = "__bucket"
_SIDE = "__side"
_SIDE_POINT, _SIDE_IVL = 0, 1


def _ragged_ranges(lo: np.ndarray, hi: np.ndarray):
    """Concatenated [lo_i, hi_i) aranges + the repeat index i per row."""
    counts = (hi - lo).clip(min=0)
    total = int(counts.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    rep = np.repeat(np.arange(lo.size, dtype=np.int64), counts)
    starts = np.repeat(lo, counts)
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
    return starts + offs, rep


def interval_join(points_ds, intervals_ds, on_col: str, start_col: str,
                  end_col: str, bucket_width: int, key_col: str | None = None,
                  point_cols: list[str] | None = None,
                  interval_cols: list[str] | None = None):
    """Inner range join (inclusive both ends).  ``on/start/end`` must be
    int64-comparable (cast timestamps upstream).  Returns a Dataset with
    ``point_cols`` + ``interval_cols`` per match."""
    import ray.data as rd

    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    p_cols = point_cols or [c for c in points_ds.schema().names]
    i_cols = interval_cols or [
        c for c in intervals_ds.schema().names
        if c not in (start_col, end_col, key_col)
    ]
    clash = set(p_cols) & set(i_cols)
    if clash:
        raise ValueError(f"output column clash: {clash}")

    def tag_points(t: pa.Table) -> pa.Table:
        on = t[on_col].to_numpy().astype(np.int64)
        cols = {c: t[c] for c in set(p_cols) | {on_col} | (
            {key_col} if key_col else set())}
        cols[_BUCKET] = pa.array(on // w)
        cols[_SIDE] = pa.array(np.full(t.num_rows, _SIDE_POINT, np.int8))
        return pa.table(cols)

    def replicate_intervals(t: pa.Table) -> pa.Table:
        s = t[start_col].to_numpy().astype(np.int64)
        e = t[end_col].to_numpy().astype(np.int64)
        b_lo, b_hi = s // w, e // w
        idx, _ = _ragged_ranges(
            np.zeros(s.size, dtype=np.int64), b_hi - b_lo + 1)
        rep_counts = (b_hi - b_lo + 1).clip(min=0)
        rows = np.repeat(np.arange(s.size, dtype=np.int64), rep_counts)
        bucket = np.repeat(b_lo, rep_counts) + idx
        take = pa.array(rows)
        cols = {c: t[c].take(take) for c in set(i_cols) | {
            start_col, end_col} | ({key_col} if key_col else set())}
        cols[_BUCKET] = pa.array(bucket)
        cols[_SIDE] = pa.array(np.full(rows.size, _SIDE_IVL, np.int8))
        return pa.table(cols)

    all_cols = sorted(set(p_cols) | set(i_cols) | {on_col, start_col, end_col}
                      | ({key_col} if key_col else set()))

    def conform(t: pa.Table, types: dict) -> pa.Table:
        cols = {}
        for c in all_cols:
            cols[c] = t[c] if c in t.column_names else pa.nulls(
                t.num_rows, types[c])
        cols[_BUCKET] = t[_BUCKET]
        cols[_SIDE] = t[_SIDE]
        return pa.table(cols)

    pts = points_ds.map_batches(tag_points, batch_format="pyarrow")
    ivl = intervals_ds.map_batches(replicate_intervals, batch_format="pyarrow")
    pt_s, iv_s = pts.schema(), ivl.schema()
    types = dict(zip(pt_s.names, pt_s.types))
    types.update({n: t for n, t in zip(iv_s.names, iv_s.types)
                  if n not in types})
    both = pts.map_batches(
        lambda t: conform(t, types), batch_format="pyarrow"
    ).union(ivl.map_batches(
        lambda t: conform(t, types), batch_format="pyarrow"))

    def resolve(group: pa.Table) -> pa.Table:
        side = group[_SIDE].to_numpy(zero_copy_only=False)
        pm = side == _SIDE_POINT
        im = ~pm
        n_p, n_i = int(pm.sum()), int(im.sum())
        empty = {**{c: pa.nulls(0, types[c]) for c in p_cols},
                 **{c: pa.nulls(0, types[c]) for c in i_cols}}
        if n_p == 0 or n_i == 0:
            return pa.table(empty)
        b_lo = int(group[_BUCKET][0].as_py()) * w
        on = group[on_col].to_numpy(zero_copy_only=False)[pm].astype(np.int64)
        s = group[start_col].to_numpy(zero_copy_only=False)[im].astype(np.int64)
        e = group[end_col].to_numpy(zero_copy_only=False)[im].astype(np.int64)
        # clamp interval ends into this bucket's [b_lo, b_lo+w) window:
        # matches outside belong to other buckets (where the point lives)
        s = np.maximum(s, b_lo)
        e = np.minimum(e, b_lo + w - 1)
        rel_on = on - b_lo
        if key_col:
            kp = group[key_col].to_numpy(zero_copy_only=False)[pm]
            ki = group[key_col].to_numpy(zero_copy_only=False)[im]
            uniq, inv = np.unique(np.concatenate((kp, ki)),
                                  return_inverse=True)
            rk_p, rk_i = inv[:n_p].astype(np.int64), inv[n_p:].astype(np.int64)
            comp_p = rk_p * (w + 2) + rel_on
            comp_lo = rk_i * (w + 2) + (s - b_lo)
            comp_hi = rk_i * (w + 2) + (e - b_lo)
        else:
            comp_p = rel_on
            comp_lo, comp_hi = s - b_lo, e - b_lo
        order = np.argsort(comp_p, kind="stable")
        comp_sorted = comp_p[order]
        lo = np.searchsorted(comp_sorted, comp_lo, side="left")
        hi = np.searchsorted(comp_sorted, comp_hi, side="right")
        p_pos, i_pos = _ragged_ranges(lo, hi)
        if p_pos.size == 0:
            return pa.table(empty)
        p_take = pa.array(np.flatnonzero(pm)[order[p_pos]])
        i_take = pa.array(np.flatnonzero(im)[i_pos])
        out = {c: group[c].take(p_take) for c in p_cols}
        out.update({c: group[c].take(i_take) for c in i_cols})
        return pa.table(out)

    out_cols = p_cols + i_cols

    def conform_out(t: pa.Table) -> pa.Table:
        # map_groups can emit stray 0-row blocks that still carry the
        # pre-group (or no) schema; pin every block to the output schema
        if all(c in t.column_names for c in out_cols):
            return t.select(out_cols)
        if t.num_rows == 0:
            return pa.table({c: pa.nulls(0, types[c]) for c in out_cols})
        raise RuntimeError(f"unexpected block schema {t.column_names}")

    seed = rd.from_arrow(  # zero-match runs still carry the out schema
        pa.table({c: pa.nulls(0, types[c]) for c in out_cols}))
    return (
        both.groupby(_BUCKET)
        .map_groups(resolve, batch_format="pyarrow")
        .map_batches(conform_out, batch_format="pyarrow")
        .union(seed)
    )
