"""Ordered-step funnel and cohort-retention analytics over an events
stream — the product-analytics pair every large event pipeline runs
(the reference's closest analog is the single-pass insertion counters
of ``imp/addr/ImportObjectParser.java:215-237``; here the per-user
ordering is distributed instead of assumed).

Both operators follow the repo's one-sort-exchange pattern
(``windows.sessionize`` / ``packing.keyed_scan``): project to thin
int64 rows, ONE ``sort([user, ts])`` range exchange, resolve every
user-run strictly interior to a block with a vectorized kernel, and
pass only the O(#blocks) edge runs through to a driver-side fix-up
running the identical kernel.  Nothing user- or row-cardinality-sized
reaches the driver; block partials are step- or cohort-cardinality
rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_NEG = np.int64(-(2**62))  # below any epoch timestamp
_INF = np.int64(2**62)  # above any epoch timestamp


def _funnel_depth_counts(key: np.ndarray, ts: np.ndarray,
                         step: np.ndarray, n_steps: int) -> np.ndarray:
    """Per-user funnel depth over (key, ts)-sorted rows, reduced to
    ``counts[k] = #users whose depth is exactly k`` (len n_steps+1).

    A user's depth is the longest prefix of the step sequence matched
    by strictly-increasing timestamps: t1 = min ts of step-0 events,
    t2 = min ts of step-1 events with ts > t1, ...  One vectorized
    ``np.minimum.reduceat`` pass per step; an unreached step yields
    +inf which propagates, so depth = #finite thresholds.
    """
    n = key.size
    if n == 0:
        return np.zeros(n_steps + 1, dtype=np.int64)
    change = np.ones(n, dtype=bool)
    change[1:] = key[1:] != key[:-1]
    heads = np.flatnonzero(change)
    run_len = np.diff(np.concatenate((heads, [n])))
    prev = np.full(n, _NEG, dtype=np.int64)
    depth = np.zeros(heads.size, dtype=np.int64)
    for k in range(n_steps):
        cand = np.where((step == k) & (ts > prev), ts, _INF)
        tk = np.minimum.reduceat(cand, heads)
        depth += tk < _INF
        prev = np.repeat(tk, run_len)
    return np.bincount(depth, minlength=n_steps + 1)


def funnel_steps(ds, steps: list[str], key_col: str = "user_id",
                 type_col: str = "event_type", ts_col: str = "ts"):
    """Ordered conversion funnel: for each step k (1-based), how many
    users performed ``steps[0] .. steps[k-1]`` in strict timestamp
    order (each step strictly after the *earliest* completion of the
    previous one — the standard product-analytics funnel semantics,
    expressible in SQL as a cascade of min-ts self-joins).

    Returns a pandas frame ``(step, step_name, users)`` with one row
    per step, ``users`` monotonically non-increasing.

    Scale shape: rows are pruned to the funnel's event types AT THE
    READ side of the exchange (a funnel over 3 of 500 event types
    ships 3/500 of the stream), then ONE ``sort([user, ts])`` range
    exchange; interior user-runs collapse to an (n_steps+1)-long
    depth histogram per block, and only edge runs — O(#blocks) of
    them — pass through raw to the driver fix-up.
    """
    n_steps = len(steps)
    step_arr = pa.array(steps)

    def project(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[type_col], value_set=step_arr)
        t = t.filter(mask)
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        step = pc.index_in(t[type_col], value_set=step_arr)
        return pa.table({
            key_col: t[key_col],
            "__ts": pa.array(ts, pa.int64()),
            "__step": pc.cast(step, pa.int64()),
        })

    def resolve(t: pa.Table) -> pa.Table:
        """kind 0 rows: (step k, partial user count of depth ≥ k+1);
        kind 1 rows: raw (user, ts, step) edge-run passthrough."""
        n = t.num_rows
        key = t[key_col].to_numpy(zero_copy_only=False)
        if n:
            change = np.zeros(n, dtype=bool)
            change[0] = True
            change[1:] = key[1:] != key[:-1]
            kheads = np.flatnonzero(change)
            if kheads.size <= 2:  # ≤2 user-runs: all may straddle
                lo = hi = 0
            else:
                lo, hi = int(kheads[1]), int(kheads[-1])
        else:
            lo = hi = 0
        counts = _funnel_depth_counts(
            key[lo:hi], t["__ts"].to_numpy()[lo:hi],
            t["__step"].to_numpy()[lo:hi], n_steps)
        # users reaching ≥ k = suffix sum of exact-depth histogram
        reach = np.cumsum(counts[::-1])[::-1][1:]  # k = 1..n_steps
        bidx = np.flatnonzero(np.concatenate(
            [np.ones(lo, bool), np.zeros(hi - lo, bool),
             np.ones(n - hi, bool)]))
        take = pa.array(bidx)
        return pa.table({
            "__kind": pa.array(np.concatenate(
                [np.zeros(n_steps, np.int8),
                 np.ones(bidx.size, np.int8)])),
            "a": pa.array(np.concatenate(
                [np.arange(1, n_steps + 1, dtype=np.int64),
                 key[bidx].astype(np.int64)])),
            "b": pa.array(np.concatenate(
                [reach, t["__ts"].take(take).to_numpy()]), pa.int64()),
            "c": pa.array(np.concatenate(
                [np.zeros(n_steps, np.int64),
                 t["__step"].take(take).to_numpy()]), pa.int64()),
        })

    mixed = (
        ds.select_columns([key_col, type_col, ts_col])
        .map_batches(project, batch_format="pyarrow")
        .sort([key_col, "__ts"])
        .map_batches(resolve, batch_format="pyarrow")
        .to_pandas()
    )
    users = np.zeros(n_steps, dtype=np.int64)
    if not mixed.empty:
        part = mixed[mixed["__kind"] == 0]
        users += (part.groupby("a")["b"].sum()
                  .reindex(range(1, n_steps + 1), fill_value=0)
                  .to_numpy())
        bnd = mixed[mixed["__kind"] == 1]
        if not bnd.empty:
            bnd = bnd.sort_values(["a", "b"], kind="mergesort")
            counts = _funnel_depth_counts(
                bnd["a"].to_numpy(), bnd["b"].to_numpy(),
                bnd["c"].to_numpy(), n_steps)
            users += np.cumsum(counts[::-1])[::-1][1:]
    return pd.DataFrame({
        "step": np.arange(1, n_steps + 1, dtype=np.int64),
        "step_name": steps,
        "users": users,
    })


def _cohort_partials(key: np.ndarray, day: np.ndarray):
    """Per-user cohort offsets over (key, day)-sorted rows: dedupe
    (user, day) pairs, cohort day = the user's first (minimum) day,
    emit distinct (cohort_day, day - cohort_day) pairs with counts."""
    n = key.size
    if n == 0:
        return (np.empty(0, np.int64),) * 3
    change = np.ones(n, dtype=bool)
    change[1:] = key[1:] != key[:-1]
    heads = np.flatnonzero(change)
    run_len = np.diff(np.concatenate((heads, [n])))
    head_of = np.repeat(heads, run_len)
    # distinct (user, day): runs are day-sorted, keep day-change rows
    dd = np.ones(n, dtype=bool)
    dd[1:] = (day[1:] != day[:-1]) | change[1:]
    cohort = day[head_of]  # first day of the run = user's min day
    off = day - cohort
    pairs = np.stack([cohort[dd], off[dd]], axis=1)
    uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
    return uniq[:, 0], uniq[:, 1], cnt.astype(np.int64)


def retention_cohorts(ds, key_col: str = "user_id", ts_col: str = "ts"):
    """Cohort retention: users are cohorted by their first active day;
    for every (cohort_day, day_offset) the count of cohort users active
    exactly ``offset`` days after their first day (offset 0 row = the
    cohort size).  Returns a pandas frame
    ``(cohort_day, day_offset, users)`` with cohort_day as epoch days.

    Scale shape: project to thin (user, epoch-day) rows, ONE
    ``sort([user, day])`` range exchange; each interior user-run
    resolves to distinct (cohort, offset) partial counts (vectorized
    dedupe + np.unique), blocks emit cohort×offset-cardinality rows,
    and only O(#blocks) edge runs pass through raw.  The driver sums
    partials — never sees a user id outside the edge runs.
    """
    def project(t: pa.Table) -> pa.Table:
        day = t[ts_col].to_numpy(zero_copy_only=False).astype(
            "datetime64[D]").astype(np.int64)
        return pa.table({key_col: t[key_col],
                         "__day": pa.array(day, pa.int64())})

    def resolve(t: pa.Table) -> pa.Table:
        n = t.num_rows
        key = t[key_col].to_numpy(zero_copy_only=False)
        if n:
            change = np.zeros(n, dtype=bool)
            change[0] = True
            change[1:] = key[1:] != key[:-1]
            kheads = np.flatnonzero(change)
            if kheads.size <= 2:
                lo = hi = 0
            else:
                lo, hi = int(kheads[1]), int(kheads[-1])
        else:
            lo = hi = 0
        day = t["__day"].to_numpy()
        co, off, cnt = _cohort_partials(key[lo:hi], day[lo:hi])
        bidx = np.concatenate(
            [np.arange(lo), np.arange(hi, n)]).astype(np.int64)
        return pa.table({
            "__kind": pa.array(np.concatenate(
                [np.zeros(co.size, np.int8), np.ones(bidx.size, np.int8)])),
            "a": pa.array(np.concatenate([co, key[bidx].astype(np.int64)])),
            "b": pa.array(np.concatenate([off, day[bidx]]), pa.int64()),
            "c": pa.array(np.concatenate(
                [cnt, np.ones(bidx.size, np.int64)]), pa.int64()),
        })

    mixed = (
        ds.select_columns([key_col, ts_col])
        .map_batches(project, batch_format="pyarrow")
        .sort([key_col, "__day"])
        .map_batches(resolve, batch_format="pyarrow")
        .to_pandas()
    )
    parts = []
    if not mixed.empty:
        p = mixed[mixed["__kind"] == 0]
        parts.append(pd.DataFrame({
            "cohort_day": p["a"].to_numpy(),
            "day_offset": p["b"].to_numpy(),
            "users": p["c"].to_numpy(),
        }))
        bnd = mixed[mixed["__kind"] == 1]
        if not bnd.empty:
            bnd = bnd.sort_values(["a", "b"], kind="mergesort")
            co, off, cnt = _cohort_partials(
                bnd["a"].to_numpy(), bnd["b"].to_numpy())
            parts.append(pd.DataFrame(
                {"cohort_day": co, "day_offset": off, "users": cnt}))
    if not parts:
        return pd.DataFrame({"cohort_day": pd.Series(dtype=np.int64),
                             "day_offset": pd.Series(dtype=np.int64),
                             "users": pd.Series(dtype=np.int64)})
    out = (pd.concat(parts).groupby(["cohort_day", "day_offset"],
                                    as_index=False)["users"].sum())
    return out.sort_values(["cohort_day", "day_offset"]).reset_index(
        drop=True).astype(np.int64)
