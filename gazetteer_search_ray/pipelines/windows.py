"""Windowed aggregates over an ordered event log.

The reference is fully batch (SURVEY.md §2.5: no windows/watermarks),
but a large-scale training-data pipeline needs window operators; Ray
Data has none built in, so they compose from partial aggregation +
``groupby`` exactly like the postings merge:

* tumbling window: assign ``window = floor(epoch(ts) / size)`` in a
  vectorized ``map_batches``, pre-aggregate per (key, window) inside
  each batch (the combiner), then one small ``groupby`` over partials —
  the shuffle ships one row per key-window per batch, not per event;
* session / sliding windows: ``groupby(key).map_groups`` over ts-sorted
  groups (documented ordering assumption: one group fits a worker).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window_agg(
    ds,
    window_sec: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """count/sum/min/max of ``value`` per (key, tumbling window).

    Returns a Dataset with columns (key, window_start, n_events,
    sum_value, min_value, max_value) — partial-aggregated per batch
    before the groupby, so the shuffle is tiny.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t[ts_col], pa.int64()).to_numpy() // 1_000_000
        win = (epoch // window_sec) * window_sec
        tt = pa.table(
            {
                key_col: t[key_col],
                "window_start": pa.array(win, pa.int64()),
                value_col: t[value_col],
            }
        )
        g = tt.group_by([key_col, "window_start"], use_threads=False).aggregate(
            [(value_col, "count"), (value_col, "sum"),
             (value_col, "min"), (value_col, "max")]
        )
        return g.rename_columns(
            [key_col, "window_start", "p_n", "p_sum", "p_min", "p_max"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby([key_col, "window_start"])
        .aggregate(
            Sum("p_n", alias_name="n_events"),
            Sum("p_sum", alias_name="sum_value"),
            Min("p_min", alias_name="min_value"),
            Max("p_max", alias_name="max_value"),
        )
    )


def hopping_window_agg(
    ds,
    window_sec: int,
    hop_sec: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """count/sum/min/max per (key, hopping window): windows of
    ``window_sec`` starting every ``hop_sec`` (overlapping when
    hop < window).  Each event fans out to its ``window/hop`` covering
    windows vectorized (np.repeat) and pre-aggregates per batch, so the
    shuffle ships one row per key-window per batch — the same combiner
    discipline as the tumbling window.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        epoch = pc.cast(t[ts_col], pa.int64()).to_numpy() // 1_000_000
        # window starts h*hop with h in [floor((t-window)/hop)+1, floor(t/hop)]
        h_lo = (epoch - window_sec) // hop_sec + 1
        h_hi = epoch // hop_sec
        counts = (h_hi - h_lo + 1).astype(np.int64)
        total = int(counts.sum())
        seg = np.concatenate(([0], np.cumsum(counts)))[:-1]
        within = np.arange(total, dtype=np.int64) - np.repeat(seg, counts)
        hs = np.repeat(h_lo, counts) + within
        row_idx = np.repeat(np.arange(epoch.size, dtype=np.int64), counts)
        tt = pa.table(
            {
                key_col: t[key_col].take(pa.array(row_idx)),
                "window_start": pa.array(hs * hop_sec, pa.int64()),
                value_col: t[value_col].take(pa.array(row_idx)),
            }
        )
        g = tt.group_by([key_col, "window_start"], use_threads=False).aggregate(
            [(value_col, "count"), (value_col, "sum"),
             (value_col, "min"), (value_col, "max")]
        )
        return g.rename_columns(
            [key_col, "window_start", "p_n", "p_sum", "p_min", "p_max"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby([key_col, "window_start"])
        .aggregate(
            Sum("p_n", alias_name="n_events"),
            Sum("p_sum", alias_name="sum_value"),
            Min("p_min", alias_name="min_value"),
            Max("p_max", alias_name="max_value"),
        )
    )


def session_windows(
    ds,
    gap_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """Session windows per key: a new session starts when the gap to the
    previous event exceeds ``gap_sec``.  ``groupby(key).map_groups`` over
    ts-sorted groups (assumes one key's events fit a worker — salt the
    key for pathological users)."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="stable")
        # unit-safe: truncate to whole seconds whatever the datetime64 unit
        ts = g[ts_col].to_numpy().astype("datetime64[s]").astype(np.int64)
        new = np.ones(len(g), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > gap_sec
        sid = np.cumsum(new) - 1
        out = pd.DataFrame(
            {
                key_col: g[key_col].iloc[0],
                "session_id": sid,
                "ts_sec": ts,
            }
        )
        agg = out.groupby("session_id").agg(
            session_start=("ts_sec", "min"),
            session_end=("ts_sec", "max"),
            n_events=("ts_sec", "size"),
        ).reset_index(drop=True)
        agg[key_col] = g[key_col].iloc[0]
        return agg[[key_col, "session_start", "session_end", "n_events"]]

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")
