"""Distributed as-of join (most-recent-at-or-before match).

The reference engine is a batch geocoder with no temporal operators
(SURVEY.md §2.5), but event-log enrichment — "attach the latest
reading/click/price at or before each fact row" — is a staple of
large-scale training-data pipelines, so it ships as a first-class
operator with a DuckDB ``ASOF JOIN`` oracle.

Ray Data has no asof/range join; the composition here is the same
sort-exchange + complete-run resolution + boundary-run passthrough
pattern as the LSH band shuffle (``dedup.py:_RunPairEmitter``) and the
postings merge (``stages/postings.py``):

1. union both sides into one thin table tagged ``__side`` (right=0,
   left=1) and ``sort([key, on, __side])`` — one range exchange, the
   only shuffle in the operator;
2. per sorted block, every key-run strictly interior to the block is
   COMPLETE (a global sort keeps equal keys contiguous), so its left
   rows resolve exactly with one vectorized pass: a cumulative-max of
   right-row indices gives each left row its latest at-or-before right
   row, and the ``acc >= run_start`` guard resets the carry at run
   heads without any per-group Python;
3. only the first/last run of each block — the O(#blocks) rows that may
   straddle a range boundary — reach the driver, where the identical
   kernel resolves them; the fix-up unions back in as one small block.

Scale notes: the shuffle ships (key, on, side, payload) only — callers
should project both sides to needed columns first.  A key hotter than a
sort block degrades to the driver fix-up for that key only (same
documented bound as the dedup band shuffle).  Right-side rows must be
unique per (key, on) for deterministic payloads — pre-reduce with a
groupby max/last upstream, as ``driver_queries.q_events_asof`` does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SIDE_R, _SIDE_L = 0, 1
_SIDE = "__side"


def _tag(t: pa.Table, side: int, all_names: list[str],
         types: dict[str, pa.DataType]) -> pa.Table:
    """Conform one side's batch to the union schema: missing columns
    become typed nulls, plus the ``__side`` tag."""
    n = t.num_rows
    cols = {}
    for name in all_names:
        if name in t.column_names:
            cols[name] = t[name]
        else:
            cols[name] = pa.nulls(n, types[name])
    cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
    return pa.table(cols)


def _run_heads(key: np.ndarray) -> np.ndarray:
    if key.size == 0:
        return np.array([], dtype=np.int64)
    # elementwise != works for numeric and object (string) keys alike
    return np.concatenate(([0], np.flatnonzero(key[1:] != key[:-1]) + 1))


def _resolve_sorted(t: pa.Table, key_col: str, left_cols: list[str],
                    right_cols: list[str]) -> pa.Table:
    """Exact asof over a (key, on, side)-sorted table whose key-runs are
    all complete: returns left rows with matched right payload (typed
    null where no right row precedes).  Fully vectorized."""
    n = t.num_rows
    key = t[key_col].to_numpy(zero_copy_only=False)
    side = t[_SIDE].to_numpy(zero_copy_only=False)
    idx = np.arange(n, dtype=np.int64)
    heads = _run_heads(key)
    run_len = np.diff(np.concatenate((heads, [n])))
    run_start = np.repeat(heads, run_len)
    # latest right row at-or-before each position, reset per key-run:
    # a stale carry from a previous run always has index < run_start
    acc = np.maximum.accumulate(np.where(side == _SIDE_R, idx, -1))
    match = np.where(acc >= run_start, acc, -1)
    lmask = side == _SIDE_L
    lidx = idx[lmask]
    m = match[lmask]
    take_l = pa.array(lidx)
    take_r = pa.array(m, mask=m < 0)  # null index -> null payload
    cols = {c: t[c].take(take_l) for c in left_cols}
    cols.update({c: t[c].take(take_r) for c in right_cols})
    return pa.table(cols)


class _MixedResolver:
    """ONE ``map_batches`` pass over the sorted exchange emitting both
    outputs from the same view of each batch — resolved interior-run
    left rows (``__kind=0``) AND the raw first/last-run boundary rows
    (``__kind=1``) — so exactly-once row coverage is structural, not an
    implicit complement property of two independent passes whose batch
    slicing might differ.  Each call also asserts per-batch left-row
    conservation (left in == resolved out + boundary left out)."""

    def __init__(self, key_col, left_cols, right_cols):
        self.key_col, self.left_cols, self.right_cols = \
            key_col, left_cols, right_cols

    def __call__(self, t: pa.Table) -> pa.Table:
        key = t[self.key_col].to_numpy(zero_copy_only=False)
        heads = _run_heads(key)
        if heads.size <= 2:  # <=2 runs: nothing is provably complete
            lo = hi = 0
        else:
            lo, hi = int(heads[1]), int(heads[-1])
        resolved = _resolve_sorted(
            t.slice(lo, hi - lo), self.key_col, self.left_cols,
            self.right_cols)
        bmask = np.ones(t.num_rows, dtype=bool)
        bmask[lo:hi] = False
        bnd = t.filter(pa.array(bmask))
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        n_left_in = int((side == _SIDE_L).sum())
        n_left_bnd = int(
            (bnd[_SIDE].to_numpy(zero_copy_only=False) == _SIDE_L).sum())
        assert resolved.num_rows + n_left_bnd == n_left_in, (
            "asof row-conservation violated within a sorted block")
        resolved = resolved.append_column(
            _SIDE, pa.array(np.full(resolved.num_rows, -1, np.int8)))
        out = pa.concat_tables([
            resolved.append_column(
                "__kind", pa.array(np.zeros(resolved.num_rows, np.int8))),
            bnd.append_column(
                "__kind", pa.array(np.ones(bnd.num_rows, np.int8))),
        ], promote_options="default")
        return out


def asof_join(left_ds, right_ds, key_col: str, on_col: str,
              right_tiebreak: str | None = None):
    """Asof-LEFT-join two Datasets: for each left row, attach the right
    row with equal ``key_col`` and the greatest ``on_col`` <= the left
    row's (typed nulls when none exists).

    ``on_col`` must be an ordered numeric column on both sides (cast
    timestamps to int64 upstream).  All other column names must be
    disjoint between the sides; the right side's non-key/on columns
    become the attached payload.  Right rows should be unique per
    (key, on) — with duplicates the last in sort order wins, which is
    nondeterministic UNLESS ``right_tiebreak`` names a right payload
    column: it is appended to the sort key, so among equal
    (key, on) right rows the row with the MAX tiebreak value wins
    (the cummax kernel picks the last row of the run).  This folds
    the usual pre-reduce ``groupby(key, on).max(payload)`` into the
    one sort exchange the join already pays — callers with a single
    payload column should prefer it over a separate groupby shuffle.

    Returns a Dataset with the left schema + right payload columns.
    """
    import ray.data as rd

    ls, rs = left_ds.schema(), right_ds.schema()
    right_payload = [c for c in rs.names if c not in (key_col, on_col)]
    clash = set(right_payload) & set(ls.names)
    if clash:
        raise ValueError(f"right payload columns clash with left: {clash}")
    left_cols = list(ls.names)
    all_names = left_cols + right_payload
    types = dict(zip(ls.names, ls.types))
    types.update({n: t for n, t in zip(rs.names, rs.types)
                  if n in right_payload})
    # right rows carry `on` in the left-named on column for the sort;
    # ALSO keep the payload copy if the caller wants the matched on
    # value (add it as an explicit extra right column upstream).
    tagged_l = left_ds.map_batches(
        lambda t: _tag(t, _SIDE_L, all_names, types), batch_format="pyarrow")
    tagged_r = right_ds.map_batches(
        lambda t: _tag(t, _SIDE_R, all_names, types), batch_format="pyarrow")
    sort_keys = [key_col, on_col, _SIDE]
    if right_tiebreak is not None:
        if right_tiebreak not in right_payload:
            raise ValueError(
                f"right_tiebreak {right_tiebreak!r} is not a right "
                f"payload column {right_payload}")
        # left rows hold a typed null here; _SIDE already separates the
        # sides within a (key, on) run, so null placement is irrelevant
        sort_keys.append(right_tiebreak)
    # ONE range exchange, then ONE pass over the sorted blocks emitting
    # both resolved rows and boundary rows from the same batch view (the
    # exactly-once coverage is structural — see _MixedResolver)
    mixed = (
        tagged_l.union(tagged_r)
        .sort(sort_keys)
        .map_batches(_MixedResolver(key_col, left_cols, right_payload),
                     batch_format="pyarrow")
        .materialize()
    )
    resolved = mixed.map_batches(
        lambda t: t.filter(pc.equal(t["__kind"], 0)).drop_columns(
            ["__kind", _SIDE]),
        batch_format="pyarrow",
    )
    bnd_parts = [
        b for b in mixed.map_batches(
            lambda t: t.filter(pc.equal(t["__kind"], 1)).drop_columns(
                ["__kind"]),
            batch_format="pyarrow",
        ).iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    bnd = (pa.concat_tables(bnd_parts) if bnd_parts
           else pa.table({n: pa.array([], types.get(n, pa.int8()))
                          for n in all_names + [_SIDE]}))
    if bnd.num_rows:
        # boundary rows from different blocks arrive unordered; re-sort
        # the SMALL set (O(#blocks) runs) and run the same exact kernel
        bnd = bnd.sort_by(
            [(k, "ascending") for k in sort_keys])
        fix = _resolve_sorted(bnd, key_col, left_cols, right_payload)
        if fix.num_rows:
            resolved = resolved.union(rd.from_arrow(fix))
    return resolved
