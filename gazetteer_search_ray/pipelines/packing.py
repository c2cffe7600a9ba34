"""Global-order primitives: distributed prefix sums and the operators
built on them.

The reference's only global-order machinery is ES ``search_after``
pagination (``imp/PagedScroll.java:40-87``) and the insertion-ordered
name-agg counter (``imp/addr/ImportObjectParser.java:215-237``) — both
single-process scans.  At 100 TB the equivalent primitive is a
*distributed exclusive prefix sum over a sorted Dataset*: one range
exchange (``ds.sort``), one O(#blocks) driver reduction of per-block
totals, then a second embarrassingly-parallel pass that rebases each
block.  Nothing row-cardinality-sized ever reaches the driver.

Built on it here:

* :func:`global_row_number` — zipWithIndex: dense global row ids in
  key order (the distributed ``row_number() OVER (ORDER BY …)``).
* :func:`pack_spans` — LLM training-data sequence packing:
  concatenate documents in key order and chunk the token stream into
  fixed ``seq_len`` windows; emits one row per (document, window)
  span.  This is the concat-and-chunk packing used to build fixed-
  length training sequences from variable-length documents.
* :func:`exact_quantiles` — exact order statistics of a numeric
  column (rank = floor(q·(n−1))) via ``global_row_number`` + a
  vectorized rank filter; only the k requested rows reach the driver.

Partitioning assumption (documented per the custom-operator rule): the
sort keys must be UNIQUE per row — each materialized block's first key
tuple is its identity across the two passes.  ``_block_offsets``
raises if two blocks share a first key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _block_offsets(sorted_ds, order_cols: list[str],
                   weight_col: str | None = None) -> dict:
    """Exclusive prefix offsets per block of an already-sorted,
    materialized Dataset.

    Pass 1 of the prefix-sum pattern: each block emits ONE row — its
    first key tuple plus its total weight (row count, or
    ``sum(weight_col)``).  The driver sorts those O(#blocks) rows and
    cumulates.  Returns ``{first_key_tuple: global_exclusive_offset}``.
    """

    out_schema = None

    def head(t: pa.Table) -> pa.Table:
        fields = [t.schema.field(c) for c in order_cols]
        schema = pa.schema(fields + [pa.field("_w", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        if weight_col is None:
            w = t.num_rows
        else:
            w = pc.sum(t[weight_col]).as_py() or 0
        cols = [t[c].slice(0, 1) for c in order_cols]
        return pa.table(cols + [pa.array([int(w)], pa.int64())],
                        schema=schema)

    heads = sorted_ds.map_batches(
        head, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if heads.empty:
        return {}
    heads = heads.sort_values(order_cols, kind="mergesort").reset_index(
        drop=True
    )
    offs = heads["_w"].cumsum().shift(fill_value=0).astype(np.int64)
    keys = list(heads[order_cols].itertuples(index=False, name=None))
    if len(set(keys)) != len(keys):
        raise ValueError(
            "order_cols must be unique per row: two sorted blocks share "
            f"a first key (cols={order_cols})"
        )
    return dict(zip(keys, offs))


def _first_key(t: pa.Table, order_cols: list[str]) -> tuple:
    return tuple(t[c][0].as_py() for c in order_cols)


def global_row_number(ds, order_cols: list[str], out_col: str = "row_id"):
    """Dense global row ids 0..n−1 in ``order_cols`` order
    (distributed ``row_number() OVER (ORDER BY …) − 1``).

    One ``sort`` range exchange + one O(#blocks) driver reduction +
    one rebase pass; the keys must be unique per row (see module
    docstring).
    """
    import ray

    sorted_ds = ds.sort(order_cols).materialize()
    off_ref = ray.put(_block_offsets(sorted_ds, order_cols))

    class Rebase:
        def __init__(self):
            self.off = ray.get(off_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column(out_col, pa.array([], pa.int64()))
            base = self.off[_first_key(t, order_cols)]
            ids = base + np.arange(t.num_rows, dtype=np.int64)
            return t.append_column(out_col, pa.array(ids))

    return sorted_ds.map_batches(
        Rebase, batch_format="pyarrow", batch_size=None, concurrency=2
    )


def pack_spans(ds, seq_len: int, len_col: str = "n_tokens",
               id_col: str = "doc_id"):
    """Concat-and-chunk sequence packing for LLM training data.

    Documents are concatenated in ``id_col`` order into one virtual
    token stream, which is cut into fixed windows of ``seq_len``
    tokens.  Output: one row per (document, window) span —

    ``(id_col, seq_id, seq_offset, doc_offset, n_tokens)``

    where ``seq_offset``/``doc_offset`` locate the span inside the
    window / the document and ``n_tokens`` is the span length.  A long
    document emits one row per window it crosses; zero-length
    documents occupy no tokens and are dropped.

    Same shape as :func:`global_row_number` but the prefix sum runs
    over ``len_col`` instead of the row count, and the rebase pass
    does the window arithmetic vectorized (``np.repeat`` expansion —
    no Python loop over docs).
    """
    import ray

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    nonempty = ds.map_batches(
        lambda t: t.filter(pc.greater(t[len_col], 0)),
        batch_format="pyarrow",
    )
    sorted_ds = nonempty.sort([id_col]).materialize()
    off_ref = ray.put(_block_offsets(sorted_ds, [id_col], len_col))
    L = int(seq_len)

    class Emit:
        def __init__(self):
            self.off = ray.get(off_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            id_type = t.schema.field(id_col).type
            schema = pa.schema([
                pa.field(id_col, id_type), pa.field("seq_id", pa.int64()),
                pa.field("seq_offset", pa.int64()),
                pa.field("doc_offset", pa.int64()),
                pa.field("n_tokens", pa.int64()),
            ])
            if t.num_rows == 0:
                return schema.empty_table()
            lens = t[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
            base = self.off[_first_key(t, [id_col])]
            start = base + np.cumsum(lens) - lens
            end = start + lens
            first = start // L
            nspan = (end - 1) // L - first + 1
            total = int(nspan.sum())
            ridx = np.repeat(np.arange(t.num_rows), nspan)
            j = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(nspan) - nspan, nspan
            )
            seq = first[ridx] + j
            s0 = np.maximum(seq * L, start[ridx])
            s1 = np.minimum((seq + 1) * L, end[ridx])
            return pa.table(
                [
                    t[id_col].combine_chunks().take(pa.array(ridx)),
                    pa.array(seq), pa.array(s0 - seq * L),
                    pa.array(s0 - start[ridx]), pa.array(s1 - s0),
                ],
                schema=schema,
            )

    return sorted_ds.map_batches(
        Emit, batch_format="pyarrow", batch_size=None, concurrency=2
    )


def exact_quantiles(ds, col: str, qs: list[float],
                    id_col: str = "doc_id") -> pd.DataFrame:
    """Exact order statistics: the value at rank ``floor(q·(n−1))``
    for each q (0 ≤ q ≤ 1), over the full dataset.

    Distributed: one count, one :func:`global_row_number` pass over
    ``(col, id_col)`` (unique tie-break), then a vectorized
    ``is_in(rank)`` filter — exactly ``len(qs)`` rows reach the
    driver.  Returns a tiny ``(q, value)`` frame.
    """
    n = ds.count()
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                             "value": np.full(len(qs), np.nan)})
    rank_of = {float(q): int(np.floor(q * (n - 1))) for q in qs}
    want = pa.array(sorted(set(rank_of.values())), pa.int64())

    numbered = global_row_number(
        ds.select_columns([col, id_col]), [col, id_col], out_col="_rk"
    )
    hits = numbered.map_batches(
        lambda t: t.filter(pc.is_in(t["_rk"], value_set=want)),
        batch_format="pyarrow",
    ).to_pandas()
    val_by_rank = dict(zip(hits["_rk"], hits[col]))
    return pd.DataFrame({
        "q": pd.Series([float(q) for q in qs], dtype=np.float64),
        "value": [val_by_rank[rank_of[float(q)]] for q in qs],
    })
