"""Relational / maintenance operators (SURVEY.md §2.5 + S4/S8/M15).

Each mirrors a reference batch-maintenance job, re-expressed as Ray Data
transforms with explicit shuffle keys:

* :func:`distinct_first_by_key` — M15/Q11 distinct-by-name: the
  reference keeps an insertion-ordered counter per name hash
  (``ImportObjectParser.java:215-237``) and filters
  ``by_name_agg_index=0`` (``builders/DistinctNameFilter.java``); the
  deterministic re-expression is groupby(key) → min(order_col).
* :func:`name_agg_index` — the full M15 counter (0..n-1 per group) via
  ``map_groups`` cumcount in doc_id order.
* :func:`join_aggregate_counts` — G2 street-usage backfill
  (``imp/addr/UpdateStreetsUsage.java:47-132``): the reference scrolls
  every street and issues per-row count searches; here it is ONE
  pre-aggregated ``groupby().count()`` on the fact side followed by a
  broadcast hash-join into the dimension side (``ray.put`` once, dict
  lookup per batch — no shuffle of the dimension table).
* :func:`group_stats` — G3 tag-value statistics
  (``api/osmdoc/TagStatisticsAPI.java:37-120``).
* :func:`delete_by_query` — S4 (``AddressesImporter.java:98-108``):
  anti-filter as a vectorized predicate.
* :func:`paged_scroll` — S8 ``search_after``-keyed pagination
  (``imp/PagedScroll.java:40-87``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def distinct_first_by_key(ds, keys: list[str], order_col: str = "doc_id"):
    """One row (min order_col + group size) per distinct key tuple."""
    from ray.data.aggregate import Count, Min

    return ds.groupby(keys).aggregate(
        Min(order_col, alias_name=order_col), Count(alias_name="group_count")
    )


def name_agg_index(ds, keys: list[str], order_col: str = "doc_id",
                   out_col: str = "by_name_agg_index"):
    """Running 0..n-1 index per key group in deterministic order (M15)."""

    def cumcount(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="stable")
        g[out_col] = np.arange(len(g), dtype=np.int64)
        return g

    return ds.groupby(keys).map_groups(cumcount, batch_format="pandas")


def join_aggregate_counts(
    fact_ds,
    fact_key: str,
    dim_ds,
    dim_key: str,
    out_col: str = "ref_count",
):
    """dim ⟕ (fact groupby key → count): broadcast the small aggregate.

    The fact side pre-aggregates per batch (combiner) so the groupby
    shuffles one row per key per batch instead of every fact row.
    """
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([fact_key], use_threads=False).aggregate(
            [(fact_key, "count")]
        )
        return g.rename_columns([fact_key, "p_cnt"])

    counts = (
        fact_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(fact_key)
        .aggregate(Sum("p_cnt", alias_name=out_col))
    )
    cdf = counts.to_pandas()  # one row per key — small by construction
    lookup_ref = ray.put(dict(zip(cdf[fact_key], cdf[out_col].astype(np.int64))))

    class Backfill:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch[dim_key].to_pylist()
            vals = np.array([self.lookup.get(k, 0) for k in keys], dtype=np.int64)
            return batch.append_column(out_col, pa.array(vals))

    return dim_ds.map_batches(Backfill, batch_format="pyarrow", concurrency=2)


def group_stats(ds, col: str, alias: str = "cnt"):
    from ray.data.aggregate import Count

    return ds.groupby(col).aggregate(Count(alias_name=alias))


def delete_by_query(ds, col: str, values: tuple):
    """Anti-filter: drop rows whose col ∈ values (vectorized)."""
    vals = pa.array(list(values))

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t[col], value_set=vals)))

    return ds.map_batches(f, batch_format="pyarrow")


def paged_scroll(ds, order_col: str, after, page_size: int,
                 filter_col: str | None = None, filter_val=None):
    """One ``search_after`` page: filter → keyed range scan → limit."""

    def f(t: pa.Table) -> pa.Table:
        if filter_col is not None:
            t = t.filter(pc.equal(t[filter_col], filter_val))
        return t.filter(pc.greater(t[order_col], after))

    return ds.map_batches(f, batch_format="pyarrow").sort(order_col).limit(page_size)
