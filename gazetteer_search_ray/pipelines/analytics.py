"""Multi-level / reshaping analytics operators: ROLLUP and CUBE
counts, pivot tables, global NTILE bucketing, per-group correlation,
and z-score outlier detection.

The reference's only aggregate reporting is the single-process
tag-value statistics job (``diff/TagStatisticsJob.groovy``) and the
import counters (``imp/addr/ImportObjectParser.java:215-237``) — flat
one-level GROUP BYs.  These operators generalize that to the
multi-level reporting a corpus-curation pipeline needs (per
lang × source coverage matrices, quality-tier assignment, per-type
metric correlations, outlier audits) while keeping every exchange
group-cardinality-bounded.

Scale shapes (the 100-TB lens, per operator):

* **rollup/cube/pivot counts** — ONE pass of per-batch partial
  counting (vectorized run-length over a lexsorted key matrix — the
  pre-aggregation combiner), then a ``groupby`` over *partials* whose
  size is ≤ distinct-combos × batches, never the input rows.  The
  coarser ROLLUP/CUBE levels and the pivot reshape are derived on the
  driver from the finest-level aggregate, which is
  O(distinct key combos) — for categorical dims (lang, source,
  domain) that is KBs at any corpus size.
* **global NTILE** — one range-sort exchange via
  :func:`~gazetteer_search_ray.pipelines.packing.global_row_number`
  (O(#blocks) driver state), then a closed-form vectorized bucket
  formula per row.  Nothing row-sized reaches the driver.
* **per-group correlation / z-score outliers** — numerically stable
  TWO-PASS sufficient statistics: pass 1 computes per-group
  ``(n, Σx, Σy)`` partials (combiner + tiny groupby), the driver
  derives means and broadcasts them via ``ray.put``; pass 2 sums the
  *centered* cross-products per group.  Centering first keeps the
  float64 error relative to the data's spread (not its magnitude —
  epoch-microsecond timestamps would otherwise destroy the
  covariance in catastrophic cancellation), which is what lets the
  results agree with DuckDB's streaming-stable ``corr`` /
  ``stddev_samp`` aggregates to 6 decimals in the oracle gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

ALL_MARKER = "<all>"


def _partial_counts(ds, cols: list[str]):
    """Per-batch pre-aggregated counts over ``cols`` → a Dataset of
    ``(cols..., _pc)`` partials, then ONE small ``groupby`` to the
    exact finest-level counts.  The shuffle moves partial rows
    (≤ combos × batches), never input rows."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(cols).append_column("_pc", pa.array([], pa.int64()))
        g = t.select(cols).group_by(cols).aggregate([([], "count_all")])
        return g.rename_columns(cols + ["_pc"])

    parts = ds.select_columns(cols).map_batches(partial, batch_format="pyarrow")
    return parts.groupby(cols).aggregate(Sum("_pc", alias_name="cnt"))


def rollup_counts(ds, cols: list[str], cube: bool = False,
                  all_marker: str = ALL_MARKER) -> pd.DataFrame:
    """Multi-level counts: ``GROUP BY ROLLUP(cols)`` (prefix levels)
    or ``GROUP BY CUBE(cols)`` (every subset) in ONE input pass.

    The finest-level aggregate (exact, via :func:`_partial_counts`) is
    group-cardinality-sized; every coarser level is a re-aggregation
    of THAT table on the driver — the input is never re-read.
    Rolled-up dimensions carry ``all_marker`` (the data must not
    contain it).  Returns ``(cols..., cnt)`` sorted by ``cols``.
    """
    finest = _partial_counts(ds, cols).to_pandas()
    if finest.empty:
        return pd.DataFrame(columns=cols + ["cnt"])
    levels: list[tuple] = []
    if cube:
        for mask in range(1 << len(cols)):
            levels.append(tuple(c for i, c in enumerate(cols)
                                if mask >> i & 1))
    else:
        for k in range(len(cols) + 1):
            levels.append(tuple(cols[:k]))
    outs = []
    for keep in levels:
        if len(keep) == len(cols):
            lvl = finest.copy()
        elif keep:
            lvl = (finest.groupby(list(keep), as_index=False)["cnt"].sum())
        else:
            lvl = pd.DataFrame({"cnt": [finest["cnt"].sum()]})
        for c in cols:
            if c not in keep:
                lvl[c] = all_marker
        outs.append(lvl[cols + ["cnt"]])
    out = pd.concat(outs, ignore_index=True)
    out["cnt"] = out["cnt"].astype(np.int64)
    return out.sort_values(cols).reset_index(drop=True)


def pivot_counts(ds, row_col: str, pivot_col: str, values: list[str],
                 prefix: str = "cnt_") -> pd.DataFrame:
    """Pivot table: one row per ``row_col`` value, one int64 count
    column per entry of ``values`` (the explicit IN-list, as in SQL
    ``PIVOT``; rows whose ``pivot_col`` is outside it are ignored).

    Same single-pass partial-count core as :func:`rollup_counts`; the
    reshape happens on the driver over the finest aggregate
    (O(row values × pivot values)).  Returns sorted by ``row_col``.
    """
    finest = _partial_counts(ds, [row_col, pivot_col]).to_pandas()
    finest = finest[finest[pivot_col].isin(values)]
    wide = (finest.pivot_table(index=row_col, columns=pivot_col,
                               values="cnt", aggfunc="sum", fill_value=0)
            .reindex(columns=values, fill_value=0))
    wide = wide.rename(columns={v: f"{prefix}{v}" for v in values})
    wide = wide.reset_index().sort_values(row_col).reset_index(drop=True)
    for v in values:
        wide[f"{prefix}{v}"] = wide[f"{prefix}{v}"].astype(np.int64)
    wide.columns.name = None
    return wide[[row_col] + [f"{prefix}{v}" for v in values]]


def global_ntile(ds, col: str, n_tiles: int, id_col: str = "doc_id"):
    """``NTILE(n) OVER (ORDER BY col, id)``: assign every row to one of
    ``n_tiles`` equal-size buckets of the global order (quality /
    curriculum tiers).  SQL semantics: with ``n`` rows the first
    ``n % n_tiles`` buckets get ``n // n_tiles + 1`` rows.

    One sort exchange (:func:`~.packing.global_row_number`), then the
    closed-form bucket index per row — no second shuffle, nothing
    row-sized on the driver.  Returns a Dataset of
    ``(id_col, col, tile)``.
    """
    from .packing import global_row_number

    if n_tiles <= 0:
        raise ValueError("n_tiles must be positive")
    numbered = global_row_number(
        ds.select_columns([col, id_col]), [col, id_col], out_col="_rk"
    ).materialize()
    n = numbered.count()
    q, r = divmod(n, n_tiles)

    def assign(t: pa.Table) -> pa.Table:
        rk = t["_rk"].to_numpy()
        if q == 0:
            tile = rk + 1  # fewer rows than tiles: row i → tile i+1
        else:
            cut = r * (q + 1)
            tile = np.where(rk < cut, rk // (q + 1), r + (rk - cut) // q) + 1
        return pa.table({
            id_col: t[id_col], col: t[col],
            "tile": pa.array(tile.astype(np.int64)),
        })

    return numbered.map_batches(assign, batch_format="pyarrow")


def _group_moment_pass(ds, group_col: str, x_col: str, y_col: str,
                       means: pd.DataFrame | None):
    """One pass of per-group sufficient statistics.  With
    ``means=None``: ``(n, Σx, Σy)``.  With a broadcast means frame:
    centered ``(Σ(x−mx)², Σ(y−my)², Σ(x−mx)(y−my))``."""
    import ray
    from ray.data.aggregate import Sum

    ref = None if means is None else ray.put(
        (pa.array(means[group_col]),
         means["_mx"].to_numpy(np.float64),
         means["_my"].to_numpy(np.float64)))

    class Partial:
        def __init__(self):
            self.m = None if ref is None else ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            names = ([group_col, "_n", "_sx", "_sy"] if self.m is None
                     else [group_col, "_sxx", "_syy", "_sxy"])
            gtype = t.schema.field(group_col).type
            if t.num_rows == 0:
                return pa.table(
                    [pa.array([], gtype)]
                    + [pa.array([], pa.int64() if n == "_n" else pa.float64())
                       for n in names[1:]], names=names)
            g = t[group_col].combine_chunks()
            x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
            y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
            # vectorized per-group reduction: factorize then bincount
            codes = pc.index_in(g, value_set=g.unique()).to_numpy(
                zero_copy_only=False).astype(np.int64)
            k = int(codes.max()) + 1
            if self.m is None:
                out = [np.bincount(codes, minlength=k).astype(np.float64),
                       np.bincount(codes, weights=x, minlength=k),
                       np.bincount(codes, weights=y, minlength=k)]
            else:
                gm, mxs, mys = self.m
                gi = pc.index_in(g.unique(), value_set=gm).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                dx = x - mxs[gi[codes]]
                dy = y - mys[gi[codes]]
                out = [np.bincount(codes, weights=dx * dx, minlength=k),
                       np.bincount(codes, weights=dy * dy, minlength=k),
                       np.bincount(codes, weights=dx * dy, minlength=k)]
            cols = [g.unique()]
            if self.m is None:
                cols.append(pa.array(out[0].astype(np.int64)))
                cols += [pa.array(o) for o in out[1:]]
            else:
                cols += [pa.array(o) for o in out]
            return pa.table(cols, names=names)

    need = list(dict.fromkeys([group_col, x_col, y_col]))
    parts = ds.select_columns(need).map_batches(
        Partial, batch_format="pyarrow", concurrency=(2, 16))
    aggs = ([Sum("_n", alias_name="_n"), Sum("_sx", alias_name="_sx"),
             Sum("_sy", alias_name="_sy")] if means is None else
            [Sum("_sxx", alias_name="_sxx"), Sum("_syy", alias_name="_syy"),
             Sum("_sxy", alias_name="_sxy")])
    return parts.groupby(group_col).aggregate(*aggs).to_pandas()


def corr_by_group(ds, group_col: str, x_col: str, y_col: str,
                  nd: int = 6, nd_covar: int = 2) -> pd.DataFrame:
    """Per-group Pearson correlation + sample covariance of two
    numeric columns — ``corr(x, y)`` / ``covar_samp(x, y)`` per group.

    Two streaming passes (means, then centered cross-moments — module
    docstring) with per-batch vectorized combiners; both shuffles move
    O(groups × batches) partial rows.  Returns
    ``(group, n, corr, covar)`` sorted by group; ``corr`` (an O(1)
    quantity) rounds to ``nd``, ``covar`` to ``nd_covar`` — covariance
    scales with x·y magnitude, so its absolute rounding quantum must
    sit well above cross-engine float-summation noise (~1e3 ulp for
    1e6-magnitude statistics under different accumulation orders).
    Groups with n < 2 or zero variance yield NaN (SQL NULL).
    """
    means = _group_moment_pass(ds, group_col, x_col, y_col, None)
    if means.empty:
        return pd.DataFrame(columns=[group_col, "n", "corr", "covar"])
    means["_mx"] = means["_sx"] / means["_n"]
    means["_my"] = means["_sy"] / means["_n"]
    cent = _group_moment_pass(ds, group_col, x_col, y_col, means)
    out = means.merge(cent, on=group_col)
    n = out["_n"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = out["_sxy"] / np.sqrt(out["_sxx"] * out["_syy"])
        covar = np.where(n > 1, out["_sxy"] / (n - 1), np.nan)
    res = pd.DataFrame({
        group_col: out[group_col], "n": out["_n"].astype(np.int64),
        "corr": np.round(corr.to_numpy(np.float64), nd),
        "covar": np.round(covar, nd_covar),
    })
    return res.sort_values(group_col).reset_index(drop=True)


def zscore_outliers(ds, group_col: str, val_col: str, id_col: str,
                    thresh: float = 2.0, nd: int = 6):
    """Per-group z-score outlier report: rows with
    ``|v − mean_g| / stddev_samp_g > thresh`` (metric-audit staple:
    anomalous event values, degenerate quality scores).

    Pass 1+2 compute per-group mean and sample stddev with the same
    centered two-pass stability as :func:`corr_by_group`; the tiny
    ``(group, mean, sd)`` table is broadcast via ``ray.put`` and the
    final filter is one stateless vectorized pass — no join shuffle.
    Returns a Dataset of ``(id_col, group_col, z)`` (z rounded).
    """
    import ray

    means = _group_moment_pass(ds, group_col, val_col, val_col, None)
    if means.empty:
        return ds.select_columns([id_col, group_col]).map_batches(
            lambda t: t.append_column("z", pa.array([], pa.float64())),
            batch_format="pyarrow")
    means["_mx"] = means["_sx"] / means["_n"]
    means["_my"] = means["_mx"]
    cent = _group_moment_pass(ds, group_col, val_col, val_col, means)
    st = means.merge(cent, on=group_col)
    n = st["_n"].to_numpy(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        sd = np.sqrt(st["_sxx"].to_numpy(np.float64) / np.where(n > 1, n - 1, np.nan))
    ref = ray.put((pa.array(st[group_col]),
                   st["_mx"].to_numpy(np.float64), sd))

    class Filter:
        def __init__(self):
            self.groups, self.mean, self.sd = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            schema = pa.schema([t.schema.field(id_col),
                                t.schema.field(group_col),
                                pa.field("z", pa.float64())])
            if t.num_rows == 0:
                return schema.empty_table()
            gi = pc.index_in(t[group_col].combine_chunks(),
                             value_set=self.groups).to_numpy(
                zero_copy_only=False).astype(np.int64)
            v = t[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
            with np.errstate(invalid="ignore"):
                z = (v - self.mean[gi]) / self.sd[gi]
            keep = np.abs(z) > thresh
            sel = t.filter(pa.array(keep))
            return pa.table([sel[id_col], sel[group_col],
                             pa.array(np.round(z[keep], nd))], schema=schema)

    return ds.select_columns([id_col, group_col, val_col]).map_batches(
        Filter, batch_format="pyarrow", concurrency=(2, 16))


def weighted_sample_hash(ds, group_col: str, weights: dict[str, float],
                         id_col: str = "doc_id", default: float = 0.0):
    """Per-group weighted Bernoulli sampling with the engine's
    deterministic Knuth multiplicative hash (``relational.sample_hash``
    arithmetic): keep a row iff
    ``hash(id) mod 2^32 < weight[group] · 2^32`` — the data-mixing
    primitive for downweighting over-represented sources without RNG
    state, reproducible across runs and engines.

    Stateless single pass; the weight table is a broadcast-in-closure
    constant (KB-sized).  Rows whose group is absent from ``weights``
    use ``default``.
    """
    names, thresholds = zip(*[
        (g, np.uint64(int(w * 4294967296))) for g, w in weights.items()
    ]) if weights else ((), ())
    name_arr = pa.array(list(names))
    thr = np.asarray(thresholds, dtype=np.uint64)
    dflt = np.uint64(int(default * 4294967296))

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = t[id_col].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(4294967296)
        gi = pc.fill_null(
            pc.index_in(t[group_col].combine_chunks(), value_set=name_arr),
            -1).to_numpy(zero_copy_only=False).astype(np.int64)
        miss = gi < 0
        gidx = np.where(miss, 0, gi)
        cut = np.where(miss, dflt, thr[gidx] if thr.size else dflt)
        return t.filter(pa.array(h < cut))

    return ds.map_batches(f, batch_format="pyarrow")


def split_assign(ds, splits: list[tuple[str, float]],
                 id_col: str = "doc_id", out_col: str = "split"):
    """Deterministic train/val/test split assignment: label each row by
    where its Knuth hash (``relational.sample_hash`` arithmetic) falls
    among cumulative fraction cutoffs.  ``splits`` is
    ``[(label, frac), ...]``; fracs must sum to ≤ 1, the remainder
    falls to the LAST label.  Stateless single pass, reproducible
    across runs/engines, membership is a pure function of the id — a
    doc never migrates between splits when the corpus grows (the
    holdout-stability property hash splits exist for).
    """
    labels = [s[0] for s in splits]
    cuts = np.cumsum([s[1] for s in splits])[:-1]
    cut_ints = (cuts * 4294967296).astype(np.uint64)
    lab_arr = pa.array(labels)

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(4294967296)
        idx = np.searchsorted(cut_ints, h, side="right")
        return t.append_column(
            out_col, pc.take(lab_arr, pa.array(idx.astype(np.int64))))

    return ds.map_batches(f, batch_format="pyarrow")


def deterministic_shuffle_order(ds, id_col: str = "doc_id",
                                out_col: str = "pos"):
    """Deterministic pseudo-random global ordering — the reproducible
    training-data shuffle: position = rank of
    ``(hash(id) mod 2^32, id)`` under the Knuth multiplicative hash.
    Same arithmetic as ``relational.sample_hash``, so any engine (and
    the SQL oracle) derives the identical permutation; re-running a
    failed epoch yields the same order without storing RNG state.

    One sort range exchange via :func:`~.packing.global_row_number`;
    returns a Dataset of ``(out_col, id_col)``.
    """
    from .packing import global_row_number

    def add_hash(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(4294967296)
        return t.append_column("_h", pa.array(h.astype(np.int64)))

    hashed = ds.select_columns([id_col]).map_batches(
        add_hash, batch_format="pyarrow")
    numbered = global_row_number(hashed, ["_h", id_col], out_col=out_col)
    return numbered.map_batches(
        lambda t: t.select([out_col, id_col]), batch_format="pyarrow")
