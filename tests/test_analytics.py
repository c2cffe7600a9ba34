"""Multi-level analytics operators (pipelines/analytics.py): ROLLUP /
CUBE / pivot counts, global NTILE, per-group correlation, z-score
outliers, weighted hash sampling, deterministic shuffle order,
keep-latest — checked against pandas/numpy brute-force references on
shuffled multi-block inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gazetteer_search_ray.pipelines.analytics import (
    ALL_MARKER,
    corr_by_group,
    deterministic_shuffle_order,
    global_ntile,
    pivot_counts,
    rollup_counts,
    weighted_sample_hash,
    zscore_outliers,
)
from gazetteer_search_ray.pipelines.relational import keep_latest


def _ds(df: pd.DataFrame, nparts: int = 7):
    import ray.data as rd

    return rd.from_pandas(df).repartition(nparts)


@pytest.fixture(scope="module")
def cat_df() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    n = 3_000
    return pd.DataFrame({
        "doc_id": rng.permutation(n).astype(np.int64),
        "a": rng.choice(["p", "q", "r"], n),
        "b": rng.choice(["x", "y", "z", "w"], n),
        "v": rng.normal(50.0, 12.0, n),
    })


def test_rollup_counts(ray_session, cat_df):
    out = rollup_counts(_ds(cat_df), ["a", "b"])
    finest = cat_df.groupby(["a", "b"]).size()
    # finest level rows match exactly
    got = out[(out["a"] != ALL_MARKER) & (out["b"] != ALL_MARKER)]
    assert dict(zip(zip(got["a"], got["b"]), got["cnt"])) == finest.to_dict()
    # one-dim level and grand total
    lvl_a = out[(out["a"] != ALL_MARKER) & (out["b"] == ALL_MARKER)]
    assert dict(zip(lvl_a["a"], lvl_a["cnt"])) == \
        cat_df.groupby("a").size().to_dict()
    grand = out[(out["a"] == ALL_MARKER) & (out["b"] == ALL_MARKER)]
    assert grand["cnt"].tolist() == [len(cat_df)]
    # ROLLUP has no (ALL, b) level
    assert ((out["a"] == ALL_MARKER) & (out["b"] != ALL_MARKER)).sum() == 0


def test_cube_counts_has_all_levels(ray_session, cat_df):
    out = rollup_counts(_ds(cat_df), ["a", "b"], cube=True)
    lvl_b = out[(out["a"] == ALL_MARKER) & (out["b"] != ALL_MARKER)]
    assert dict(zip(lvl_b["b"], lvl_b["cnt"])) == \
        cat_df.groupby("b").size().to_dict()
    n_finest = cat_df.groupby(["a", "b"]).ngroups
    assert len(out) == n_finest + cat_df["a"].nunique() + \
        cat_df["b"].nunique() + 1


def test_pivot_counts(ray_session, cat_df):
    vals = ["x", "y", "z"]  # deliberately excludes 'w'
    out = pivot_counts(_ds(cat_df), "a", "b", vals)
    assert list(out.columns) == ["a", "cnt_x", "cnt_y", "cnt_z"]
    ref = (cat_df[cat_df["b"].isin(vals)]
           .pivot_table(index="a", columns="b", values="doc_id",
                        aggfunc="count", fill_value=0))
    for _, row in out.iterrows():
        for v in vals:
            assert row[f"cnt_{v}"] == ref.loc[row["a"], v]


@pytest.mark.parametrize("n_tiles", [1, 4, 7])
def test_global_ntile(ray_session, cat_df, n_tiles):
    out = (global_ntile(_ds(cat_df), "v", n_tiles)
           .to_pandas().sort_values(["v", "doc_id"]).reset_index(drop=True))
    n = len(cat_df)
    q, r = divmod(n, n_tiles)
    sizes = out.groupby("tile").size()
    assert sizes.index.tolist() == list(range(1, n_tiles + 1))
    assert sizes.tolist() == [q + 1] * r + [q] * (n_tiles - r)
    # tiles are contiguous in (v, doc_id) order
    assert (np.diff(out["tile"].to_numpy()) >= 0).all()


def test_ntile_fewer_rows_than_tiles(ray_session):
    df = pd.DataFrame({"doc_id": [3, 1, 2], "v": [9.0, 7.0, 8.0]})
    out = (global_ntile(_ds(df, 2), "v", 8)
           .to_pandas().sort_values("v").reset_index(drop=True))
    assert out["tile"].tolist() == [1, 2, 3]


def test_corr_by_group(ray_session, cat_df):
    df = cat_df.assign(y=cat_df["v"] * 0.5
                       + np.random.default_rng(3).normal(0, 5, len(cat_df)))
    out = corr_by_group(_ds(df), "a", "v", "y")
    for _, row in out.iterrows():
        sub = df[df["a"] == row["a"]]
        assert row["n"] == len(sub)
        assert row["corr"] == pytest.approx(
            np.corrcoef(sub["v"], sub["y"])[0, 1], abs=2e-6)
        assert row["covar"] == pytest.approx(
            np.cov(sub["v"], sub["y"], ddof=1)[0, 1], abs=0.02)


def test_zscore_outliers(ray_session, cat_df):
    out = (zscore_outliers(_ds(cat_df), "a", "v", "doc_id", 2.0)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    stats = cat_df.groupby("a")["v"].agg(["mean", "std", "count"])
    z = ((cat_df["v"] - cat_df["a"].map(stats["mean"]))
         / cat_df["a"].map(stats["std"]))
    want = cat_df[np.abs(z) > 2.0].sort_values("doc_id")
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert out["z"].to_numpy() == pytest.approx(
        np.round(z[np.abs(z) > 2.0].loc[want.index].to_numpy(), 6), abs=2e-6)


def test_weighted_sample_hash(ray_session, cat_df):
    w = {"p": 0.0, "q": 0.5, "r": 1.0}
    out = (weighted_sample_hash(_ds(cat_df), "a", w)
           .to_pandas())
    h = (cat_df["doc_id"].to_numpy().astype(np.uint64)
         * np.uint64(2654435761)) % np.uint64(4294967296)
    cut = cat_df["a"].map({g: np.uint64(int(x * 4294967296))
                           for g, x in w.items()}).to_numpy()
    want = cat_df[h < cut]
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])
    assert (out[out["a"] == "p"]).empty
    assert (out["a"] == "r").sum() == (cat_df["a"] == "r").sum()


def test_weighted_sample_default_for_missing_group(ray_session, cat_df):
    out = weighted_sample_hash(_ds(cat_df), "a", {"p": 1.0},
                               default=0.0).to_pandas()
    assert set(out["a"]) == {"p"}
    assert len(out) == (cat_df["a"] == "p").sum()


def test_deterministic_shuffle_order(ray_session, cat_df):
    out = (deterministic_shuffle_order(_ds(cat_df))
           .to_pandas().sort_values("pos").reset_index(drop=True))
    ids = cat_df["doc_id"].to_numpy()
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(4294967296)
    want = ids[np.lexsort((ids, h.astype(np.int64)))]
    assert out["pos"].tolist() == list(range(len(ids)))
    assert out["doc_id"].to_numpy().tolist() == want.tolist()
    # rerun yields the identical permutation (no RNG state)
    again = (deterministic_shuffle_order(_ds(cat_df, 3))
             .to_pandas().sort_values("pos").reset_index(drop=True))
    assert again["doc_id"].tolist() == out["doc_id"].tolist()


def test_keep_latest(ray_session):
    rng = np.random.default_rng(13)
    n = 2_000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "ts": rng.integers(0, 500, n).astype(np.int64),
        "rid": np.arange(n, dtype=np.int64),
    })
    out = keep_latest(_ds(df), "k", "ts", "rid")
    want = (df.sort_values(["k", "ts", "rid"],
                           ascending=[True, False, True])
            .groupby("k").head(1).sort_values("k"))
    assert out["k"].tolist() == want["k"].tolist()
    assert out["rid"].tolist() == want["rid"].tolist()
    assert out["ts"].tolist() == want["ts"].tolist()


def test_split_assign(ray_session, cat_df):
    from gazetteer_search_ray.pipelines.analytics import split_assign

    spec = [("test", 0.1), ("val", 0.1), ("train", 0.8)]
    out = split_assign(_ds(cat_df), spec).to_pandas()
    h = (cat_df["doc_id"].to_numpy().astype(np.uint64)
         * np.uint64(2654435761)) % np.uint64(4294967296)
    u = h.astype(np.float64) / 4294967296.0
    want = np.where(u < 0.1, "test", np.where(u < 0.2, "val", "train"))
    got = out.set_index("doc_id")["split"]
    assert (got.loc[cat_df["doc_id"]].to_numpy() == want).all()
    # growing the corpus never migrates an existing row's split
    bigger = pd.concat([cat_df, cat_df.assign(doc_id=cat_df["doc_id"]
                                              + 10_000)])
    again = (split_assign(_ds(bigger), spec).to_pandas()
             .set_index("doc_id")["split"])
    assert (again.loc[cat_df["doc_id"]].to_numpy()
            == got.loc[cat_df["doc_id"]].to_numpy()).all()


def test_pmi_collocations(ray_session):
    from gazetteer_search_ray.pipelines.textstats import pmi_collocations

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["new york is big", "new york new york", "big apple",
                 "york new haven", "is big is big", "new york"],
    })
    out = pmi_collocations(_ds(docs, 3), min_count=2, top=10)
    # brute-force reference
    toks = [t for s in docs["text"] for t in s.split()]
    from collections import Counter
    uc = Counter(toks)
    bc = Counter()
    for s in docs["text"]:
        ws = s.split()
        for i in range(len(ws) - 1):
            bc[ws[i] + " " + ws[i + 1]] += 1
    t_uni, t_bg = sum(uc.values()), sum(bc.values())
    for _, row in out.iterrows():
        w1, w2 = row["ngram"].split(" ")
        want = (np.log(bc[row["ngram"]]) - np.log(t_bg)
                + 2 * np.log(t_uni) - np.log(uc[w1]) - np.log(uc[w2]))
        assert bc[row["ngram"]] >= 2
        assert row["cnt"] == bc[row["ngram"]]
        assert row["pmi"] == pytest.approx(want, abs=1e-5)
    # sorted by (pmi desc, ngram)
    key = list(zip(-out["pmi"], out["ngram"]))
    assert key == sorted(key)
