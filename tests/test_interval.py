"""Interval join: bin-and-replicate kernel vs brute force — keys,
bucket-straddling intervals, inclusive bounds, empty sides."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gazetteer_search_ray.pipelines.interval import interval_join


def _brute(points, ivls, key=None):
    out = []
    for _, p in points.iterrows():
        for _, r in ivls.iterrows():
            if key and p[key] != r[key]:
                continue
            if r["s"] <= p["on"] <= r["e"]:
                out.append((p["pid"], r["iid"]))
    return sorted(out)


def _run(points, ivls, w, key=None):
    import ray.data as rd

    got = interval_join(
        rd.from_arrow(pa.Table.from_pandas(points)).repartition(3),
        rd.from_arrow(pa.Table.from_pandas(ivls)).repartition(3),
        on_col="on", start_col="s", end_col="e",
        bucket_width=w, key_col=key,
        point_cols=["pid"], interval_cols=["iid"],
    ).to_pandas()
    if got.empty:  # Ray to_pandas drops columns on an all-empty dataset
        return []
    return sorted(map(tuple, got[["pid", "iid"]].values.tolist()))


@pytest.mark.parametrize("w", [5, 17, 1000])
def test_interval_join_matches_bruteforce(ray_session, w):
    rng = np.random.default_rng(3)
    points = pd.DataFrame({
        "pid": np.arange(200, dtype=np.int64),
        "on": rng.integers(0, 300, 200),
        "k": rng.integers(0, 5, 200),
    })
    ivls = pd.DataFrame({
        "iid": np.arange(40, dtype=np.int64),
        "s": rng.integers(0, 280, 40),
        "k": rng.integers(0, 5, 40),
    })
    ivls["e"] = ivls["s"] + rng.integers(0, 60, 40)  # straddles buckets
    assert _run(points, ivls, w) == _brute(points, ivls)


@pytest.mark.parametrize("w", [7, 50])
def test_interval_join_keyed(ray_session, w):
    rng = np.random.default_rng(4)
    points = pd.DataFrame({
        "pid": np.arange(150, dtype=np.int64),
        "on": rng.integers(0, 200, 150),
        "k": rng.integers(0, 4, 150),
    })
    ivls = pd.DataFrame({
        "iid": np.arange(30, dtype=np.int64),
        "s": rng.integers(0, 190, 30),
        "k": rng.integers(0, 4, 30),
    })
    ivls["e"] = ivls["s"] + rng.integers(0, 40, 30)
    assert _run(points, ivls, w, key="k") == _brute(points, ivls, key="k")


def test_interval_join_inclusive_bounds(ray_session):
    points = pd.DataFrame({"pid": [0, 1, 2], "on": [10, 20, 21]})
    ivls = pd.DataFrame({"iid": [7], "s": [10], "e": [20]})
    assert _run(points, ivls, 8) == [(0, 7), (1, 7)]


def test_interval_join_no_matches(ray_session):
    points = pd.DataFrame({"pid": [0], "on": [100]})
    ivls = pd.DataFrame({"iid": [1], "s": [0], "e": [50]})
    assert _run(points, ivls, 10) == []


def test_interval_join_string_keys(ray_session):
    rng = np.random.default_rng(8)
    ks = np.array(["alpha", "beta", "gamma"])
    points = pd.DataFrame({
        "pid": np.arange(80, dtype=np.int64),
        "on": rng.integers(0, 120, 80),
        "k": ks[rng.integers(0, 3, 80)],
    })
    ivls = pd.DataFrame({
        "iid": np.arange(20, dtype=np.int64),
        "s": rng.integers(0, 110, 20),
        "k": ks[rng.integers(0, 3, 20)],
    })
    ivls["e"] = ivls["s"] + rng.integers(0, 30, 20)
    assert _run(points, ivls, 25, key="k") == _brute(points, ivls, key="k")
