"""Funnel / retention / ordered group-concat / TF-IDF operators:
distributed results checked against brute-force pandas references on
shuffled multi-block inputs (so interior-run kernels AND the edge-run
driver fix-up both execute)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gazetteer_search_ray.pipelines.funnel import (
    _cohort_partials,
    _funnel_depth_counts,
    funnel_steps,
    retention_cohorts,
)

STEPS = ["a", "b", "c"]


def _ds(df: pd.DataFrame, nparts: int = 7):
    import ray.data as rd

    return rd.from_pandas(df).repartition(nparts)


def _brute_funnel(df: pd.DataFrame, steps: list[str]) -> np.ndarray:
    """Reference: per user, sequential scan for strictly-increasing
    earliest step completions."""
    users = np.zeros(len(steps), dtype=np.int64)
    df = df.assign(__t=df["ts"].astype("datetime64[us]").astype(np.int64))
    for _, g in df.groupby("user_id"):
        g = g.sort_values("__t", kind="mergesort")
        prev = -(2**62)
        for k, s in enumerate(steps):
            cand = g[(g["event_type"] == s) & (g["__t"] > prev)]
            if cand.empty:
                break
            prev = int(cand["__t"].min())
            users[k] += 1
    return users


@pytest.fixture(scope="module")
def events_df() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    n = 4_000
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 120, n).astype(np.int64),
            "event_type": rng.choice(STEPS + ["x", "y"], n),
            "ts": pd.to_datetime(
                rng.integers(0, 10**6, n), unit="s", origin="2024-01-01"
            ),
        }
    )


def test_funnel_depth_counts_kernel():
    # one user: a@1 b@2 c@3 → depth 3; strictness: b at SAME ts as a
    # does not count
    key = np.array([1, 1, 1, 2, 2], dtype=np.int64)
    ts = np.array([1, 2, 3, 5, 5], dtype=np.int64)
    step = np.array([0, 1, 2, 0, 1], dtype=np.int64)
    counts = _funnel_depth_counts(key, ts, step, 3)
    assert counts.tolist() == [0, 1, 0, 1]  # user2 depth1, user1 depth3


def test_funnel_out_of_order_steps_do_not_count():
    # b before a: depth stops at 1 (the a), the early b is not reused
    key = np.array([1, 1], dtype=np.int64)
    ts = np.array([1, 2], dtype=np.int64)
    step = np.array([1, 0], dtype=np.int64)  # b@1, a@2
    counts = _funnel_depth_counts(key, ts, step, 3)
    assert counts.tolist() == [0, 1, 0, 0]


def test_funnel_matches_bruteforce(ray_session, events_df):
    out = funnel_steps(_ds(events_df), STEPS)
    expect = _brute_funnel(events_df, STEPS)
    assert out["users"].to_numpy().tolist() == expect.tolist()
    assert out["step"].tolist() == [1, 2, 3]
    # monotone non-increasing
    assert (np.diff(out["users"].to_numpy()) <= 0).all()


def test_cohort_partials_kernel():
    # user 1 active days [3, 3, 5]; user 2 day [4]
    key = np.array([1, 1, 1, 2], dtype=np.int64)
    day = np.array([3, 3, 5, 4], dtype=np.int64)
    co, off, cnt = _cohort_partials(key, day)
    got = sorted(zip(co.tolist(), off.tolist(), cnt.tolist()))
    assert got == [(3, 0, 1), (3, 2, 1), (4, 0, 1)]


def test_retention_matches_bruteforce(ray_session, events_df):
    out = retention_cohorts(_ds(events_df))
    df = events_df.copy()
    df["d"] = df["ts"].dt.floor("D").astype("datetime64[s]").astype(
        np.int64) // 86_400
    ud = df[["user_id", "d"]].drop_duplicates()
    cd = ud.groupby("user_id")["d"].min().rename("cd")
    m = ud.join(cd, on="user_id")
    expect = (
        m.assign(off=m["d"] - m["cd"])
        .groupby(["cd", "off"])
        .size()
        .reset_index(name="users")
        .sort_values(["cd", "off"])
        .reset_index(drop=True)
    )
    assert out["users"].sum() == expect["users"].sum()
    got = {(r.cohort_day, r.day_offset): r.users for r in out.itertuples()}
    exp = {(r.cd, r.off): r.users for r in expect.itertuples()}
    assert got == exp


def test_ordered_group_concat(ray_session):
    from gazetteer_search_ray.pipelines.packing import ordered_group_concat

    rng = np.random.default_rng(3)
    n = 3_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 40, n).astype(np.int64),
            "h": rng.choice(["p", "q"], n),
            "doc_id": rng.permutation(n).astype(np.int64),
        }
    )
    out = ordered_group_concat(_ds(df), ["g", "h"], "doc_id")
    expect = (
        df.sort_values("doc_id")
        .groupby(["g", "h"], as_index=False)
        .agg(vals=("doc_id", lambda s: ",".join(s.astype(str))),
             n=("doc_id", "size"))
    )
    merged = out.merge(expect, on=["g", "h"], suffixes=("", "_e"))
    assert len(merged) == len(expect) == len(out)
    assert (merged["vals"] == merged["vals_e"]).all()
    assert (merged["n"] == merged["n_e"]).all()


def test_tfidf_top_terms(ray_session):
    import ray.data as rd

    from gazetteer_search_ray.pipelines.textstats import tfidf_top_terms

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "apple banana apple",
                "banana cherry",
                "apple cherry cherry date",
                "date date date",
                "egg",
                "apple banana cherry date egg",
            ],
        }
    )
    out = tfidf_top_terms(rd.from_pandas(docs).repartition(3), k=2)
    # brute force
    rows = []
    toks = {r.doc_id: r.text.split() for r in docs.itertuples()}
    df_count: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df_count[t] = df_count.get(t, 0) + 1
    for d, ts in toks.items():
        tf = pd.Series(ts).value_counts()
        sc = {t: c * np.log(len(toks) / df_count[t]) for t, c in tf.items()}
        top = sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        rows += [(d, t, s) for t, s in top]
    expect = pd.DataFrame(rows, columns=["doc_id", "term", "score"])
    got = out.sort_values(["doc_id", "term"]).reset_index(drop=True)
    expect = expect.sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == expect["doc_id"].tolist()
    assert got["term"].tolist() == expect["term"].tolist()
    np.testing.assert_allclose(got["score"], expect["score"], rtol=1e-12)
