"""Global-order primitives (pipelines/packing.py): distributed prefix
sums — row numbering, sequence packing, exact quantiles — checked
against brute-force references on shuffled multi-block inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gazetteer_search_ray.pipelines.packing import (
    exact_quantiles,
    global_row_number,
    pack_spans,
)


def _ds(df: pd.DataFrame, nparts: int = 7):
    import ray.data as rd

    return rd.from_pandas(df).repartition(nparts)


@pytest.fixture(scope="module")
def docs_df() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    n = 2_000
    return pd.DataFrame(
        {
            "doc_id": rng.permutation(n).astype(np.int64),
            "n_tokens": rng.integers(0, 300, n).astype(np.int64),
            "v": rng.integers(0, 50, n).astype(np.int64),
        }
    )


def test_global_row_number_dense(ray_session, docs_df):
    out = (
        global_row_number(_ds(docs_df), ["doc_id"])
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (out["row_id"].to_numpy() == np.arange(len(docs_df))).all()


def test_global_row_number_multi_key(ray_session, docs_df):
    # (v, doc_id) composite key: ties in v broken by doc_id
    out = (
        global_row_number(_ds(docs_df), ["v", "doc_id"])
        .to_pandas()
        .sort_values(["v", "doc_id"])
    )
    assert (out["row_id"].to_numpy() == np.arange(len(docs_df))).all()


def _brute_pack(df: pd.DataFrame, L: int) -> pd.DataFrame:
    d = df[df.n_tokens > 0].sort_values("doc_id").reset_index(drop=True)
    start = d.n_tokens.cumsum().shift(fill_value=0).to_numpy()
    end = start + d.n_tokens.to_numpy()
    rows = []
    for i in range(len(d)):
        for s in range(start[i] // L, (end[i] - 1) // L + 1):
            s0, s1 = max(s * L, start[i]), min((s + 1) * L, end[i])
            rows.append((d.doc_id[i], s, s0 - s * L, s0 - start[i], s1 - s0))
    return pd.DataFrame(
        rows,
        columns=["doc_id", "seq_id", "seq_offset", "doc_offset", "n_tokens"],
    )


@pytest.mark.parametrize("L", [1, 64, 100_000])
def test_pack_spans_matches_brute(ray_session, docs_df, L):
    got = (
        pack_spans(_ds(docs_df.drop(columns=["v"])), L)
        .to_pandas()
        .sort_values(["doc_id", "seq_id"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    exp = (
        _brute_pack(docs_df, L)
        .sort_values(["doc_id", "seq_id"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got, exp)
    # invariants: spans tile each doc and each window exactly
    per_doc = got.groupby("doc_id")["n_tokens"].sum()
    lens = docs_df.set_index("doc_id")["n_tokens"]
    assert (per_doc == lens[lens > 0].loc[per_doc.index]).all()
    full = got.groupby("seq_id")["n_tokens"].sum()
    assert (full.iloc[:-1] == L).all()  # every window but the tail is full


def test_pack_spans_long_doc_spans_many_windows(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2], "n_tokens": [10, 1000]})
    got = (
        pack_spans(_ds(df, 2), 64)
        .to_pandas()
        .sort_values(["doc_id", "seq_id"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    exp = _brute_pack(df, 64).astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)
    assert (got[got.doc_id == 2].n_tokens.sum()) == 1000


def test_pack_spans_drops_empty_docs(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2, 3], "n_tokens": [0, 5, 0]})
    got = pack_spans(_ds(df, 2), 8).to_pandas()
    assert set(got.doc_id) == {2}
    assert got.n_tokens.sum() == 5


def test_row_number_duplicate_keys_guarded(ray_session):
    # duplicate keys are only AMBIGUOUS when the sort splits a key run
    # across blocks (first-key collision): then _block_offsets raises.
    # If the sort keeps the run in one block the numbering is a valid
    # dense permutation — accept either, never silent corruption.
    df = pd.DataFrame({"doc_id": np.zeros(5_000, dtype=np.int64)})
    try:
        out = global_row_number(_ds(df, 8), ["doc_id"]).to_pandas()
    except ValueError as e:
        assert "unique" in str(e)
        return
    assert sorted(out["row_id"]) == list(range(5_000))


def test_exact_quantiles(ray_session, docs_df):
    qs = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    out = exact_quantiles(_ds(docs_df), "v", qs, id_col="doc_id")
    sv = np.sort(docs_df.v.to_numpy(), kind="stable")
    n = len(docs_df)
    for q, val in zip(out.q, out.value):
        assert val == sv[int(np.floor(q * (n - 1)))]


def _brute_scan(df: pd.DataFrame) -> pd.DataFrame:
    g = df.sort_values(["k", "ts", "i"], kind="mergesort").groupby("k")
    out = df.sort_values(["k", "ts", "i"], kind="mergesort").copy()
    out["seq"] = g.cumcount() + 1
    out["delta"] = out["ts"] - g["ts"].shift()
    out["cum"] = g["v"].cumsum()
    return out


@pytest.mark.parametrize("nparts", [1, 7, 40])
def test_keyed_scan_matches_brute(ray_session, nparts):
    from gazetteer_search_ray.pipelines.packing import keyed_scan

    rng = np.random.default_rng(23)
    n = 3_000
    df = pd.DataFrame({
        "k": rng.integers(0, 37, n).astype(np.int64),   # long runs cross blocks
        "ts": rng.integers(0, 10_000, n).astype(np.int64),
        "i": rng.permutation(n).astype(np.int64),
        "v": rng.integers(-5, 50, n).astype(np.int64),
    })
    got = (
        keyed_scan(_ds(df, nparts), "k", "ts", "i", "v")
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    want = _brute_scan(df).sort_values("i").reset_index(drop=True)
    assert (got["seq"].to_numpy() == want["seq"].to_numpy()).all()
    assert (got["cum"].to_numpy() == want["cum"].to_numpy()).all()
    gd, wd = got["delta"], want["delta"]
    assert (gd.isna().to_numpy() == wd.isna().to_numpy()).all()
    m = ~wd.isna().to_numpy()
    assert (gd.to_numpy()[m] == wd.to_numpy()[m]).all()


def test_keyed_scan_single_key_many_blocks(ray_session):
    """One key spanning every block: the carry chain must thread
    through all O(#blocks) summaries."""
    from gazetteer_search_ray.pipelines.packing import keyed_scan

    n = 500
    df = pd.DataFrame({
        "k": np.zeros(n, dtype=np.int64),
        "ts": np.arange(n, dtype=np.int64) * 3,
        "i": np.arange(n, dtype=np.int64),
        "v": np.ones(n, dtype=np.int64),
    })
    got = (
        keyed_scan(_ds(df, 20), "k", "ts", "i", "v")
        .to_pandas().sort_values("i").reset_index(drop=True)
    )
    assert (got["seq"].to_numpy() == np.arange(1, n + 1)).all()
    assert (got["cum"].to_numpy() == np.arange(1, n + 1)).all()
    assert got["delta"].isna().sum() == 1
    assert (got["delta"].to_numpy()[1:] == 3).all()


def test_quantiles_select_matches_sort(ray_session):
    """Bin-refinement selection (no shuffle) returns the same order
    statistics as a full sort, across: duplicate-heavy ints forced
    through multiple refinement rounds, float64-unsafe 63-bit ints,
    skewed floats with NaN and null mixed in, constant columns, and a
    single-row dataset."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from gazetteer_search_ray.pipelines.packing import quantiles_select

    rng = np.random.default_rng(3)
    qs = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]

    def expect(x):
        s = np.sort(x)
        return [s[int(np.floor(q * (len(s) - 1)))] for q in qs]

    x = rng.integers(-50, 50, 60_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": x})).repartition(16)
    out = quantiles_select(ds, "v", qs, bins=8, gather_limit=100)
    assert out["value"].tolist() == expect(x)

    x = rng.integers(2**62, 2**63 - 1, 20_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": x})).repartition(8)
    out = quantiles_select(ds, "v", qs, bins=16, gather_limit=500)
    assert out["value"].tolist() == expect(x)

    x = np.exp(rng.normal(0, 3, 30_000))
    arr = pa.concat_arrays([
        pa.array(np.concatenate([x, [np.nan] * 200])),
        pa.array([None] * 100, pa.float64())])
    ds = rd.from_arrow(pa.table({"v": arr})).repartition(8)
    out = quantiles_select(ds, "v", qs, bins=32, gather_limit=200)
    assert out["value"].tolist() == expect(x)

    for x in [np.full(5_000, 7, np.int64), np.array([3], np.int64)]:
        ds = rd.from_arrow(pa.table({"v": x}))
        out = quantiles_select(ds, "v", qs, bins=4, gather_limit=2)
        assert out["value"].tolist() == expect(x)

    ds = rd.from_arrow(pa.table({"v": pa.array([], pa.int64())}))
    assert quantiles_select(ds, "v", qs)["value"].isna().all()


def test_grouped_quantiles_matches_brute(ray_session):
    """Per-group order statistics vs brute-force pandas, with heavy
    value ties and a single-row group."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gazetteer_search_ray.pipelines.packing import grouped_quantiles

    rng = np.random.default_rng(4)
    langs = np.array(["en", "de", "fr", "es", "zh"])[rng.integers(0, 5, 4000)]
    vals = rng.integers(0, 300, 4000).astype(np.int64)
    ids = rng.permutation(4000).astype(np.int64)
    df = pd.DataFrame({"lang": langs, "n": vals, "doc_id": ids})
    df = pd.concat([df, pd.DataFrame(
        {"lang": ["xx"], "n": [42], "doc_id": [99999]})])
    ds = rd.from_pandas(df).repartition(9)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = grouped_quantiles(ds, "lang", "n", qs)
    got["value"] = got["value"].astype(np.int64)
    exp_rows = []
    for g, sub in df.groupby("lang"):
        s = sub.sort_values(["n", "doc_id"])["n"].to_numpy()
        for q in qs:
            exp_rows.append((g, float(q), int(s[int(np.floor(q * (len(s) - 1)))])))
    exp = (pd.DataFrame(exp_rows, columns=["lang", "q", "value"])
           .sort_values(["lang", "q"]).reset_index(drop=True))
    assert got.equals(exp)
