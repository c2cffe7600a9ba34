"""Passage chunking (chunking.chunk_text / chunk_tokens).

Differential oracle: the DuckDB generate_series + substr / list-slice
SQL the driver contract uses (CHUNK_SQL) must match the Ray kernels
row-for-row on arbitrary text, including empty docs, docs shorter than
one window, multi-space runs and non-ASCII codepoints.
"""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from gazetteer_search_ray.pipelines.chunking import chunk_text, chunk_tokens


def _ray_text(texts, size, stride):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = chunk_text(ds, size=size, stride=stride).to_pandas()
    if out.shape[1] == 0:  # Ray quirk: 0-row to_pandas drops columns
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                            "chunk_id": pd.Series([], dtype="int64"),
                            "chunk": pd.Series([], dtype="object")})
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


def _sql_text(texts, size, stride):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))
    return con.execute(f"""
SELECT d.doc_id, g.k::BIGINT AS chunk_id,
       substr(d.text, g.k*{stride}+1, {size}) AS chunk
FROM documents d,
     LATERAL (SELECT unnest(range(0,
              ((length(d.text)-1)//{stride})+1)) AS k) g
WHERE length(d.text) > 0
ORDER BY doc_id, chunk_id""").fetchdf()


def _ray_tokens(texts, size, stride):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = chunk_tokens(ds, size=size, stride=stride).to_pandas()
    if out.shape[1] == 0:  # Ray quirk: 0-row to_pandas drops columns
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                            "chunk_id": pd.Series([], dtype="int64"),
                            "n_tokens": pd.Series([], dtype="int64"),
                            "chunk": pd.Series([], dtype="object")})
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


def _sql_tokens(texts, size, stride):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))
    return con.execute(f"""
WITH arr AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents)
SELECT doc_id, g.k::BIGINT AS chunk_id,
       least(len(a) - g.k*{stride}, {size})::BIGINT AS n_tokens,
       array_to_string(a[g.k*{stride}+1 : g.k*{stride}+{size}], ' ')
         AS chunk
FROM arr,
     LATERAL (SELECT unnest(range(0, ((len(a)-1)//{stride})+1)) AS k) g
ORDER BY doc_id, chunk_id""").fetchdf()


TEXTS = [
    "abcdefghij",
    "",
    "xy",
    "exactly_eight___" * 4,          # 64 chars: multiple of stride cases
    "word " * 30 + "tail",
    "a  b   c",                      # multi-space runs → empty tokens
    "único café über søren",         # non-ASCII codepoints
]


def test_chunk_text_matches_sql(ray_session):
    for size, stride in [(4, 3), (5, 5), (8, 2), (200, 150)]:
        got = _ray_text(TEXTS, size, stride)
        want = _sql_text(TEXTS, size, stride)
        pd.testing.assert_frame_equal(
            got, want.reset_index(drop=True), check_dtype=False)


def test_chunk_text_window_arithmetic(ray_session):
    out = _ray_text(["abcdefghij"], 4, 3)
    assert out["chunk"].tolist() == ["abcd", "defg", "ghij", "j"]
    # empty doc yields no chunks; a short doc yields exactly one
    out = _ray_text(["", "x"], 4, 3)
    assert out["doc_id"].tolist() == [1]
    assert out["chunk"].tolist() == ["x"]


def test_chunk_tokens_matches_sql(ray_session):
    for size, stride in [(3, 2), (4, 4), (50, 40)]:
        got = _ray_tokens(TEXTS, size, stride)
        want = _sql_tokens(TEXTS, size, stride)
        pd.testing.assert_frame_equal(
            got, want.reset_index(drop=True), check_dtype=False)


def test_chunk_tokens_overlap(ray_session):
    out = _ray_tokens(["a b c d e"], 3, 2)
    assert out["chunk"].tolist() == ["a b c", "c d e", "e"]
    assert out["n_tokens"].tolist() == [3, 3, 1]


def test_chunk_rejects_bad_params(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        chunk_text(ds, size=0)
    with pytest.raises(ValueError):
        chunk_tokens(ds, size=4, stride=-1)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(
    alphabet=st.characters(codec="utf-8",
                           blacklist_categories=("Cs",)),
    max_size=40), min_size=1, max_size=6),
    st.integers(1, 7), st.integers(1, 7))
def test_chunk_text_property(ray_session, texts, size, stride):
    got = _ray_text(texts, size, stride)
    want = _sql_text(texts, size, stride).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
