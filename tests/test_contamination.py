"""Decontamination: broadcast membership pass vs a brute-force
shingle-set reference, plus the drop consumer and edge rows (short
docs, empty docs, clean corpus)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gazetteer_search_ray.pipelines.contamination import (
    contamination_report,
    decontaminate,
    eval_shingle_hashes,
)
from gazetteer_search_ray.pipelines.dedup import _shingles


def _brute_report(train: pd.DataFrame, ev: pd.DataFrame, n=3):
    ev_sh = set()
    for t in ev["text"]:
        ev_sh.update(_shingles(t, n))
    rows = []
    for _, r in train.iterrows():
        k = len(set(_shingles(r["text"], n)) & ev_sh)
        if k:
            rows.append({"doc_id": r["doc_id"], "n_overlap": k})
    return pd.DataFrame(rows, columns=["doc_id", "n_overlap"])


def _ds(df):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 25)))
        for _ in range(120)
    ]
    texts[5] = ""  # empty doc
    texts[7] = "solo"  # < n tokens
    df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                       "text": texts})
    ev = df[df.doc_id % 10 == 0].reset_index(drop=True)
    tr = df[df.doc_id % 10 != 0].reset_index(drop=True)
    return tr, ev


def test_report_matches_bruteforce(ray_session, corpus):
    tr, ev = corpus
    hashes = eval_shingle_hashes(_ds(ev), n=3)
    got = (
        contamination_report(_ds(tr), hashes, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute_report(tr, ev).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": np.int64, "n_overlap": np.int64}),
        want.astype({"doc_id": np.int64, "n_overlap": np.int64}),
    )
    assert len(got) > 0  # the planted overlap actually fires


def test_decontaminate_drops_exactly_the_flagged(ray_session, corpus):
    tr, ev = corpus
    kept = decontaminate(_ds(tr), _ds(ev), n=3).to_pandas()
    bad = set(_brute_report(tr, ev)["doc_id"])
    assert set(kept["doc_id"]) == set(tr["doc_id"]) - bad


def test_decontaminate_custom_id_col(ray_session, corpus):
    """Non-default id_col must flow through both report paths and the
    anti-join drop (the bad-ids side used to hardcode "doc_id")."""
    tr, ev = corpus
    tr2 = tr.rename(columns={"doc_id": "xid"})
    ev2 = ev.rename(columns={"doc_id": "xid"})
    bad = set(_brute_report(tr, ev)["doc_id"])
    want = set(tr["doc_id"]) - bad
    for strategy in ("broadcast", "join"):
        kept = decontaminate(_ds(tr2), _ds(ev2), n=3, id_col="xid",
                             strategy=strategy).to_pandas()
        assert set(kept["xid"]) == want, strategy


def test_decontaminate_bloom_matches_other_strategies(ray_session, corpus):
    """Bloom strategy is exact at ANY false-positive rate: the bitmap
    only prunes candidates, the semi-join verifies them.  Checked at
    the 8 MB default AND at a deliberately tiny 1 KB bitmap (high fp
    rate — every doc may become a candidate, result still exact)."""
    tr, ev = corpus
    bad = set(_brute_report(tr, ev)["doc_id"])
    want = set(tr["doc_id"]) - bad
    kept = decontaminate(_ds(tr), _ds(ev), n=3,
                         strategy="bloom").to_pandas()
    assert set(kept["doc_id"]) == want
    kept_tiny = decontaminate(_ds(tr), _ds(ev), n=3, strategy="bloom",
                              bloom_bits=1 << 13).to_pandas()
    assert set(kept_tiny["doc_id"]) == want


def test_bloom_filter_no_false_negatives(ray_session, corpus):
    """Every eval shingle hash must probe positive in the built
    bitmap (the property that makes the candidate pre-filter safe)."""
    from gazetteer_search_ray.pipelines.contamination import (
        _bloom_positions,
        build_eval_bloom,
    )

    tr, ev = corpus
    bm = build_eval_bloom(_ds(ev), n=3, m_bits=1 << 20, k=4)
    hashes = eval_shingle_hashes(_ds(ev), n=3)
    assert hashes.size > 0
    pos = _bloom_positions(hashes, 1 << 20, 4)
    bit = (np.uint8(1) << (pos & np.uint64(7))).astype(np.uint8)
    hit = (bm[(pos >> np.uint64(3)).astype(np.int64)] & bit) != 0
    assert hit.all()


def test_clean_corpus_passes_through(ray_session):
    tr = pd.DataFrame({"doc_id": [1, 2], "text": ["aa bb cc dd", "ee ff gg"]})
    ev = pd.DataFrame({"doc_id": [9], "text": ["xx yy zz ww"]})
    hashes = eval_shingle_hashes(_ds(ev), n=3)
    rep = contamination_report(_ds(tr), hashes, n=3).to_pandas()
    assert len(rep) == 0
    kept = decontaminate(_ds(tr), _ds(ev), n=3).to_pandas()
    assert set(kept["doc_id"]) == {1, 2}


def test_empty_eval_set(ray_session):
    tr = pd.DataFrame({"doc_id": [1], "text": ["aa bb cc"]})
    ev = pd.DataFrame({"doc_id": [], "text": []}).astype(
        {"doc_id": np.int64, "text": str})
    hashes = eval_shingle_hashes(_ds(ev), n=3)
    assert hashes.size == 0
    rep = contamination_report(_ds(tr), hashes, n=3).to_pandas()
    assert len(rep) == 0


def test_curate_chain_quality_dedup_decontam(ray_session):
    """The composed curation chain: quality gate -> train split ->
    exact dedup -> eval decontamination, each gate observable."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from gazetteer_search_ray.pipelines.contamination import decontaminate
    from gazetteer_search_ray.pipelines.dedup import drop_exact_duplicates
    from gazetteer_search_ray.pipelines.textstats import (
        _quality_kernel,
        quality_filter,
    )
    import pyarrow as pa

    good = "alpha beta gamma delta " * 30          # long, clean -> passes
    bad = "!!!???;;;"                               # punct-heavy -> fails
    evaltext = "zeta eta theta iota kappa " * 20   # eval content
    contaminated = "prefix zeta eta theta suffix " * 10
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 23 * 1],  # 23 -> eval split member
        "text": [good, good, bad, contaminated, evaltext],
        "lang": ["en"] * 5,
    })
    # sanity: the quality kernel agrees with intent
    _, _, _, sc = _quality_kernel(pa.array([good, bad]))
    assert sc[0] >= 0.9 > sc[1]

    ds = rd.from_pandas(docs).repartition(2)
    ev = ds.filter(lambda r: r["doc_id"] % 23 == 0)
    train = quality_filter(ds, 0.9).filter(lambda r: r["doc_id"] % 23 != 0)
    kept = drop_exact_duplicates(train)
    out = decontaminate(kept, ev, n=3).to_pandas()
    # doc 3 fails quality, doc 2 is a dup of 1, doc 4 is contaminated,
    # doc 23 is the eval split -> only doc 1 survives
    assert sorted(out["doc_id"].astype(np.int64)) == [1]
