"""Hybrid-search rank fusion: reciprocal-rank fusion (RRF) of
independently-produced top-N rankings.

The reference composes lexical signals only (its coalesce cascade,
``ru/GeoSearch.groovy`` — see ``pipelines/search.py``); modern hybrid
retrieval instead fuses a lexical (BM25) leg with a vector (ANN) leg.
Both legs already exist as distributed operators in this engine
(``pipelines/query.py`` top_k, ``pipelines/similarity.py`` ann_*);
fusion operates on their bounded top-N OUTPUTS — O(legs × N) rows, by
construction driver-sized, never corpus-sized — so it is a vectorized
driver-side combine, the same declared bound as result paging.

``score(id) = Σ_legs 1 / (k + rank_leg(id))`` with ids absent from a
leg contributing nothing (the standard RRF of Cormack et al., public
formulation).  Ranks are 1-based positions in each leg after the
leg's own (score DESC, id ASC) ordering; to make fused output immune
to float-noise rank flips between independent implementations, legs
should rank on scores rounded to a declared precision (the driver
query ranks both legs on 6-decimal-rounded scores — the same
precision every oracle row is already compared at).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

RRF_K = 60


def rank_leg(df: pd.DataFrame, id_col: str, score_col: str,
             top_n: int, decimals: int = 6) -> pd.DataFrame:
    """Rank one leg: (round(score) DESC, id ASC) → 1-based ``rank``,
    cut to ``top_n``."""
    t = df[[id_col, score_col]].copy()
    t[score_col] = np.round(t[score_col].astype(np.float64), decimals)
    t = t.sort_values([score_col, id_col],
                      ascending=[False, True], kind="mergesort")
    t = t.head(top_n).reset_index(drop=True)
    t["rank"] = np.arange(1, len(t) + 1, dtype=np.int64)
    return t[[id_col, "rank"]]


def rrf_fuse(legs: list[pd.DataFrame], id_col: str = "doc_id",
             k: int = RRF_K, top_n: int = 20) -> pd.DataFrame:
    """Fuse pre-ranked legs (each ``(id, rank)`` from :func:`rank_leg`)
    → top ``top_n`` ``(id, rrf)`` by (rrf DESC, id ASC)."""
    frames = []
    for i, leg in enumerate(legs):
        f = leg[[id_col, "rank"]].copy()
        f["rrf"] = 1.0 / (k + f["rank"].to_numpy(np.float64))
        frames.append(f[[id_col, "rrf"]])
    allc = pd.concat(frames, ignore_index=True)
    fused = allc.groupby(id_col, as_index=False)["rrf"].sum()
    fused = fused.sort_values(["rrf", id_col],
                              ascending=[False, True], kind="mergesort")
    out = fused.head(top_n).reset_index(drop=True)
    out[id_col] = out[id_col].astype(np.int64)
    return out
