"""Deterministic hashing utilities.

* stable 63-bit ids for documents keyed by (repo, path, commit) — the
  reference's string ``id`` (``ImportObjectParser.java:66-199``) becomes a
  dense-enough int64 usable as a posting doc_id without a global sort;
* sha256 of content — the per-row end-to-end invariant mandated by
  BASELINE.json ``input_hint``;
* stable 64-bit token hashes for minhash/simhash (no PYTHONHASHSEED
  dependence).
"""

from __future__ import annotations

import hashlib

import numpy as np


def doc_id_from_key(repo: str, path: str, commit: str) -> int:
    """Deterministic 63-bit doc id from the natural key.

    Collision probability at 10^12 docs over a 63-bit space is
    birthday-bounded at ~5%; the build asserts uniqueness per corpus and
    the key is recorded in the doc store so a collision is detectable
    (and fixable by salting the key).
    """
    h = hashlib.sha1(f"{repo}\x00{path}\x00{commit}".encode()).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def sha256_hex(text: str | bytes) -> str:
    if isinstance(text, str):
        text = text.encode("utf-8", errors="surrogatepass")
    return hashlib.sha256(text).hexdigest()


def stable_token_hash64(tokens: list[str]) -> np.ndarray:
    """Stable unsigned 64-bit hash per token (blake2b-based)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        out[i] = int.from_bytes(
            hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
        )
    return out
