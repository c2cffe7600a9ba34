"""HyperLogLog distinct-count sketch (vectorized numpy registers).

The sketch for cardinality at 100-TB scale: each batch reduces to a
2^p-byte register array, registers merge with an elementwise max — a
perfect partial-aggregate (combiner) shape for ``map_batches`` +
driver/groupby merge, shuffling KBs instead of the value stream.

Standard HLL (Flajolet et al. 2007) with the small-range linear-counting
correction; p=12 → 4096 registers, ~1.6% standard error.
"""

from __future__ import annotations

import hashlib

import numpy as np


def hash64(values: list[str]) -> np.ndarray:
    """Stable 64-bit hashes for string values: md5 digest bytes [8:16]
    little-endian = DuckDB ``md5_number_lower`` — the HLL registers are
    therefore reproducible in the SQL oracle."""
    return np.array(
        [
            int.from_bytes(
                hashlib.md5(v.encode("utf-8", "surrogatepass")).digest()[8:16],
                "little",
            )
            for v in values
        ],
        dtype=np.uint64,
    )


class HyperLogLog:
    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers.astype(np.uint8)
            if registers is not None
            else np.zeros(self.m, dtype=np.uint8)
        )

    def add_hashed(self, hs: np.ndarray) -> "HyperLogLog":
        """Fold a batch of 64-bit hashes into the registers, vectorized:
        register index = top p bits, rank = 1 + leading zeros of the
        remaining 64-p bits (computed via bit_length)."""
        if hs.size == 0:
            return self
        hs = hs.astype(np.uint64)
        idx = (hs >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (hs << np.uint64(self.p)) >> np.uint64(self.p)  # low 64-p bits
        # rank = (64-p) - bit_length(rest) + 1; bit_length via log2-free
        # float trick is unsafe at 64 bits — use a 16-bit-chunk table
        bl = np.zeros(hs.size, dtype=np.int64)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            big = x >= (np.uint64(1) << np.uint64(shift))
            bl[big] += shift
            x[big] >>= np.uint64(shift)
        bl += (x > 0).astype(np.int64)  # account for the top bit
        rank = (64 - self.p) - bl + 1
        np.maximum.at(self.registers, idx, rank.astype(np.uint8))
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)  # linear counting
        return float(e)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — the mergeable frequent-items summary
# (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
# Summaries", PODS 2012).  Each batch reduces to ≤ capacity (item,
# count) rows; summaries merge by summing counts and re-truncating.
# Guarantee: for true frequency f and stream length N, the summary
# count c satisfies f - N/(capacity+1) <= c <= f — with capacity >=
# total distinct items every count is exact (the oracle configuration).
# ---------------------------------------------------------------------------


def mg_truncate(items: np.ndarray, counts: np.ndarray,
                capacity: int) -> tuple[np.ndarray, np.ndarray]:
    """Reduce exact/merged (item, count) rows to a Misra-Gries summary
    of ≤ ``capacity`` rows: subtract the (capacity+1)-th largest count
    from all, keep positives — the batch-vectorized equivalent of the
    one-at-a-time decrement rule."""
    if items.size <= capacity:
        return items, counts
    kth = np.partition(counts, counts.size - capacity - 1)[
        counts.size - capacity - 1]
    keep = counts > kth
    return items[keep], counts[keep] - kth


def mg_merge(parts: list[tuple[np.ndarray, np.ndarray]],
             capacity: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge summaries: concatenate, sum per item, re-truncate."""
    if not parts:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    items = np.concatenate([p[0] for p in parts])
    counts = np.concatenate([p[1] for p in parts])
    uniq, inv = np.unique(items, return_inverse=True)
    summed = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(summed, inv, counts)
    return mg_truncate(uniq, summed, capacity)
