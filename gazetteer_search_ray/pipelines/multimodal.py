"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video travel as opaque ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.  The decode kernels themselves are STUBBED (the
image/audio libraries are not in this container): ``DecodeImage`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded by the payload hash) exercises the
real Ray plumbing — schema, batch sizing, actor signature, output
layout — end to end.

Batch-size note: binary payloads dominate block size; callers should
pass a small ``batch_size`` (e.g. 32–128) and, for very large payloads,
raise ``DataContext.target_max_block_size`` so blocks are not split
absurdly small (ray_guide 'Memory pressure').
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_META_TYPE = pa.struct(
    [("width", pa.int32()), ("height", pa.int32()), ("format", pa.string())]
)


def make_fake_image_table(n: int = 16, seed: int = 42) -> pa.Table:
    """Deterministic fake 'image' corpus for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 256))).astype(np.uint8).tobytes() for _ in range(n)]
    meta = [
        {"width": int(rng.integers(4, 64)), "height": int(rng.integers(4, 64)), "format": "fake"}
        for _ in range(n)
    ]
    return pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(meta, IMAGE_META_TYPE),
        }
    )


class DecodeImage:
    """Actor-pool decode stage: binary payload → float feature vector.

    Real decoders (PIL/cv2) plug in by overriding ``_decode``; without
    them, ``fake=True`` produces a deterministic feature vector seeded
    by sha256(payload) so downstream stages (resize, embed, dedup) are
    testable.
    """

    def __init__(self, fake: bool = False, feature_dim: int = 16):
        self.fake = fake
        self.feature_dim = feature_dim

    def _decode(self, payload: bytes, meta: dict) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/cv2 (not in this container); "
                "pass fake=True for the deterministic stub"
            )
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feature_dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p, m)
            for p, m in zip(batch["payload"].to_pylist(), batch["meta"].to_pylist())
        ]
        return pa.table(
            {
                "item_id": batch["item_id"],
                "meta": batch["meta"],
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )


def decode_images(ds, fake: bool = False, feature_dim: int = 16,
                  batch_size: int = 64, concurrency: int = 2):
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs=dict(fake=fake, feature_dim=feature_dim),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video analog: sample every ``stride``-th chunk of the payload
    (stub for frame extraction; deterministic)."""

    def __init__(self, stride: int = 4, chunk: int = 16):
        self.stride = stride
        self.chunk = chunk

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for i, p in zip(batch["item_id"].to_pylist(), batch["payload"].to_pylist()):
            chunks = [p[o : o + self.chunk] for o in range(0, len(p), self.chunk)]
            for j, c in enumerate(chunks[:: self.stride]):
                ids.append(i)
                idxs.append(j)
                frames.append(c)
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def sample_frames(ds, stride: int = 4, chunk: int = 16, batch_size: int = 64):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(stride=stride, chunk=chunk),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=2,
    )
