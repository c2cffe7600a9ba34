"""Real multimodal kernels: pure-numpy PPM/BMP codecs, stdlib WAV,
nearest resize, feature extraction — and the actor-pool stages over
them (decode, resize, audio, frame sampling)."""

import numpy as np
import pytest

from gazetteer_search_ray.pipelines.multimodal import (
    DecodeImage,
    audio_features,
    decode_audio,
    decode_bmp,
    decode_images,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    image_features,
    make_audio_table,
    make_media_table,
    make_video_table,
    resize_images,
    resize_nearest,
    sample_frames,
    split_ppm_frames,
)


def _img(h, w, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_ppm_roundtrip():
    img = _img(7, 5)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


def test_bmp_roundtrip_with_row_padding():
    # width 5 → 15-byte rows, padded to 16: exercises stride handling
    img = _img(3, 5)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)
    img2 = _img(4, 4)  # no padding
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img2)), img2)


def test_wav_roundtrip():
    x = (np.sin(np.linspace(0, 40, 800)) * 20000).astype(np.int16)
    y, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000
    np.testing.assert_allclose(y, x / 32768.0, atol=1e-4)


def test_resize_nearest_shapes():
    img = _img(10, 6)
    out = resize_nearest(img, 4, 8)
    assert out.shape == (4, 8, 3)
    # identity resize is exact
    np.testing.assert_array_equal(resize_nearest(img, 10, 6), img)


def test_real_decode_features_deterministic():
    img = _img(9, 9)
    f1 = DecodeImage()._decode(encode_ppm(img), {"format": "ppm"})
    f2 = DecodeImage()._decode(encode_bmp(img), {"format": "bmp"})
    # same pixels → same features regardless of container format
    np.testing.assert_allclose(f1, f2)
    np.testing.assert_allclose(f1[:2], [9.0, 9.0])  # h, w lead


def test_undecodable_format_raises():
    with pytest.raises(NotImplementedError, match="jpeg"):
        DecodeImage()._decode(b"\xff\xd8\xffgarbage", {"format": "jpeg"})


def test_split_ppm_frames():
    frames = [encode_ppm(_img(4, 4, s)) for s in range(5)]
    clip = b"".join(frames)
    assert split_ppm_frames(clip) == frames


def test_image_stage_real_decode(ray_session):
    import ray.data as rd

    for fmt in ("ppm", "bmp"):
        t = make_media_table(8, fmt=fmt)
        feats = decode_images(rd.from_arrow(t), fake=False).to_pandas()
        assert len(feats) == 8
        # h, w in the feature vector match the metadata
        for _, row in feats.iterrows():
            assert row["feature"][0] == row["meta"]["height"]
            assert row["feature"][1] == row["meta"]["width"]


def test_resize_stage(ray_session):
    import ray.data as rd

    t = make_media_table(6, fmt="ppm")
    out = resize_images(rd.from_arrow(t), out_h=8, out_w=8).to_pandas()
    for p in out["payload"]:
        assert decode_ppm(p).shape == (8, 8, 3)


def test_audio_stage(ray_session):
    import ray.data as rd

    t = make_audio_table(6)
    feats = decode_audio(rd.from_arrow(t)).to_pandas()
    assert len(feats) == 6
    for f in feats["feature"]:
        assert len(f) == 7  # dur, rms, zcr, 4 bands
        assert 0 < f[1] < 1  # rms of a sine is sensible
        assert abs(sum(f[3:]) - 1.0) < 1e-9  # band energies normalized


def test_video_frame_sampling(ray_session):
    import ray.data as rd

    t = make_video_table(3, frames=12)
    out = sample_frames(rd.from_arrow(t), stride=4).to_pandas()
    # 12 frames / stride 4 = 3 per item
    assert len(out) == 9
    for fr in out["frame"]:
        decode_ppm(fr)  # every sampled frame is a valid image
