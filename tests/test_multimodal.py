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
    with pytest.raises(NotImplementedError, match="mp3"):
        DecodeImage()._decode(b"\x49\x44\x33garbage", {"format": "mp3"})


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


def test_png_roundtrip_all_filters():
    """encode→decode identity for every PNG scanline filter (0-4)."""
    from gazetteer_search_ray.pipelines.multimodal import decode_png, encode_png

    img = _img(13, 7, seed=9)
    for ft in range(5):
        out = decode_png(encode_png(img, filter_type=ft))
        np.testing.assert_array_equal(out, img)


def test_png_rgba_alpha_dropped():
    """Truecolor+alpha (type 6) decodes with the alpha plane dropped."""
    import struct
    import zlib

    from gazetteer_search_ray.pipelines.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
    )

    rng = np.random.default_rng(4)
    h, w = 6, 5
    rgba = rng.integers(0, 256, size=(h, w, 4)).astype(np.uint8)
    rows = b"".join(b"\x00" + rgba[r].tobytes() for r in range(h))
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(rows))
        + _png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png(payload), rgba[:, :, :3])


def test_png_unsupported_raises():
    import struct
    import zlib

    from gazetteer_search_ray.pipelines.multimodal import (
        _png_chunk,
        _PNG_SIG,
        decode_png,
    )

    # 16-bit depth → NotImplementedError with the feature named
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(payload)


def test_png_stage_decode(ray_session):
    """PNG payloads through the DecodeImage actor stage produce the
    same features as decoding the equivalent PPM payloads."""
    import ray.data as rd

    from gazetteer_search_ray.pipelines.multimodal import decode_images

    t_png = make_media_table(n=6, seed=11, fmt="png")
    t_ppm = make_media_table(n=6, seed=11, fmt="ppm")
    f_png = (
        decode_images(rd.from_arrow(t_png)).to_pandas().sort_values("item_id")
    )
    f_ppm = (
        decode_images(rd.from_arrow(t_ppm)).to_pandas().sort_values("item_id")
    )
    for a, b in zip(f_png["feature"], f_ppm["feature"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# JPEG (baseline T.81, functions/jpeg.py)
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_color_444_and_420():
    from gazetteer_search_ray.functions.jpeg import decode_jpeg, encode_jpeg, psnr

    h, w = 45, 67  # not multiples of 8/16: exercises edge padding/crop
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(
        128 + 80 * np.sin(xx / 11.0) + 60 * np.cos(yy / 7.0), 0, 255
    ).astype(np.uint8)
    img = np.stack([img, img[::-1], 255 - img], axis=-1)
    for sub, floor in (("444", 35.0), ("420", 28.0)):
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert dec.shape == img.shape
        assert psnr(img, dec) > floor


def test_jpeg_roundtrip_gray():
    from gazetteer_search_ray.functions.jpeg import decode_jpeg, encode_jpeg, psnr

    yy, xx = np.mgrid[0:24, 0:40]
    g = np.clip(128 + 80 * np.sin(xx / 9.0 + yy / 5.0), 0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(g, quality=85))
    assert dec.shape == (24, 40, 3)
    assert psnr(np.stack([g, g, g], axis=-1), dec) > 35.0


def test_jpeg_restart_interval_bit_identical():
    from gazetteer_search_ray.functions.jpeg import decode_jpeg, encode_jpeg

    img = _img(33, 50)
    plain = decode_jpeg(encode_jpeg(img, quality=80))
    rst = decode_jpeg(encode_jpeg(img, quality=80, restart_interval=3))
    np.testing.assert_array_equal(plain, rst)


def test_jpeg_quality_monotone_size():
    from gazetteer_search_ray.functions.jpeg import encode_jpeg

    img = _img(32, 32)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)


def test_jpeg_progressive_rejected():
    from gazetteer_search_ray.functions.jpeg import decode_jpeg, encode_jpeg

    payload = bytearray(encode_jpeg(_img(16, 16)))
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="SOF2"):
        decode_jpeg(bytes(payload))


def test_jpeg_stage_decode(ray_session):
    """JPEG payloads flow through the DecodeImage actor stage; the
    lossy features stay close to the PPM (lossless) features."""
    import ray.data as rd

    t_jpg = make_media_table(n=6, seed=11, fmt="jpeg")
    f_jpg = (
        decode_images(rd.from_arrow(t_jpg)).to_pandas().sort_values("item_id")
    )
    assert len(f_jpg) == 6
    for _, row in f_jpg.iterrows():
        assert row["feature"][0] == row["meta"]["height"]
        assert row["feature"][1] == row["meta"]["width"]
