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
    assert (out.payload_bytes >= 256).all() and (out.payload_bytes < 4096).all()


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


def test_strict_decode_raises():
    from s_tsfe_dl_ray.stages.media import DecodeImage

    with pytest.raises(NotImplementedError):
        DecodeImage(strict=True)


def test_audio_decode_features_deterministic():
    import ray.data as rd

    from s_tsfe_dl_ray.stages.media import decode_audio, synth_media_table

    media = rd.from_arrow(synth_media_table(96, seed=42))
    a = decode_audio(media).to_pandas().sort_values("media_id").reset_index(drop=True)
    b = decode_audio(rd.from_arrow(synth_media_table(96, seed=42))).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert len(a) > 0
    assert (a["media_id"] == b["media_id"]).all()
    assert (a["rms"] == b["rms"]).all()  # deterministic fake decode
    assert (a["rms"] > 0).all()
    assert a["zero_crossing_rate"].between(0, 2).all()
    assert (a["spectral_centroid_hz"] > 0).all()


def test_audio_strict_mode_is_honest():
    import pytest

    from s_tsfe_dl_ray.stages.media import DecodeAudio

    with pytest.raises(NotImplementedError):
        DecodeAudio(strict=True)


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
