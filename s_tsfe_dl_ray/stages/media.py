"""Multimodal (image/audio/video) columns: opaque ``binary`` payloads with
typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries — see ``DecodeImage.__init__``); everything Ray-side
is real and tested: schema, batch sizing for wide binary rows, actor
signature, zero-copy Arrow handling, output layout.

Scale notes:
- binary payloads dominate block bytes → callers should use a small
  ``batch_size`` (default 64) and rely on object-store spilling; never
  collect these columns to the driver.
- metadata-only operations (``media_stats``) project the binary column
  away first and run at full batch size.

Reference analog: the segment reader treating waveform payloads as opaque
arrays with side metadata (data.py:10-14 wfdb Record + Annotation).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),  # -1 when unknown/not applicable
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def media_stats(batch: pa.Table) -> pa.Table:
    """Metadata + payload byte stats (vectorized; no decode)."""
    nbytes = pc.binary_length(batch["payload"])
    batch = batch.append_column("payload_bytes", pc.cast(nbytes, pa.int64()))
    return batch


class DecodeImage:
    """Actor-pool image decode + feature stage.

    ``__init__`` is where a real deployment loads the codec / model ONCE
    per actor (reference: load-once-score-many, SURVEY.md §2.3).  Here the
    decode is a deterministic fake: crc32-seeded pseudo-pixels of the
    declared (width, height) — which keeps the output schema, sizing and
    determinism real so the plumbing is testable.  Set ``strict=True`` to
    get the honest ``NotImplementedError`` instead.
    """

    def __init__(self, *, thumb: int = 8, strict: bool = False):
        self.thumb = thumb
        self.strict = strict
        if strict:
            raise NotImplementedError(
                "real image decode requires PIL/cv2, not available in this "
                "environment; run with strict=False for the deterministic fake"
            )

    def _fake_decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        seed = zlib.crc32(payload)
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(max(h, 1), max(w, 1)), dtype=np.uint8)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        means, stds, thumbs = [], [], []
        t = self.thumb
        for payload, w, h in zip(batch["payload"], batch["width"], batch["height"]):
            img = self._fake_decode(payload, int(w), int(h))
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            # nearest-neighbor resize to a t×t thumbnail (real resize math)
            yi = np.linspace(0, img.shape[0] - 1, t).round().astype(int)
            xi = np.linspace(0, img.shape[1] - 1, t).round().astype(int)
            thumbs.append(img[np.ix_(yi, xi)].reshape(-1).astype(np.float32))
        return pd.DataFrame({
            "media_id": batch["media_id"],
            "pixel_mean": means,
            "pixel_std": stds,
            "thumbnail": thumbs,  # list<float32> t*t
        })


class DecodeAudio:
    """Actor-pool audio decode + feature stage.

    Decode is a deterministic fake (crc32-seeded PCM at ``sr`` Hz for the
    declared duration — no audio libs in this container; ``strict=True``
    raises instead), but the FEATURE math is real DSP over the samples:
    RMS energy, zero-crossing rate, and spectral centroid via numpy FFT —
    the per-batch vectorized shape a real librosa/torchaudio stage would
    have (load-once in ``__init__``, score per batch)."""

    def __init__(self, *, sr: int = 8000, max_samples: int = 1 << 16,
                 strict: bool = False):
        self.sr = sr
        self.max_samples = max_samples
        if strict:
            raise NotImplementedError(
                "real audio decode requires soundfile/librosa, not available "
                "in this environment; run with strict=False for the "
                "deterministic fake"
            )

    def _fake_decode(self, payload: bytes, duration_ms: int) -> np.ndarray:
        n = min(max(int(duration_ms / 1000.0 * self.sr), self.sr // 10),
                self.max_samples)
        rng = np.random.default_rng(zlib.crc32(payload))
        # band-limited-ish fake: white noise + a payload-dependent tone
        t = np.arange(n) / self.sr
        f = 100.0 + (zlib.crc32(payload[:16]) % 2000)
        return (0.3 * np.sin(2 * np.pi * f * t)
                + 0.1 * rng.standard_normal(n)).astype(np.float32)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rms, zcr, centroid = [], [], []
        for payload, dur in zip(batch["payload"], batch["duration_ms"]):
            x = self._fake_decode(payload, max(int(dur), 100))
            rms.append(float(np.sqrt(np.mean(x * x))))
            zcr.append(float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))))
            spec = np.abs(np.fft.rfft(x))
            freqs = np.fft.rfftfreq(len(x), d=1.0 / self.sr)
            centroid.append(float((freqs * spec).sum() / max(spec.sum(), 1e-12)))
        return pd.DataFrame({
            "media_id": batch["media_id"],
            "rms": rms,
            "zero_crossing_rate": zcr,
            "spectral_centroid_hz": centroid,
        })


class SampleFrames:
    """Video frame-sampling stage (stub decode, real sampling math):
    picks ``n_frames`` evenly-spaced frame indices from duration × fps."""

    def __init__(self, *, n_frames: int = 4, fps: float = 25.0):
        self.n_frames = n_frames
        self.fps = fps

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_id, out_frame, out_ms = [], [], []
        for mid, dur in zip(batch["media_id"], batch["duration_ms"]):
            total = max(int(int(dur) / 1000.0 * self.fps), 1)
            idx = np.linspace(0, total - 1, min(self.n_frames, total)).round().astype(int)
            for fi in idx:
                out_id.append(mid)
                out_frame.append(int(fi))
                out_ms.append(int(fi / self.fps * 1000))
        return pd.DataFrame({
            "media_id": out_id, "frame_idx": out_frame, "frame_ms": out_ms,
        })


def decode_images(
    ds: Dataset, *, batch_size: int = 64, concurrency=(1, 4)
) -> Dataset:
    """image rows → (media_id, pixel_mean, pixel_std, thumbnail).

    Small batch_size on purpose: payload × batch × concurrency must fit a
    worker heap (wide-binary-row rule).
    """
    imgs = ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    return imgs.map_batches(
        DecodeImage, batch_format="pandas", batch_size=batch_size, concurrency=concurrency
    )


def decode_audio(
    ds: Dataset, *, batch_size: int = 64, concurrency=(1, 4)
) -> Dataset:
    """audio rows → (media_id, rms, zero_crossing_rate, spectral_centroid_hz)."""
    auds = ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "audio")), batch_format="pyarrow"
    )
    return auds.map_batches(
        DecodeAudio, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_video_frames(
    ds: Dataset, *, n_frames: int = 4, batch_size: int = 64, concurrency=(1, 4)
) -> Dataset:
    vids = ds.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "video")), batch_format="pyarrow"
    )
    return vids.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests (binary payloads)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, size=n)]
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(256, 4096, size=n)]
    return pa.table({
        "media_id": pa.array(np.arange(n), pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["application/octet-stream"] * n),
        "width": pa.array(rng.integers(16, 256, size=n).astype(np.int32)),
        "height": pa.array(rng.integers(16, 256, size=n).astype(np.int32)),
        "duration_ms": pa.array(
            np.where(kinds == "video", rng.integers(1000, 60000, size=n), -1).astype(np.int32)
        ),
    })
