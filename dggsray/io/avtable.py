"""Synthetic audio (WAV) and video (AVI/MJPEG) tables — the multimodal input
tables for the audio/video actor-pool stages, mirroring io/imagetable's
pattern: deterministic per-index synthesis as a Ray pipeline, cached parquet
under /tmp, row counts scaled by sf.  Real containers + real codecs (stdlib
wave; core.aviio + core.jpegio), so the stages downstream exercise true
decode paths, not fakes."""
from __future__ import annotations

import io
import os
import wave

import numpy as np
import pyarrow as pa


def n_clips_for_sf(sf: float) -> int:
    return max(40, int(2000 * sf))


def n_videos_for_sf(sf: float) -> int:
    return max(20, int(400 * sf))


def synth_pcm(idx: int, rate: int = 8000, seconds: float = 0.25) -> np.ndarray:
    """The raw int16 samples of clip `idx` — the container-free reference
    for the per-row decode invariant (audio_features.check_ok regenerates
    these and compares features computed from the WAV-decoded stream)."""
    n = int(rate * seconds)
    t = np.arange(n, dtype=np.float64) / rate
    f1 = 110.0 + (idx % 37) * 23.0
    f2 = 700.0 + (idx % 11) * 91.0
    a = 0.3 + 0.5 * ((idx % 7) / 7.0)
    x = a * np.sin(2 * np.pi * f1 * t) + (1 - a) * 0.4 * np.sin(2 * np.pi * f2 * t)
    return np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")


def synth_wav(idx: int, rate: int = 8000, seconds: float = 0.25) -> bytes:
    """Deterministic test tone: two sinusoids whose frequencies/amplitudes
    derive from the row index, written as 16-bit PCM WAV."""
    pcm = synth_pcm(idx, rate, seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def synth_frames(idx: int, w: int = 32, h: int = 24,
                 n_frames: int = 6) -> np.ndarray:
    """The raw (n_frames, h, w, 3) uint8 frames of clip `idx` — the
    container/codec-free reference for the per-row decode invariants
    (video_frames brightness check, video_scene_cuts cut position).  The
    20*((idx+f)%5) luminance cycle wraps exactly once within 6 frames, at
    transition f -> f+1 with (idx+f) % 5 == 4."""
    xx = np.linspace(0, 255, w)[None, :, None]
    yy = np.linspace(0, 255, h)[:, None, None]
    frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for f in range(n_frames):
        base = 0.5 * xx + 0.3 * yy + 20.0 * ((idx + f) % 5)
        img = np.repeat(base, 3, axis=2)
        c = (idx * 3 + f * 5) % w
        img[:, c:c + 3, 0] = 250.0
        frames[f] = np.clip(img, 0, 255).astype(np.uint8)
    return frames


def expected_cut_frame(idx: int) -> int:
    """Transition index of clip `idx`'s single luminance wrap (see
    synth_frames)."""
    return (4 - idx) % 5


def synth_avi(idx: int, w: int = 32, h: int = 24, n_frames: int = 6) -> bytes:
    """Deterministic mini video: smooth gradient frames with a moving bar,
    JPEG-encoded per frame into an AVI/MJPEG container."""
    from ..core.aviio import encode_avi_mjpeg
    return encode_avi_mjpeg(synth_frames(idx, w, h, n_frames), fps=5,
                            quality=95)


def _table_path(kind: str, sf: float, root: str) -> str:
    return os.path.join(root, f"{kind}_sf{sf}")


def ensure_audio_table(sf: float, root: str = "/tmp/dggsray_cache") -> str:
    import ray.data as rd
    path = _table_path("audio", sf, root)
    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    n = n_clips_for_sf(sf)

    def synth(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy()
        return pa.table({
            "audio_id": pa.array([f"a{int(i):06d}" for i in ids], pa.string()),
            "fmt": pa.array(["wav"] * len(ids), pa.string()),
            "bytes": pa.array([synth_wav(int(i)) for i in ids], pa.binary())})

    os.makedirs(path, exist_ok=True)
    rd.range(n, override_num_blocks=max(8, n // 512 + 1)) \
        .map_batches(synth, batch_format="pyarrow", batch_size=512) \
        .write_parquet(path)
    with open(done, "w") as f:
        f.write("ok")
    return path


def ensure_video_table(sf: float, root: str = "/tmp/dggsray_cache") -> str:
    import ray.data as rd
    path = _table_path("video", sf, root)
    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    n = n_videos_for_sf(sf)

    def synth(b: pa.Table) -> pa.Table:
        ids = b.column("id").to_numpy()
        return pa.table({
            "video_id": pa.array([f"v{int(i):06d}" for i in ids], pa.string()),
            "w": pa.array([32] * len(ids), pa.int32()),
            "h": pa.array([24] * len(ids), pa.int32()),
            "fmt": pa.array(["mjpeg"] * len(ids), pa.string()),
            "bytes": pa.array([synth_avi(int(i)) for i in ids], pa.binary())})

    os.makedirs(path, exist_ok=True)
    rd.range(n, override_num_blocks=max(4, n // 128 + 1)) \
        .map_batches(synth, batch_format="pyarrow", batch_size=128) \
        .write_parquet(path)
    with open(done, "w") as f:
        f.write("ok")
    return path
