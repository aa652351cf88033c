"""Minimal AVI (RIFF) container with MJPEG video frames — pure stdlib/struct.

Motion-JPEG-in-AVI is the simplest real video format that needs no external
codec: every frame is an independent baseline JPEG, which core.jpegio already
encodes/decodes from scratch.  This gives the multimodal video stage
(ops.multimodal.VideoFrameSample) a REAL container + codec path instead of a
deterministic fake: parse the RIFF chunk tree, pull the '00dc' frame chunks,
hand each sampled frame to decode_jpeg.

Layout written (and accepted) here — the classic AVI 1.0 structure
(public format documentation: RIFF/AVI, MainAVIHeader 'avih', stream header
'strh'/'strf' with BITMAPINFOHEADER, LIST 'movi' with word-aligned '00dc'
chunks, optional 'idx1'):

  RIFF('AVI ')
    LIST('hdrl')  avih  LIST('strl')  strh('vids','MJPG')  strf(BIH)
    LIST('movi')  00dc*...
    idx1
"""
from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def write_avi_mjpeg(frames_jpeg: list[bytes], width: int, height: int,
                    fps: int = 25) -> bytes:
    """JPEG frame bytestrings -> AVI/MJPEG file bytes."""
    n = len(frames_jpeg)
    max_sz = max((len(f) for f in frames_jpeg), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),   # dwMicroSecPerFrame
        max_sz * fps,               # dwMaxBytesPerSec
        0,                          # dwPaddingGranularity
        0x10,                       # dwFlags: AVIF_HASINDEX
        n, 0, 1, max_sz,            # totalFrames, initialFrames, streams, bufSz
        width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                          max_sz, 0xFFFFFFFF, 0)
            + struct.pack("<hhhh", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
                       width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_frames = b"".join(_chunk(b"00dc", f) for f in frames_jpeg)
    movi = _list(b"movi", movi_frames)
    # idx1: offsets are relative to the 'movi' list-type fourcc
    idx, off = [], 4
    for f in frames_jpeg:
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def read_avi_mjpeg(data: bytes) -> tuple[list[bytes], dict]:
    """AVI bytes -> (list of JPEG frame bytestrings, header info dict with
    width/height/fps/n_frames).  Accepts '00dc'/'00db' frame chunks; skips
    everything else (index, padding 'JUNK', extra streams)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI/RIFF file")
    info = {}
    frames: list[bytes] = []

    def walk(start: int, end: int):
        i = start
        while i + 8 <= end:
            fourcc = data[i:i + 4]
            size = struct.unpack("<I", data[i + 4:i + 8])[0]
            body0, body1 = i + 8, i + 8 + size
            if fourcc == b"LIST":
                walk(body0 + 4, body1)       # skip the list-type fourcc
            elif fourcc in (b"00dc", b"00db"):
                frames.append(data[body0:body1])
            elif fourcc == b"avih":
                v = struct.unpack("<IIIIIIIIII", data[body0:body0 + 40])
                info.update(us_per_frame=v[0], n_frames=v[4],
                            width=v[8], height=v[9],
                            fps=round(1_000_000 / v[0]) if v[0] else 0)
            i = body1 + (size % 2)
    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    return frames, info


def encode_avi_mjpeg(frames_rgb: np.ndarray, fps: int = 25,
                     quality: int = 95) -> bytes:
    """(n, h, w, 3) uint8 -> AVI/MJPEG bytes (test/fixture helper)."""
    from .jpegio import encode_jpeg
    n, h, w = frames_rgb.shape[:3]
    return write_avi_mjpeg([encode_jpeg(frames_rgb[i], quality)
                            for i in range(n)], w, h, fps)
