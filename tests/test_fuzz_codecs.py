"""Corruption robustness of the from-scratch codecs.

A 100 TB ingest WILL see truncated and bit-flipped files; the decoders must
fail with ordinary exceptions (caught per-task, partition retried) — never
hang, never crash the process, never loop unboundedly.  Each case here
decodes a truncated or byte-flipped variant of a valid in-memory file and
accepts either a successful decode (some flips land in pixel data, which is
legitimately decodable) or a clean Exception.
"""
import io
import os
import tempfile

import numpy as np
import pytest

pa = pytest.importorskip("pyarrow")


def _roundtrip_cases(blob: bytes, rng: np.random.Generator, n_flips: int = 24):
    """Deterministic corruptions: truncations at structural points + random
    single-byte flips."""
    n = len(blob)
    cuts = sorted({0, 1, 3, 7, 8, 16, n // 4, n // 2, n - 1})
    for c in cuts:
        if c < n:
            yield blob[:c]
    for _ in range(n_flips):
        i = int(rng.integers(0, n))
        b = bytearray(blob)
        b[i] ^= int(rng.integers(1, 256))
        yield bytes(b)


def _assert_decodes_or_raises(fn, cases, fmt):
    ok = err = 0
    for blob in cases:
        try:
            fn(blob)
            ok += 1
        except Exception:           # noqa: BLE001 — ANY clean exception is fine
            err += 1
    # both buckets may be populated; the test's job is that we got HERE —
    # no hang, no interpreter crash — and that pure truncations do raise
    assert ok + err > 0, fmt


class TestCodecFuzz:
    def test_geotiff(self, tmp_path):
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        rng = np.random.default_rng(1)
        p = str(tmp_path / "f.tif")
        write_geotiff(p, GeoTiff(
            np.arange(192, dtype=np.int32).reshape(1, 12, 16),
            left=0.0, top=1.0, res_x=0.1, res_y=0.1, nodata=0))
        blob = open(p, "rb").read()

        def decode(b):
            q = str(tmp_path / "q.tif")
            with open(q, "wb") as f:
                f.write(b)
            return read_geotiff(q)

        _assert_decodes_or_raises(decode, _roundtrip_cases(blob, rng), "tif")
        # truncation below the header must raise, not return garbage
        with pytest.raises(Exception):
            decode(blob[:6])

    def test_jpeg(self):
        from dggsray.core.jpegio import decode_jpeg, encode_jpeg
        rng = np.random.default_rng(2)
        img = (np.arange(24 * 32 * 3) % 251).astype(np.uint8) \
            .reshape(24, 32, 3)
        blob = encode_jpeg(img, quality=90)
        _assert_decodes_or_raises(decode_jpeg,
                                  _roundtrip_cases(blob, rng), "jpeg")
        with pytest.raises(Exception):
            decode_jpeg(blob[:8])

    def test_avi(self):
        from dggsray.core.aviio import encode_avi_mjpeg, read_avi_mjpeg
        rng = np.random.default_rng(3)
        frames = (np.arange(3 * 16 * 16 * 3) % 250).astype(np.uint8) \
            .reshape(3, 16, 16, 3)
        blob = encode_avi_mjpeg(frames, fps=5, quality=90)
        _assert_decodes_or_raises(read_avi_mjpeg,
                                  _roundtrip_cases(blob, rng), "avi")
        with pytest.raises(Exception):
            read_avi_mjpeg(blob[:10])

    def test_wav(self):
        from dggsray.ops.multimodal import decode_wav
        import wave
        rng = np.random.default_rng(4)
        sig = (np.sin(np.arange(512) * 0.1) * 20000).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(sig.tobytes())
        blob = buf.getvalue()
        _assert_decodes_or_raises(decode_wav,
                                  _roundtrip_cases(blob, rng), "wav")
        with pytest.raises(Exception):
            decode_wav(blob[:4])

    def test_gpkg(self, ray_session, tmp_path):
        from dggsray.core.rhpx import DEFAULT_GRID, align_point
        from dggsray.core.tiffio import GeoTiff, write_geotiff
        from dggsray.io.gpkg import read_geopackage, rhealpix_to_geopackage
        rng = np.random.default_rng(5)
        w = DEFAULT_GRID.cell_width(3)
        left, top = align_point(-1e6, 1e6, 3, DEFAULT_GRID)
        src = str(tmp_path / "s.tif")
        write_geotiff(src, GeoTiff(
            np.arange(12, dtype=np.int32).reshape(1, 3, 4) + 1,
            left, top, w, w, nodata=0))
        gp = str(tmp_path / "c.gpkg")
        rhealpix_to_geopackage(src, gp)
        blob = open(gp, "rb").read()

        def decode(b):
            q = str(tmp_path / "q.gpkg")
            with open(q, "wb") as f:
                f.write(b)
            return read_geopackage(q)

        # sqlite is resilient to pixel-area flips; structural cuts must raise
        _assert_decodes_or_raises(decode, _roundtrip_cases(blob, rng), "gpkg")
        with pytest.raises(Exception):
            decode(blob[:50])

    def test_netcdf(self, tmp_path):
        from dggsray.core.netcdfio import NetCDFClassic
        from tests.test_netcdf import _write_classic
        rng = np.random.default_rng(6)
        p = str(tmp_path / "f.nc")
        _write_classic(p)
        blob = open(p, "rb").read()

        def decode(b):
            q = str(tmp_path / "q.nc")
            with open(q, "wb") as f:
                f.write(b)
            nc = NetCDFClassic(q)
            for v in nc.variables:
                nc.read(v)

        _assert_decodes_or_raises(decode, _roundtrip_cases(blob, rng), "nc")
        with pytest.raises(Exception):
            decode(blob[:3])

    @pytest.mark.parametrize("libver", ["earliest", "latest"])
    def test_hdf5(self, tmp_path, libver):
        from dggsray.core.hdf5io import NetCDF4, write_netcdf4
        rng = np.random.default_rng(17)
        p = str(tmp_path / "h.nc")
        ny, nx = 9, 11
        write_netcdf4(p, {
            "v": (np.arange(ny * nx, dtype=np.int16).reshape(ny, nx),
                  ("y", "x"), {"_FillValue": np.int16(-1)}),
            "y": (np.arange(ny, dtype=np.float64), ("y",), {}),
            "x": (np.arange(nx, dtype=np.float64), ("x",), {})},
            dims={"y": ny, "x": nx}, chunks=(4, 4), libver=libver)
        blob = open(p, "rb").read()

        def decode(b):
            q = str(tmp_path / "q.nc")
            with open(q, "wb") as f:
                f.write(b)
            nc = NetCDF4(q)
            for v in nc.variables:
                nc.read(v)
                _ = nc.variables[v].dim_names, nc.variables[v].nodata

        _assert_decodes_or_raises(decode, _roundtrip_cases(blob, rng),
                                  "hdf5")
        with pytest.raises(Exception):
            decode(blob[:7])                    # truncated signature
        with pytest.raises(Exception):
            decode(b"\x00" * len(blob))         # not HDF5 at all

    def test_shapefile(self, tmp_path):
        from dggsray.io.shapefile import read_shapefile
        rng = np.random.default_rng(7)
        src = "/root/reference/tests/test_data/Aragón_ETRS89_30N"
        blob = open(src + ".shp", "rb").read()

        def decode(b):
            q = str(tmp_path / "q.shp")
            with open(q, "wb") as f:
                f.write(b)
            # .dbf/.prj stay valid — the fuzz targets the geometry parser
            import shutil
            shutil.copy(src + ".dbf", str(tmp_path / "q.dbf"))
            shutil.copy(src + ".prj", str(tmp_path / "q.prj"))
            return read_shapefile(q)

        _assert_decodes_or_raises(decode,
                                  _roundtrip_cases(blob, rng, n_flips=12),
                                  "shp")

    def test_hfa(self, tmp_path):
        from dggsray.core.hfaio import read_img
        rng = np.random.default_rng(8)
        blob = open("/root/reference/tests/test_data/NAIP_30.img", "rb").read()
        # large fixture: truncations + a handful of header-area flips only
        cases = [blob[:c] for c in (0, 7, 16, 200, 5000, len(blob) // 2)]
        for _ in range(6):
            i = int(rng.integers(0, 20000))
            b = bytearray(blob)
            b[i] ^= int(rng.integers(1, 256))
            cases.append(bytes(b))

        def decode(b):
            q = str(tmp_path / "q.img")
            with open(q, "wb") as f:
                f.write(b)
            return read_img(q)

        _assert_decodes_or_raises(decode, cases, "hfa")
        with pytest.raises(Exception):
            decode(blob[:7])
