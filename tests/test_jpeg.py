"""Baseline JPEG decoder: hand-built minimal bitstream (exact expected
pixels), the reference's real PNOA aerial fixture (statistical + continuity
checks — no second decoder exists in this environment), and the JPEG+PAM
georeferenced conversion the reference performs at tests_data.py:149,182."""
import os
import struct

import numpy as np
import pyarrow as pa
import pytest

PNOA = "/root/reference/tests/test_data/pnoa_2015_25830_0354_4_4.jpg"


def _minimal_jpeg(dc_diff_bits: str = "", flat: int = 128) -> bytes:
    """8x8 grayscale baseline JPEG with trivial Huffman tables (symbol 0 only
    for DC and AC -> zero DC diff + immediate EOB): decodes to all-`flat`."""
    out = bytearray(b"\xff\xd8")
    qt = bytes([0]) + bytes([1] * 64)                     # quant table 0, all 1
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(qt)) + qt
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DC table 0 and AC table 0: one 1-bit code for symbol 0
    for tc in (0x00, 0x10):
        dht = bytes([tc, 1] + [0] * 15 + [0])
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bytes([0b00111111])          # DC sym0 + AC EOB, padded with 1s
    out += b"\xff\xd9"
    return bytes(out)


def test_minimal_jpeg_decodes_flat():
    from dggsray.core.jpegio import decode_jpeg
    img = decode_jpeg(_minimal_jpeg())
    assert img.shape == (8, 8)
    assert (img == 128).all()           # zero coefficients + level shift


def test_world_file_parsing(tmp_path):
    from dggsray.core.jpegio import read_jpeg_raster
    p = str(tmp_path / "t.jpg")
    open(p, "wb").write(_minimal_jpeg())
    open(str(tmp_path / "t.jgw"), "w").write(
        "2.0\n0.0\n0.0\n-2.0\n100.0\n50.0\n")   # center-of-UL-pixel convention
    g, srs = read_jpeg_raster(p)
    assert g.left == pytest.approx(99.0)
    assert g.top == pytest.approx(51.0)
    assert g.res_x == 2.0 and g.res_y == 2.0


@pytest.mark.skipif(not os.path.exists(PNOA), reason="fixture absent")
class TestPNOA:
    def test_decode_and_convert(self, tmp_path):
        """One full decode of the 1815x1250 aerial ortho: SOF dims honored,
        plausible image statistics, strong spatial continuity across the 8-px
        block grid (a Huffman/IDCT bug destroys it), then the reference's
        conversion path (JPEG + PAM EPSG:25830) to a rhealpix raster."""
        from dggsray.core.jpegio import read_jpeg_raster
        from dggsray.core.tiffio import read_geotiff
        from dggsray.ops.warp import raster_to_rhealpix

        g, srs = read_jpeg_raster(PNOA)
        assert g.data.shape == (3, 1250, 1815)
        assert g.res_x == 4.0 and g.res_y == 4.0
        assert g.left == pytest.approx(671488.25)
        assert g.tags["utm"] == (30, True)      # EPSG:25830 from the PAM SRS
        means = g.data.mean(axis=(1, 2))
        assert ((means > 80) & (means < 180)).all()
        d = g.data[0].astype(np.float64)
        assert np.corrcoef(d[639], d[640])[0, 1] > 0.7   # cross-block rows
        assert np.corrcoef(d[:, 799], d[:, 800])[0, 1] > 0.7

        out = str(tmp_path / "pnoa_rhpx.tif")
        res = raster_to_rhealpix(PNOA, out, dst_resolution_idx=10,
                                 input_crs="auto")
        assert res == 10
        r = read_geotiff(out)
        assert r.data.shape[0] == 3
        assert abs(r.data.mean() - g.data.mean()) < 15   # same scene content


def test_jpeg_encoder_roundtrip_psnr():
    """encode_jpeg/decode_jpeg roundtrip on the synthetic imagery clears the
    PSNR >= 40 dB lossy-invariant bar at the table's quality setting."""
    from dggsray.core.jpegio import decode_jpeg, encode_jpeg
    from dggsray.io.imagetable import _pixels, psnr_db
    for i, (w, h) in [(0, (64, 64)), (7, (32, 32)), (11, (128, 96))]:
        img = _pixels(i, w, h)
        dec = decode_jpeg(encode_jpeg(img, quality=98))
        assert dec.shape == img.shape
        assert psnr_db(img, dec) >= 40.0


def test_images_jpeg_psnr_query(ray_session):
    """The lossy-codec invariant query: every row decodes over the PSNR bar
    with its caption intact (input_hint per-row invariant, lossy branch)."""
    from dggsray.pipelines.relational import images_jpeg_psnr
    out = images_jpeg_psnr("unused", n=60).to_pandas()
    assert len(out) == 60
    assert out.psnr_ok.all()
    assert out.caption_ok.all()
    assert (out.psnr_milli_db >= 40_000).all()


def test_flagship_verify_accepts_lossy_rows(ray_session):
    """ImageCellJoinAgg's per-row invariant takes the PSNR branch for
    fmt='jpeg' rows and still verifies lossless rows exactly."""
    import pyarrow as pa

    from dggsray.io.imagetable import synth_batch
    from dggsray.pipelines.flagship import ImageCellJoinAgg, vector_cells_table

    ids = pa.table({"id": pa.array(np.arange(24), "int64")})
    lossless = synth_batch(ids)
    lossy = synth_batch(ids, fmt_override="jpeg")
    mixed = pa.concat_tables([lossless, lossy])
    op = ImageCellJoinAgg(poly_ref=vector_cells_table(),
                          dst_resolution_idx=8, verify=True)
    out = op(mixed)
    assert out.num_rows == 48             # both halves pass their invariant


def test_image_with_world_file_to_geotiff(tmp_path):
    """The reference's jpg+world-file -> GeoTIFF composite
    (rasterutils.py:34-51) on the minimal bitstream."""
    from dggsray.core.raster import image_with_world_file_to_geotiff
    from dggsray.core.tiffio import read_geotiff
    p = str(tmp_path / "t.jpg")
    open(p, "wb").write(_minimal_jpeg())
    open(str(tmp_path / "t.jgw"), "w").write("2\n0\n0\n-2\n100\n50\n")
    out = str(tmp_path / "t.tif")
    image_with_world_file_to_geotiff(p, out, set_nodata_to_zero=True)
    g = read_geotiff(out)
    assert g.data.shape == (1, 8, 8)
    assert (g.data == 128).all()
    assert g.left == pytest.approx(99.0) and g.top == pytest.approx(51.0)
    assert g.nodata == 0


class TestAviMjpeg:
    def _frames(self, n=6, h=40, w=56):
        rng = np.random.default_rng(5)
        base = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        # smooth gradient frames (JPEG-friendly) with a moving bright bar
        xx = np.linspace(0, 255, w, dtype=np.float64)[None, :, None]
        frames = np.empty((n, h, w, 3), dtype=np.uint8)
        for i in range(n):
            f = 0.5 * base + 0.5 * xx
            f[:, (i * 7) % w:(i * 7) % w + 4, :] = 250
            frames[i] = np.clip(f, 0, 255).astype(np.uint8)
        return frames

    def test_container_roundtrip_exact_jpeg_bytes(self):
        from dggsray.core.aviio import read_avi_mjpeg, write_avi_mjpeg
        from dggsray.core.jpegio import encode_jpeg
        frames = self._frames()
        jpegs = [encode_jpeg(frames[i], quality=95) for i in range(len(frames))]
        avi = write_avi_mjpeg(jpegs, frames.shape[2], frames.shape[1], fps=10)
        back, info = read_avi_mjpeg(avi)
        assert back == jpegs                   # container is lossless
        assert info["width"] == frames.shape[2]
        assert info["height"] == frames.shape[1]
        assert info["n_frames"] == len(jpegs)
        assert info["fps"] == 10

    def test_video_stage_decodes_real_mjpeg(self, ray_session):
        from dggsray.core.aviio import encode_avi_mjpeg
        from dggsray.ops.multimodal import VideoFrameSample
        frames = self._frames(n=7)
        avi = encode_avi_mjpeg(frames, fps=5, quality=95)
        vt = pa.table({"video_id": pa.array(["v1"], pa.string()),
                       "w": pa.array([frames.shape[2]], pa.int32()),
                       "h": pa.array([frames.shape[1]], pa.int32()),
                       "bytes": pa.array([avi], pa.binary()),
                       "fmt": pa.array(["mjpeg"], pa.string())})
        out = VideoFrameSample(every_n=3)(vt)
        assert out.column("frame_idx").to_pylist() == [0, 3, 6]
        for row, fidx in enumerate([0, 3, 6]):
            got = np.frombuffer(out.column("bytes")[row].as_py(),
                                dtype=np.uint8).reshape(frames.shape[1:])
            err = (got.astype(np.float64) - frames[fidx]) ** 2
            psnr = 10 * np.log10(255.0 ** 2 / max(err.mean(), 1e-12))
            assert psnr > 30, f"frame {fidx}: PSNR {psnr:.1f} dB"

    def test_unknown_codec_raises(self):
        from dggsray.ops.multimodal import VideoFrameSample
        vt = pa.table({"video_id": pa.array(["v"], pa.string()),
                       "w": pa.array([2], pa.int32()),
                       "h": pa.array([2], pa.int32()),
                       "bytes": pa.array([b"xxxx"], pa.binary()),
                       "fmt": pa.array(["h264"], pa.string())})
        with pytest.raises(NotImplementedError):
            VideoFrameSample()(vt)
