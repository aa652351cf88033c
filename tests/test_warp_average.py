"""Area-weighted 'average' resampling: resample_grid_average's SAT box mean
is pinned against a brute-force per-pixel overlap computation (exact, not
approximate — the SAT bilinear read IS the integral of a pixel grid), plus
nodata exclusion, sub-pixel degeneration, and end-to-end warp behavior."""
import numpy as np
import pytest


def brute_box_mean(data, x0, x1, y0, y1, nd):
    """O(pixels) reference: exact overlap-area-weighted mean of one box."""
    H, W = data.shape
    s = 0.0
    a = 0.0
    for r in range(int(np.floor(y0)), int(np.ceil(y1))):
        for c in range(int(np.floor(x0)), int(np.ceil(x1))):
            if not (0 <= r < H and 0 <= c < W):
                continue
            if nd is not None and data[r, c] == nd:
                continue
            w = max(0.0, min(x1, c + 1) - max(x0, c)) \
                * max(0.0, min(y1, r + 1) - max(y0, r))
            s += w * float(data[r, c])
            a += w
    return s / a if a > 0 else None


class TestResampleGridAverage:
    def _run(self, data, fc, fr, bw, bh, src_nd=None, dst_nd=-1):
        from dggsray.ops.warp import resample_grid_average
        return resample_grid_average(
            data[None].astype(np.float64), np.asarray(fc, float),
            np.asarray(fr, float), np.asarray(bw, float),
            np.asarray(bh, float), src_nd, dst_nd)[0]

    def test_aligned_box_is_block_mean(self):
        rng = np.random.default_rng(7)
        data = rng.integers(0, 100, (6, 9)).astype(np.float64)
        # 3x3 box centered at (4.5, 1.5) covers cols 3..6, rows 0..3
        got = self._run(data, [4.5], [1.5], [3.0], [3.0])
        assert got[0] == pytest.approx(data[0:3, 3:6].mean(), abs=1e-12)

    def test_fractional_box_matches_bruteforce(self):
        rng = np.random.default_rng(11)
        data = rng.uniform(0, 50, (12, 17))
        cases = [(3.7, 5.2, 2.9, 1.3), (0.4, 0.6, 5.0, 7.7),
                 (16.8, 11.9, 2.5, 2.5), (8.0, 6.0, 0.001, 0.001),
                 (2.25, 3.75, 1.5, 2.5)]
        fc = [c[0] for c in cases]
        fr = [c[1] for c in cases]
        bw = [c[2] for c in cases]
        bh = [c[3] for c in cases]
        got = self._run(data, fc, fr, bw, bh)
        for i, (x, y, w, h) in enumerate(cases):
            ref = brute_box_mean(data, max(x - w / 2, 0), min(x + w / 2, 17),
                                 max(y - h / 2, 0), min(y + h / 2, 12), None)
            assert got[i] == pytest.approx(ref, rel=1e-10), cases[i]

    def test_nodata_excluded_and_all_nodata_box(self):
        data = np.full((4, 4), 9.0)
        data[0:2, 0:2] = -99
        got = self._run(data, [1.0, 3.0], [1.0, 1.0], [2.0, 2.0],
                        [2.0, 2.0], src_nd=-99, dst_nd=-1)
        assert got[0] == -1                      # box fully inside nodata
        ref = brute_box_mean(data, 2, 4, 0, 2, -99)
        assert got[1] == pytest.approx(ref)      # valid quadrant only

    def test_subpixel_box_is_containing_pixel(self):
        data = np.arange(12, dtype=np.float64).reshape(3, 4)
        got = self._run(data, [2.5, 0.1], [1.5, 2.9], [0.01, 0.01],
                        [0.01, 0.01])
        assert got[0] == pytest.approx(data[1, 2], abs=1e-12)
        assert got[1] == pytest.approx(data[2, 0], abs=1e-12)

    def test_out_of_bounds_box_is_dst_nd(self):
        data = np.ones((3, 3))
        got = self._run(data, [-5.0], [1.0], [1.0], [1.0], dst_nd=-1)
        assert got[0] == -1

    def test_integer_dtype_rounds(self):
        from dggsray.ops.warp import resample_grid_average
        data = np.array([[[1, 2], [3, 4]]], dtype=np.uint8)
        got = resample_grid_average(data, np.array([1.0]), np.array([1.0]),
                                    np.array([2.0]), np.array([2.0]),
                                    None, 0)
        assert got.dtype == np.uint8
        assert got[0, 0] == round(2.5)  # banker's? np.rint(2.5)=2
        assert got[0, 0] == np.rint(2.5)


class TestWarpAverageEndToEnd:
    def test_constant_raster_stays_constant(self, tmp_path):
        from dggsray.core.raster import open_raster
        from dggsray.core.tiffio import GeoTiff, write_geotiff
        from dggsray.ops.warp import raster_to_rhealpix
        data = np.full((1, 40, 40), 7, dtype=np.int32)
        src = str(tmp_path / "const.tif")
        # 0.5-degree pixels centered near the equator
        write_geotiff(src, GeoTiff(data, 0.0, 10.0, 0.5, 0.5, nodata=0))
        dst = str(tmp_path / "out.tif")
        raster_to_rhealpix(src, dst, dst_resolution_idx=3,
                           resampling="average")
        g = open_raster(dst)
        vals = g.data[g.data != g.nodata]
        assert vals.size > 0
        assert (vals == 7).all()

    def test_downscale_average_equals_scale_raster_average(self, tmp_path):
        # same-CRS reproject_raster has an affine axis-aligned mapping, so
        # the SAT path must agree with an independent box-mean computation
        from dggsray.core.raster import open_raster
        from dggsray.core.tiffio import GeoTiff, write_geotiff
        from dggsray.ops.warp import resample_grid_average
        rng = np.random.default_rng(3)
        data = rng.uniform(0, 100, (1, 24, 24))
        # exact 3x downscale by hand through the public kernel
        jj, ii = np.meshgrid(np.arange(8), np.arange(8))
        fc = (jj.ravel() + 0.5) * 3.0
        fr = (ii.ravel() + 0.5) * 3.0
        got = resample_grid_average(
            data, fc, fr, np.full(64, 3.0), np.full(64, 3.0), None, 0) \
            .reshape(8, 8)
        ref = data[0].reshape(8, 3, 8, 3).mean(axis=(1, 3))
        assert np.allclose(got, ref, atol=1e-10)
        # and the memoized SAT does not leak across different arrays
        other = np.zeros((1, 24, 24))
        z = resample_grid_average(
            other, fc[:1], fr[:1], np.array([3.0]), np.array([3.0]),
            None, -1)
        assert z[0, 0] == 0.0
