"""UTM input CRS (pure-numpy Krüger TM), cubic resampling, line burning.

Reference parity targets: raster_to_rhpx.py:58-77 (arbitrary projected input
CRS), tests_data.py:152-153 (cubic), vector_to_rhpx.py:562-563 (line
rasterize all_touched).
"""
import math
import os

import numpy as np
import pytest


class TestTransverseMercator:
    def test_central_meridian_equator(self):
        from dggsray.core.tmerc import utm_fwd
        e, n = utm_fwd(-3.0, 0.0, 30)
        assert float(e) == pytest.approx(500_000.0, abs=1e-9)
        assert float(n) == pytest.approx(0.0, abs=1e-9)

    def test_meridian_arc_vs_independent_integral(self):
        """y on the central meridian must equal k0 * meridian arc length; the
        arc is integrated numerically here with no shared code."""
        from dggsray.core.tmerc import _tm_fwd
        a, f = 6378137.0, 1 / 298.257223563
        e2 = f * (2 - f)
        phi = np.linspace(0.0, np.radians(40.0), 1_000_001)
        m40 = a * (1 - e2) * np.trapz((1 - e2 * np.sin(phi) ** 2) ** -1.5, phi)
        _, y40 = _tm_fwd(-3.0, 40.0, -3.0)
        assert float(y40) == pytest.approx(m40, abs=1e-4)

    def test_roundtrip_zone(self):
        from dggsray.core.tmerc import utm_fwd, utm_inv
        rng = np.random.default_rng(3)
        lon = -3 + rng.uniform(-4, 4, 20000)
        lat = rng.uniform(-84, 84, 20000)
        for south in (False, True):
            e, n = utm_fwd(lon, lat, 30, south)
            lon2, lat2 = utm_inv(e, n, 30, south)
            assert np.abs(lon2 - lon).max() < 1e-9
            assert np.abs(lat2 - lat).max() < 1e-9

    def test_scale_factor_on_cm(self):
        from dggsray.core.tmerc import utm_fwd
        a, f = 6378137.0, 1 / 298.257223563
        e2 = f * (2 - f)
        _, n1 = utm_fwd(-3.0, 40.0, 30)
        _, n2 = utm_fwd(-3.0, 40.0 + 1e-6, 30)
        mrad = a * (1 - e2) / (1 - e2 * np.sin(np.radians(40)) ** 2) ** 1.5
        k = (n2 - n1) / (mrad * np.radians(1e-6))
        assert k == pytest.approx(0.9996, abs=1e-6)

    def test_crs_parsing(self):
        from dggsray.core.tmerc import parse_utm_crs
        assert parse_utm_crs("utm:30N") == (30, False)
        assert parse_utm_crs("utm:7s") == (7, True)
        assert parse_utm_crs("epsg:32630") == (30, False)
        assert parse_utm_crs("epsg:32733") == (33, True)
        with pytest.raises(ValueError):
            parse_utm_crs("epsg:4326")


class TestUtmWarp:
    def _make_utm_fixture(self, path, zone=30, lon0=-3.4, lat0=40.0,
                          px=100.0, W=64, H=48):
        from dggsray.core.tiffio import GeoTiff, write_geotiff
        from dggsray.core.tmerc import utm_fwd
        e0, n0 = utm_fwd(lon0, lat0, zone)
        left = math.floor(e0 / px) * px
        top = math.ceil(n0 / px) * px
        data = (np.arange(H * W, dtype=np.int32).reshape(1, H, W) % 251) + 1
        write_geotiff(path, GeoTiff(data, left, top, px, px, nodata=0))
        return left, top, data

    def test_utm_warp_golden_lattice(self, tmp_path):
        """Every output cell center must carry the source pixel its center maps
        to under the (independently validated) UTM chain."""
        from dggsray.core.rhpx import DEFAULT_GRID, project_inv
        from dggsray.core.tiffio import read_geotiff
        from dggsray.core.tmerc import utm_fwd
        from dggsray.ops.warp import raster_to_rhealpix

        src = str(tmp_path / "utm_src.tif")
        dst = str(tmp_path / "utm_dst.tif")
        left, top, data = self._make_utm_fixture(src)
        res_idx = raster_to_rhealpix(src, dst, input_crs="utm:30N")
        g = read_geotiff(dst)
        cw = DEFAULT_GRID.cell_width(res_idx)
        assert g.res_x == pytest.approx(cw)
        H, W = data.shape[1], data.shape[2]
        jj, ii = np.meshgrid(np.arange(g.data.shape[2]),
                             np.arange(g.data.shape[1]))
        xs = g.left + (jj.ravel() + 0.5) * g.res_x
        ys = g.top - (ii.ravel() + 0.5) * g.res_y
        lon, lat = project_inv(xs, ys, DEFAULT_GRID)
        e, n = utm_fwd(lon, lat, 30)
        sc = np.floor((e - left) / 100.0).astype(np.int64)
        sr = np.floor((top - n) / 100.0).astype(np.int64)
        ok = (sc >= 0) & (sc < W) & (sr >= 0) & (sr < H)
        got = g.data[0].ravel()
        assert (got[ok] == data[0, sr[ok], sc[ok]]).all()
        assert (got[~ok] == 0).all()
        # the in-bounds region must be non-trivial
        assert ok.sum() > 0.5 * ok.size

    def test_utm_resolution_inference_uses_pixel_size(self, tmp_path):
        from dggsray.core.rhpx import DEFAULT_GRID
        from dggsray.ops.warp import (RescalingStrategy, infer_resolution_idx)
        from dggsray.core.tiffio import read_geotiff
        src = str(tmp_path / "utm_src2.tif")
        self._make_utm_fixture(src, px=100.0)
        g = read_geotiff(src)
        idx = infer_resolution_idx(g, "utm:30N", DEFAULT_GRID,
                                   RescalingStrategy.TO_CLOSEST)
        assert idx == DEFAULT_GRID.get_closest_resolution(100.0)[0]

    def test_bad_crs_rejected(self, tmp_path):
        from dggsray.ops.warp import raster_to_rhealpix
        src = str(tmp_path / "x.tif")
        self._make_utm_fixture(src)
        with pytest.raises(ValueError, match="unsupported input CRS"):
            raster_to_rhealpix(src, str(tmp_path / "y.tif"),
                               input_crs="epsg:4326")


class TestCubicResampling:
    def test_integer_centers_are_exact(self):
        """Sampling exactly at pixel centers (t=0) must return the original
        values: the Keys kernel is interpolating."""
        from dggsray.ops.warp import resample_grid
        rng = np.random.default_rng(5)
        data = rng.integers(0, 255, size=(1, 16, 16)).astype(np.float64)
        jj, ii = np.meshgrid(np.arange(2, 14), np.arange(2, 14))
        fc = jj.ravel() + 0.5
        fr = ii.ravel() + 0.5
        out = resample_grid(data, fc, fr, "cubic", None, -1.0)
        assert np.allclose(out[0], data[0, 2:14, 2:14].ravel())

    def test_linear_precision(self):
        """Cubic convolution reproduces linear ramps exactly (order-2 kernel)."""
        from dggsray.ops.warp import resample_grid
        H = W = 20
        ramp = (3.0 * np.arange(W)[None, :] + 7.0 * np.arange(H)[:, None]
                )[None].astype(np.float64)
        rng = np.random.default_rng(6)
        fc = rng.uniform(2.0, W - 2.5, 500)
        fr = rng.uniform(2.0, H - 2.5, 500)
        out = resample_grid(ramp, fc, fr, "cubic", None, np.nan)
        exp = 3.0 * (fc - 0.5) + 7.0 * (fr - 0.5)
        assert np.allclose(out[0], exp, atol=1e-9)

    def test_cubic_warp_cli_chain(self, tmp_path):
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import raster_to_rhealpix
        src = str(tmp_path / "geo.tif")
        data = np.fromfunction(lambda b, r, c: 10 * r + c, (1, 24, 36)) \
            .astype(np.float64)
        write_geotiff(src, GeoTiff(data, -1.0, 41.0, 0.02, 0.02, nodata=-9999))
        dst = str(tmp_path / "geo_rhpx.tif")
        idx = raster_to_rhealpix(src, dst, resampling="cubic")
        g = read_geotiff(dst)
        inb = g.data[0][g.data[0] != -9999]
        assert inb.size > 0
        assert inb.min() >= data.min() - 5 and inb.max() <= data.max() + 5

    def test_scale_raster_cubic(self, tmp_path):
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import scale_raster
        src = str(tmp_path / "s.tif")
        ramp = (2.0 * np.arange(30)[None, :] + np.zeros((30, 1)))[None] \
            .astype(np.float64)
        write_geotiff(src, GeoTiff(ramp, 0.0, 30.0, 1.0, 1.0, nodata=None))
        dst = str(tmp_path / "s2.tif")
        scale_raster(src, dst, 2.0, resampling="cubic")
        g = read_geotiff(dst)
        assert g.data.shape == (1, 60, 60)
        # interior of the upscaled ramp stays a ramp with half the step
        mid = g.data[0, 30, 10:50]
        steps = np.diff(mid)
        assert np.allclose(steps, 1.0, atol=1e-6)


class TestLanczosResampling:
    def test_integer_centers_are_exact(self):
        """Lanczos is interpolating: at t=0 the center tap weight is 1 and all
        others 0, so pixel-center samples return the original values."""
        from dggsray.ops.warp import resample_grid
        rng = np.random.default_rng(7)
        data = rng.integers(0, 255, size=(1, 18, 18)).astype(np.float64)
        jj, ii = np.meshgrid(np.arange(3, 15), np.arange(3, 15))
        fc = jj.ravel() + 0.5
        fr = ii.ravel() + 0.5
        out = resample_grid(data, fc, fr, "lanczos", None, -1.0)
        assert np.allclose(out[0], data[0, 3:15, 3:15].ravel())

    def test_dc_preservation_and_ramp(self):
        """Normalized weights preserve constants exactly; a linear ramp is
        reproduced to well under half a gray level (lanczos is not order-2
        exact like Keys cubic, but is close on smooth signals)."""
        from dggsray.ops.warp import resample_grid
        H = W = 24
        const = np.full((1, H, W), 42.0)
        ramp = (3.0 * np.arange(W)[None, :] + 7.0 * np.arange(H)[:, None]
                )[None].astype(np.float64)
        rng = np.random.default_rng(8)
        fc = rng.uniform(3.0, W - 3.5, 500)
        fr = rng.uniform(3.0, H - 3.5, 500)
        out_c = resample_grid(const, fc, fr, "lanczos", None, np.nan)
        assert np.allclose(out_c[0], 42.0, atol=1e-12)
        out_r = resample_grid(ramp, fc, fr, "lanczos", None, np.nan)
        exp = 3.0 * (fc - 0.5) + 7.0 * (fr - 0.5)
        assert np.allclose(out_r[0], exp, atol=0.4)

    def test_out_of_support_gets_nodata(self):
        """Points whose 6x6 support leaves the grid get dst_nodata."""
        from dggsray.ops.warp import resample_grid
        data = np.ones((1, 10, 10))
        out = resample_grid(data, np.array([1.0, 5.0]), np.array([1.0, 5.0]),
                            "lanczos", None, -7.0)
        assert out[0, 0] == -7.0 and np.isclose(out[0, 1], 1.0)

    def test_scale_raster_lanczos(self, tmp_path):
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import scale_raster
        src = str(tmp_path / "s.tif")
        ramp = (2.0 * np.arange(32)[None, :] + np.zeros((32, 1)))[None] \
            .astype(np.float64)
        write_geotiff(src, GeoTiff(ramp, 0.0, 32.0, 1.0, 1.0, nodata=None))
        dst = str(tmp_path / "s2.tif")
        scale_raster(src, dst, 2.0, resampling="lanczos")
        g = read_geotiff(dst)
        assert g.data.shape == (1, 64, 64)
        # lanczos is not linear-precise: a 2x upscale of a ramp oscillates
        # +-0.08 around the ideal half-step (windowed-sinc ringing, matches
        # GDAL) but the mean slope is exact and pairs sum to the full step
        mid = g.data[0, 32, 12:52]
        steps = np.diff(mid)
        assert np.allclose(steps, 1.0, atol=0.12)
        assert np.isclose(steps[:38].mean(), 1.0, atol=1e-6)
        assert np.allclose(steps[:-1:2] + steps[1::2], 2.0, atol=1e-9)


class TestSplineAverageMode:
    def test_bspline_smooths_but_preserves_constants_and_ramps(self):
        """cubic_spline is approximating: constants and linear ramps are
        reproduced exactly (B-spline has linear precision), but an impulse is
        spread (value at the impulse center < 1)."""
        from dggsray.ops.warp import resample_grid
        H = W = 16
        ramp = (2.0 * np.arange(W)[None, :] + 5.0 * np.arange(H)[:, None]
                )[None].astype(np.float64)
        rng = np.random.default_rng(9)
        fc = rng.uniform(2.0, W - 2.5, 300)
        fr = rng.uniform(2.0, H - 2.5, 300)
        out = resample_grid(ramp, fc, fr, "cubic_spline", None, np.nan)
        exp = 2.0 * (fc - 0.5) + 5.0 * (fr - 0.5)
        assert np.allclose(out[0], exp, atol=1e-9)
        imp = np.zeros((1, H, W))
        imp[0, 8, 8] = 1.0
        at = resample_grid(imp, np.array([8.5]), np.array([8.5]),
                           "cubic_spline", None, np.nan)
        assert 0.3 < at[0, 0] < 0.6    # (2/3)^2 = 0.444: spread, not interpolated

    def test_scale_raster_average_exact_blocks(self, tmp_path):
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import scale_raster
        rng = np.random.default_rng(10)
        data = rng.integers(0, 255, size=(2, 12, 12)).astype(np.float64)
        src = str(tmp_path / "a.tif")
        write_geotiff(src, GeoTiff(data, 0.0, 12.0, 1.0, 1.0, nodata=None))
        dst = str(tmp_path / "a2.tif")
        scale_raster(src, dst, 1 / 3, resampling="average")
        g = read_geotiff(dst)
        assert g.data.shape == (2, 4, 4)
        exp = data.reshape(2, 4, 3, 4, 3).mean(axis=(2, 4))
        assert np.allclose(g.data, exp)
        assert g.res_x == 3.0 and g.res_y == 3.0

    def test_scale_raster_average_uneven(self, tmp_path):
        """Non-integer ratio: dest pixels partition the source, every source
        pixel contributes to exactly one dest pixel, total mass conserved."""
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import scale_raster
        data = np.arange(70.0).reshape(1, 7, 10)
        src = str(tmp_path / "u.tif")
        write_geotiff(src, GeoTiff(data, 0.0, 7.0, 1.0, 1.0, nodata=None))
        dst = str(tmp_path / "u2.tif")
        scale_raster(src, dst, 0.4, resampling="average")
        g = read_geotiff(dst)
        assert g.data.shape == (1, 3, 4)

    def test_scale_raster_mode_majority(self, tmp_path):
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import scale_raster
        data = np.zeros((1, 4, 4), dtype=np.float64)
        data[0, :2, :2] = [[7, 7], [7, 3]]     # majority 7
        data[0, :2, 2:] = [[1, 2], [2, 2]]     # majority 2
        data[0, 2:, :2] = 5                    # all 5
        data[0, 2:, 2:] = [[9, 9], [4, 9]]     # majority 9
        src = str(tmp_path / "m.tif")
        write_geotiff(src, GeoTiff(data, 0.0, 4.0, 1.0, 1.0, nodata=None))
        dst = str(tmp_path / "m2.tif")
        scale_raster(src, dst, 0.5, resampling="mode")
        g = read_geotiff(dst)
        assert g.data[0].tolist() == [[7.0, 2.0], [5.0, 9.0]]

    def test_average_upscale_degrades_to_bilinear(self, tmp_path):
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import scale_raster
        ramp = (np.arange(10.0)[None, :] + np.zeros((10, 1)))[None]
        src = str(tmp_path / "b.tif")
        write_geotiff(src, GeoTiff(ramp, 0.0, 10.0, 1.0, 1.0, nodata=None))
        dst = str(tmp_path / "b2.tif")
        scale_raster(src, dst, 2.0, resampling="average")
        g = read_geotiff(dst)
        assert g.data.shape == (1, 20, 20)
        mid = g.data[0, 10, 4:36]
        assert np.allclose(np.diff(mid[: mid.size // 2 * 2 - 1]), 0.5, atol=1e-9)


class TestLineBurning:
    def _dense_expected(self, coords, res, grid):
        """Touched cells via dense sampling along the line (independent of the
        supercover traversal)."""
        from dggsray.core.rhpx import cell_from_point, project_fwd
        x, y = project_fwd(coords[:, 0], coords[:, 1], grid)
        pts = []
        for i in range(len(x) - 1):
            seglen = math.hypot(x[i + 1] - x[i], y[i + 1] - y[i])
            n = max(2, int(seglen / (grid.cell_width(res) / 53)))
            t = np.linspace(0, 1, n)
            pts.append(np.column_stack([x[i] + t * (x[i + 1] - x[i]),
                                        y[i] + t * (y[i + 1] - y[i])]))
        allp = np.vstack(pts)
        cells = cell_from_point(res, allp[:, 0], allp[:, 1], grid)
        return {c for c in cells if c}

    def test_supercover_equals_dense_sampling(self):
        from dggsray.core.rhpx import DEFAULT_GRID
        from dggsray.ops.vector2dggs import burn_lines_to_cells
        res = 6
        coords = np.array([[-1.7, 40.1], [-0.3, 41.2], [0.9, 40.6]])
        t = burn_lines_to_cells(
            [{"feature_id": 0, "value": 3, "coords": coords}], res,
            DEFAULT_GRID)
        got = set(t.column("cellid").to_pylist())
        exp = self._dense_expected(coords, res, DEFAULT_GRID)
        # dense sampling can miss zero-measure corner touches; supercover must
        # cover every densely-hit cell and add at most corner-touch cells
        assert exp <= got
        assert len(got - exp) <= max(2, len(exp) // 20)
        assert all(v == 3 for v in t.column("value").to_pylist())

    def test_diagonal_supercover_count(self):
        from dggsray.core.rhpx import DEFAULT_GRID
        from dggsray.ops.vector2dggs import burn_lines_to_cells
        res = 5
        coords = np.array([[-2.0, 39.5], [0.5, 42.0]])
        t = burn_lines_to_cells(
            [{"feature_id": 0, "value": 1, "coords": coords}], res,
            DEFAULT_GRID)
        # supercover (all_touched) visits ~dx+dy cells on a diagonal, strictly
        # more than the 8-connected Bresenham max(dx, dy)
        assert t.num_rows >= 10

    def test_paint_order_later_wins(self):
        from dggsray.core.rhpx import DEFAULT_GRID
        from dggsray.ops.vector2dggs import burn_lines_to_cells
        res = 5
        a = np.array([[-1.5, 40.0], [0.5, 40.0]])
        b = np.array([[-0.5, 39.0], [-0.5, 41.0]])
        t = burn_lines_to_cells(
            [{"feature_id": 0, "value": 1, "coords": a},
             {"feature_id": 1, "value": 2, "coords": b}], res, DEFAULT_GRID)
        m = dict(zip(t.column("cellid").to_pylist(),
                     t.column("value").to_pylist()))
        t2 = burn_lines_to_cells(
            [{"feature_id": 1, "value": 2, "coords": b}], res, DEFAULT_GRID)
        cross = set(t2.column("cellid").to_pylist()) & {
            c for c, v in m.items()}
        assert cross, "lines must intersect"
        assert all(m[c] == 2 for c in cross)


class TestScaleToDesiredRes:
    def _mk(self, tmp_path, res=0.01):
        from dggsray.core.tiffio import GeoTiff, write_geotiff
        H, W = 40, 60
        data = (np.add.outer(np.arange(H), np.arange(W)) % 200 + 1).astype(
            np.uint8)[None]
        src = str(tmp_path / "src.tif")
        write_geotiff(src, GeoTiff(data, left=-4.0, top=41.0, res_x=res,
                                   res_y=res, nodata=0))
        return src

    def test_desired_res_exact(self, tmp_path):
        from dggsray.core.raster import open_raster
        from dggsray.ops.warp import scale_raster_to_desired_res
        src = self._mk(tmp_path)
        dst = str(tmp_path / "out.tif")
        scale_raster_to_desired_res(src, dst, 0.02)
        g = open_raster(dst)
        assert g.res_x == pytest.approx(0.02)
        assert g.res_y == pytest.approx(0.02)
        assert g.data.shape == (1, 20, 30)

    def test_anisotropic(self, tmp_path):
        from dggsray.core.raster import open_raster
        from dggsray.ops.warp import scale_raster_to_desired_res
        src = self._mk(tmp_path)
        dst = str(tmp_path / "out.tif")
        scale_raster_to_desired_res(src, dst, 0.02, 0.005)
        g = open_raster(dst)
        assert g.res_x == pytest.approx(0.02)
        assert g.res_y == pytest.approx(0.005)
        assert g.data.shape == (1, 80, 30)


class TestReprojectRaster:
    """General CRS<->CRS reprojection through the lonlat hub (reference
    rasterutils.py:122-173)."""

    def _mk_geo(self, tmp_path):
        from dggsray.core.tiffio import GeoTiff, write_geotiff
        H, W = 60, 80
        y, x = np.mgrid[0:H, 0:W]
        data = (40 + 0.9 * x + 1.1 * y).astype(np.float32)[None]
        src = str(tmp_path / "geo.tif")
        write_geotiff(src, GeoTiff(data, left=-4.0, top=41.0, res_x=0.01,
                                   res_y=0.01, nodata=-1.0))
        return src, data

    def test_geo_to_utm_pixel_size(self, tmp_path):
        from dggsray.core.raster import open_raster
        from dggsray.ops.warp import reproject_raster
        src, _ = self._mk_geo(tmp_path)
        dst = str(tmp_path / "utm.tif")
        reproject_raster(src, dst, "utm:30N", input_crs="geographic")
        g = open_raster(dst)
        # 0.01 deg lat at ~40.7N is ~1.11 km; suggested square pixel close
        assert 900 < g.res_x < 1300
        assert g.data.shape[0] == 1
        # northing around 4.5e6 in zone 30 north at 40.7N
        assert 4.4e6 < g.top < 4.7e6

    def test_roundtrip_values(self, tmp_path):
        """geo -> UTM -> geo with bilinear must reproduce the linear surface
        almost exactly (a plane is invariant under bilinear resampling)."""
        from dggsray.core.raster import open_raster
        from dggsray.ops.warp import reproject_raster
        src, data = self._mk_geo(tmp_path)
        mid = str(tmp_path / "utm.tif")
        back = str(tmp_path / "back.tif")
        reproject_raster(src, mid, "utm:30N", input_crs="geographic",
                         resampling="bilinear")
        # auto-detect must pick the utm CRS back up from the GDAL_METADATA tag
        reproject_raster(mid, back, "geographic", resampling="bilinear")
        g0 = open_raster(src)
        g1 = open_raster(back)
        # sample interior destination pixels at their lonlat and compare with
        # the analytic plane value
        H1, W1 = g1.data.shape[1:]
        r0, r1 = H1 // 4, H1 - H1 // 4
        c0, c1 = W1 // 4, W1 - W1 // 4
        interior = g1.data[0, r0:r1, c0:c1]
        valid = interior[interior != -1.0]
        assert valid.size > 100
        ii, jj = np.mgrid[r0:r1, c0:c1]
        lon = g1.left + (jj + 0.5) * g1.res_x
        lat = g1.top - (ii + 0.5) * g1.res_y
        # plane in source pixel coords: v = 40 + .9*col + 1.1*row
        col = (lon - g0.left) / g0.res_x - 0.5
        row = (g0.top - lat) / g0.res_y - 0.5
        exp = 40 + 0.9 * col + 1.1 * row
        m = interior != -1.0
        err = np.abs(interior[m] - exp[m])
        assert np.median(err) < 0.05
        assert np.percentile(err, 95) < 0.5

    def test_geo_to_rhealpix(self, tmp_path):
        from dggsray.core.raster import open_raster
        from dggsray.ops.warp import reproject_raster
        src, _ = self._mk_geo(tmp_path)
        dst = str(tmp_path / "rhpx.tif")
        reproject_raster(src, dst, "rhealpix", input_crs="geographic")
        g = open_raster(dst)
        # rhealpix planar coords are in meters, magnitude < pi*R
        assert abs(g.left) < 2.1e7 and abs(g.top) < 2.1e7
        assert 500 < g.res_x < 2500

    def test_bad_crs_raises(self, tmp_path):
        from dggsray.ops.warp import reproject_raster
        src, _ = self._mk_geo(tmp_path)
        with pytest.raises(ValueError, match="unsupported CRS"):
            reproject_raster(src, str(tmp_path / "x.tif"), "mercator")


class TestAverageNodata:
    def test_nodata_excluded_from_block_mean(self, tmp_path):
        """GDAL Resampling.average semantics: nodata pixels don't blend into
        the mean; all-nodata blocks stay nodata."""
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import scale_raster
        src = str(tmp_path / "s.tif")
        dst = str(tmp_path / "d.tif")
        d = np.full((1, 4, 4), 255, dtype=np.uint8)   # nodata everywhere...
        d[0, :2, :2] = [[10, 20], [30, 40]]           # ...but one block
        write_geotiff(src, GeoTiff(d, 0.0, 4.0, 1.0, 1.0, nodata=255))
        scale_raster(src, dst, 0.5, resampling="average")
        out = read_geotiff(dst).data[0]
        assert out.shape == (2, 2)
        assert out[0, 0] == 25                        # mean of the 4 valid
        assert out[0, 1] == 255 and out[1, 0] == 255 and out[1, 1] == 255

    def test_mixed_block_averages_valid_only(self, tmp_path):
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import scale_raster
        src = str(tmp_path / "s.tif")
        dst = str(tmp_path / "d.tif")
        d = np.array([[[100, 255], [50, 255]]], dtype=np.uint8)
        write_geotiff(src, GeoTiff(d, 0.0, 2.0, 1.0, 1.0, nodata=255))
        scale_raster(src, dst, 0.5, resampling="average")
        out = read_geotiff(dst).data[0]
        assert out[0, 0] == 75                        # (100+50)/2, not /4


class TestAutoCrsTagRoundtrip:
    def test_reprojected_output_feeds_auto_warp(self, tmp_path):
        """reproject_raster tags its output CRS; raster_to_rhealpix auto must
        honor it (regression: misread as geographic)."""
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import raster_to_rhealpix, reproject_raster
        src = str(tmp_path / "geo.tif")
        mid = str(tmp_path / "wm.tif")
        out_a = str(tmp_path / "a.tif")
        out_b = str(tmp_path / "b.tif")
        data = (np.arange(24 * 36, dtype=np.int32).reshape(1, 24, 36)
                % 97) + 1
        write_geotiff(src, GeoTiff(data, -4.0, 2.0, 0.02, 0.02, nodata=0))
        reproject_raster(src, mid, dst_crs="webmerc", input_crs="geographic")
        res_a = raster_to_rhealpix(mid, out_a, input_crs="auto")
        res_b = raster_to_rhealpix(mid, out_b, input_crs="webmerc")
        assert res_a == res_b
        a, b = read_geotiff(out_a), read_geotiff(out_b)
        assert a.left == b.left and a.top == b.top
        assert (a.data == b.data).all()


class TestDistributedWarp:
    def test_distributed_equals_single_process(self, ray_session, tmp_path, monkeypatch):
        """The Ray row-chunk warp path must produce the exact bytes of the
        single-process path (same kernel, different scheduling)."""
        import dggsray.ops.warp as W
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff

        rng = np.random.default_rng(7)
        data = rng.integers(1, 255, size=(2, 90, 120), dtype=np.int64).astype(np.float64)
        src = str(tmp_path / "src.tif")
        write_geotiff(src, GeoTiff(data, left=-3.0, top=48.0,
                                   res_x=0.01, res_y=0.01, nodata=0.0))

        single = str(tmp_path / "single.tif")
        W.raster_to_rhealpix(src, single, resampling="bilinear", row_chunk=37)

        monkeypatch.setattr(W, "_DIST_WARP_MIN_CELLS", 1)
        dist = str(tmp_path / "dist.tif")
        W.raster_to_rhealpix(src, dist, resampling="bilinear", row_chunk=37)

        a, b = read_geotiff(single), read_geotiff(dist)
        assert a.data.shape == b.data.shape
        assert np.array_equal(a.data, b.data)
        assert (a.left, a.top, a.res_x, a.res_y) == (b.left, b.top, b.res_x, b.res_y)


class TestGeoKeysAutoCrs:
    def test_geokey_roundtrip_and_auto_utm(self, ray_session, tmp_path):
        """A GeoTIFF whose GeoKeyDirectory carries EPSG:32630 warps through
        input_crs='auto' identically to an explicit input_crs='utm:30N'."""
        from dggsray.core.tiffio import (GeoTiff, epsg_from_geokeys,
                                         read_geotiff, write_geotiff)
        from dggsray.core.tmerc import utm_fwd
        from dggsray.ops.warp import raster_to_rhealpix

        rng = np.random.default_rng(9)
        data = rng.integers(1, 200, size=(1, 24, 30)).astype(np.float64)
        # place the raster around UTM 30N coordinates of (-3E, 40N)
        ex, ny = utm_fwd(np.array([-3.0]), np.array([40.0]), 30, True)
        src = str(tmp_path / "utm.tif")
        write_geotiff(src, GeoTiff(data, left=float(ex[0]), top=float(ny[0]),
                                   res_x=100.0, res_y=100.0, nodata=0.0,
                                   tags={"geokeys": {1024: 1, 3072: 32630}}))
        g = read_geotiff(src)
        assert g.tags["geokeys"][3072] == 32630
        assert epsg_from_geokeys(g.tags["geokeys"]) == "utm:30N"

        out_auto = str(tmp_path / "auto.tif")
        out_utm = str(tmp_path / "utm_exp.tif")
        r1 = raster_to_rhealpix(src, out_auto, input_crs="auto")
        r2 = raster_to_rhealpix(src, out_utm, input_crs="utm:30N")
        assert r1 == r2
        a, b = read_geotiff(out_auto), read_geotiff(out_utm)
        assert np.array_equal(a.data, b.data)

    def test_epsg_mapping(self):
        from dggsray.core.tiffio import epsg_from_geokeys
        assert epsg_from_geokeys({2048: 4326}) == "geographic"
        assert epsg_from_geokeys({3072: 32733}) == "utm:33S"
        assert epsg_from_geokeys({3072: 3857}) == "webmerc"
        assert epsg_from_geokeys({3072: 2154}) is None   # Lambert-93: explicit

    def test_reproject_distributed_equals_single(self, ray_session, tmp_path, monkeypatch):
        import dggsray.ops.warp as W
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        rng = np.random.default_rng(21)
        data = rng.integers(1, 255, size=(1, 80, 100)).astype(np.float64)
        src = str(tmp_path / "src.tif")
        write_geotiff(src, GeoTiff(data, left=-2.0, top=45.0,
                                   res_x=0.01, res_y=0.01, nodata=0.0))
        s = str(tmp_path / "s.tif")
        W.reproject_raster(src, s, dst_crs="webmerc", input_crs="geographic",
                           resampling="bilinear", row_chunk=23)
        monkeypatch.setattr(W, "_DIST_WARP_MIN_CELLS", 1)
        d = str(tmp_path / "d.tif")
        W.reproject_raster(src, d, dst_crs="webmerc", input_crs="geographic",
                           resampling="bilinear", row_chunk=23)
        a, b = read_geotiff(s), read_geotiff(d)
        assert np.array_equal(a.data, b.data)


class TestAutoCrsFallthrough:
    def test_empty_geokeys_fall_through_to_rhpx_tags(self, ray_session, tmp_path):
        """A GeoTIFF whose GeoKeyDirectory carries no resolvable EPSG code
        (e.g. only a raster-type key) must fall through the auto-CRS chain to
        the GDAL_METADATA n_side tag instead of hard-erroring (regression)."""
        from dggsray.core.rhpx import DEFAULT_GRID, align_point
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import get_rhpx_metadata
        res = 3
        w = DEFAULT_GRID.cell_width(res)
        left, top = align_point(-1e6, 1e6, res, DEFAULT_GRID)
        arr = np.arange(20, dtype=np.int32).reshape(1, 4, 5) + 1
        src = str(tmp_path / "rhpx_gk.tif")
        write_geotiff(src, GeoTiff(
            arr, left, top, w, w, nodata=0,
            tags={"geokeys": {1025: 1},     # GTRasterTypeGeoKey only
                  "GDAL_METADATA": '<GDALMetadata><Item name="n_side">3'
                                   '</Item></GDALMetadata>'}))
        meta = get_rhpx_metadata(src)
        assert meta["res_idx"] == res       # detected as rhealpix, no error

    def test_unknown_geographic_code_defaults_geographic(self, ray_session, tmp_path):
        """An unknown GEOGRAPHIC GeoKeys code (NAD83) falls back to the
        geographic default; an unknown PROJECTED code still errors."""
        from dggsray.core.tiffio import GeoTiff, write_geotiff
        from dggsray.ops.warp import raster_to_rhealpix
        arr = np.full((1, 6, 8), 5, dtype=np.float64)
        nad = str(tmp_path / "nad83.tif")
        write_geotiff(nad, GeoTiff(arr, left=-4.0, top=41.0, res_x=0.05,
                                   res_y=0.05, nodata=0.0,
                                   tags={"geokeys": {2048: 4269}}))
        out = str(tmp_path / "o.tif")
        raster_to_rhealpix(nad, out, input_crs="auto")
        assert os.path.exists(out)          # warped under the geographic default
        lcc = str(tmp_path / "l93.tif")
        write_geotiff(lcc, GeoTiff(arr, left=650000.0, top=6860000.0,
                                   res_x=100.0, res_y=100.0, nodata=0.0,
                                   tags={"geokeys": {3072: 2154}}))
        with pytest.raises(ValueError, match="2154"):
            raster_to_rhealpix(lcc, str(tmp_path / "o2.tif"), input_crs="auto")

    def test_etrs89_utm_geokey(self):
        from dggsray.core.tiffio import epsg_from_geokeys
        assert epsg_from_geokeys({3072: 25830}) == "utm:30N"
