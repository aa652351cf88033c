"""Web Mercator + Lambert Conformal Conic input CRS.

Reference parity target: raster_to_rhpx.py:58-77 (arbitrary projected input
CRS via rasterio/PROJ).  Goldens: the EPSG:3857 defining constants and the
EPSG Guidance Note 7-2 worked example for Lambert Conic Conformal 2SP
(Texas South Central, NAD27 / Clarke 1866, in US survey feet).
"""
import math

import numpy as np
import pytest


class TestWebMercator:
    def test_defining_constants(self):
        from dggsray.core.conformal import webmerc_fwd
        # lon 180 at the equator -> half the EPSG:3857 world width
        x, y = webmerc_fwd(180.0, 0.0)
        assert float(x) == pytest.approx(20037508.342789244, abs=1e-6)
        assert float(y) == pytest.approx(0.0, abs=1e-9)
        # the official top latitude maps to the same ordinate (square world)
        x, y = webmerc_fwd(0.0, 85.05112877980659)
        assert float(y) == pytest.approx(20037508.342789244, abs=1e-3)

    def test_roundtrip(self):
        from dggsray.core.conformal import webmerc_fwd, webmerc_inv
        rng = np.random.default_rng(7)
        lon = rng.uniform(-179.9, 179.9, 20000)
        lat = rng.uniform(-85.0, 85.0, 20000)
        x, y = webmerc_fwd(lon, lat)
        lon2, lat2 = webmerc_inv(x, y)
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9

    def test_names(self):
        from dggsray.core.conformal import is_webmerc
        assert is_webmerc("webmerc") and is_webmerc("EPSG:3857")
        assert not is_webmerc("epsg:32630")


class TestLCC:
    def _texas(self):
        """EPSG GN7-2 example zone: Texas South Central NAD27, worked in US
        survey feet (a passed in feet so x/y come out in feet)."""
        from dggsray.core.conformal import LCCParams
        ft = 1200.0 / 3937.0                    # US survey foot in meters
        return LCCParams(
            lat1=math.radians(28 + 23 / 60.0),
            lat2=math.radians(30 + 17 / 60.0),
            lat0=math.radians(27 + 50 / 60.0),
            lon0=math.radians(-99.0),
            fe=2_000_000.0, fn=0.0,
            a=6378206.400 / ft, e2=0.00676866)

    def test_epsg_worked_example(self):
        from dggsray.core.conformal import lcc_fwd, lcc_inv
        P = self._texas()
        x, y = lcc_fwd(-96.0, 28.5, P)
        assert float(x) == pytest.approx(2963503.91, abs=0.05)
        assert float(y) == pytest.approx(254759.80, abs=0.05)
        lon, lat = lcc_inv(2963503.91, 254759.80, P)
        assert float(lon) == pytest.approx(-96.0, abs=1e-7)
        assert float(lat) == pytest.approx(28.5, abs=1e-7)

    def test_roundtrip_wgs84(self):
        from dggsray.core.conformal import lcc_fwd, lcc_inv, parse_lcc_crs
        P = parse_lcc_crs("lcc:33,45,40,-97,0,0")
        rng = np.random.default_rng(11)
        lon = rng.uniform(-125, -67, 20000)
        lat = rng.uniform(20, 60, 20000)
        x, y = lcc_fwd(lon, lat, P)
        lon2, lat2 = lcc_inv(x, y, P)
        assert np.abs(lon2 - lon).max() < 1e-9
        assert np.abs(lat2 - lat).max() < 1e-9

    def test_standard_parallels_are_true_scale(self):
        """Along a standard parallel the projected arc length must equal the
        ellipsoidal parallel arc length (conformal cone touches there)."""
        from dggsray.core.conformal import lcc_fwd, parse_lcc_crs
        P = parse_lcc_crs("lcc:33,45,40,-97")
        a, e2 = P.a, P.e2
        for sp in (33.0, 45.0):
            x1, y1 = lcc_fwd(-97.0, sp, P)
            x2, y2 = lcc_fwd(-96.0, sp, P)
            chordish = math.hypot(float(x2 - x1), float(y2 - y1))
            # radius of the parallel circle: nu cos(phi)
            s = math.sin(math.radians(sp))
            r_par = a / math.sqrt(1 - e2 * s * s) * math.cos(math.radians(sp))
            arc = r_par * math.radians(1.0)
            # 1-degree chord vs arc differ at O(theta^2) ~ 2e-5 relative
            assert chordish == pytest.approx(arc, rel=5e-5)

    def test_parse_errors(self):
        from dggsray.core.conformal import parse_lcc_crs
        with pytest.raises(ValueError):
            parse_lcc_crs("lcc:33,45,40")          # wrong arity
        with pytest.raises(ValueError):
            parse_lcc_crs("lcc:33,x,40,-97")       # non-numeric
        with pytest.raises(ValueError):
            parse_lcc_crs("lcc:30,-30,0,0")        # symmetric parallels
        with pytest.raises(ValueError):
            parse_lcc_crs("utm:30N")


class TestConformalWarp:
    def _fixture(self, path, fwd, lon0, lat0, px, W=48, H=32):
        from dggsray.core.tiffio import GeoTiff, write_geotiff
        e0, n0 = fwd(np.array([lon0]), np.array([lat0]))
        left = math.floor(float(e0) / px) * px
        top = math.ceil(float(n0) / px) * px
        data = (np.arange(H * W, dtype=np.int32).reshape(1, H, W) % 251) + 1
        write_geotiff(path, GeoTiff(data, left, top, px, px, nodata=0))
        return left, top, data

    def _check_lattice(self, out_path, crs_fwd, left, top, data, px):
        """Every output cell center must carry the source pixel its center
        maps to under the independently validated projection chain."""
        from dggsray.core.rhpx import DEFAULT_GRID, project_inv
        from dggsray.core.tiffio import read_geotiff
        g = read_geotiff(out_path)
        H, W = data.shape[1], data.shape[2]
        jj, ii = np.meshgrid(np.arange(g.data.shape[2]),
                             np.arange(g.data.shape[1]))
        xs = g.left + (jj.ravel() + 0.5) * g.res_x
        ys = g.top - (ii.ravel() + 0.5) * g.res_y
        lon, lat = project_inv(xs, ys, DEFAULT_GRID)
        sx, sy = crs_fwd(lon, lat)
        fc = np.floor((sx - left) / px).astype(np.int64)
        fr = np.floor((top - sy) / px).astype(np.int64)
        ins = (fc >= 0) & (fc < W) & (fr >= 0) & (fr < H)
        got = g.data[0].ravel()
        want = np.where(ins, data[0][np.clip(fr, 0, H - 1),
                                     np.clip(fc, 0, W - 1)], 0)
        assert (got == want).all()
        assert ins.sum() > 0.5 * ins.size

    def test_webmerc_warp_golden_lattice(self, tmp_path):
        from dggsray.core.conformal import webmerc_fwd
        from dggsray.ops.warp import raster_to_rhealpix
        src = str(tmp_path / "wm.tif")
        out = str(tmp_path / "wm_rhpx.tif")
        left, top, data = self._fixture(src, webmerc_fwd, -3.4, 40.0, 150.0)
        raster_to_rhealpix(src, out, input_crs="webmerc")
        self._check_lattice(out, webmerc_fwd, left, top, data, 150.0)

    def test_lcc_warp_golden_lattice(self, tmp_path):
        from dggsray.core.conformal import lcc_fwd, parse_lcc_crs
        from dggsray.ops.warp import raster_to_rhealpix
        crs = "lcc:33,45,40,-97"
        P = parse_lcc_crs(crs)
        fwd = lambda lon, lat: lcc_fwd(lon, lat, P)
        src = str(tmp_path / "lcc.tif")
        out = str(tmp_path / "lcc_rhpx.tif")
        left, top, data = self._fixture(src, fwd, -97.3, 38.6, 120.0)
        raster_to_rhealpix(src, out, input_crs=crs)
        self._check_lattice(out, fwd, left, top, data, 120.0)

    def test_reproject_raster_webmerc_roundtrip(self, tmp_path):
        """geographic -> webmerc -> geographic keeps values (nearest on a
        modestly oversampled grid)."""
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.ops.warp import reproject_raster
        src = str(tmp_path / "geo.tif")
        mid = str(tmp_path / "wm.tif")
        back = str(tmp_path / "geo2.tif")
        # near the equator so the Mercator y-stretch ~ 1 and the suggested
        # square-pixel output preserves the source resolution in both axes
        data = (np.arange(40 * 60, dtype=np.int32).reshape(1, 40, 60)
                % 97) + 1
        write_geotiff(src, GeoTiff(data, -4.0, 2.0, 0.01, 0.01, nodata=0))
        reproject_raster(src, mid, dst_crs="webmerc", input_crs="geographic")
        m = read_geotiff(mid)
        assert m.data.shape[1] >= 40 and m.data.shape[2] >= 60
        reproject_raster(mid, back, dst_crs="geographic")   # auto-detect tag
        b = read_geotiff(back)
        # interior agreement: compare at source pixel centers
        jj, ii = np.meshgrid(np.arange(60), np.arange(40))
        xs = -4.0 + (jj.ravel() + 0.5) * 0.01
        ys = 2.0 - (ii.ravel() + 0.5) * 0.01
        fc = np.floor((xs - b.left) / b.res_x).astype(np.int64)
        fr = np.floor((b.top - ys) / b.res_y).astype(np.int64)
        ok = (fc >= 0) & (fc < b.data.shape[2]) \
            & (fr >= 0) & (fr < b.data.shape[1])
        got = b.data[0][fr[ok], fc[ok]]
        want = data[0].ravel()[ok]
        frac = (got == want).mean()
        assert frac > 0.95          # nearest-resampling seam pixels only
