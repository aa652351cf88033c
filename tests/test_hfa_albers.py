"""ERDAS Imagine (HFA) reader + ellipsoidal Albers against the reference's
NAIP_30.img fixture (converted through GDAL at
/root/reference/tests/data_tests/tests_data.py:150,183) and Snyder's published
worked example for the projection math."""
import os

import numpy as np
import pytest

FIX = "/root/reference/tests/test_data/NAIP_30.img"


def test_albers_snyder_worked_example():
    """Snyder 1987, p. 103 (Albers ellipsoidal example): Clarke 1866,
    std parallels 29.5/45.5, origin (23, -96); point (35, -75) ->
    x = 1,885,472.7 m, y = 1,535,925.0 m."""
    from dggsray.core.albers import AlbersParams, albers_fwd, albers_inv
    P = AlbersParams(lat1=np.radians(29.5), lat2=np.radians(45.5),
                     lon0=np.radians(-96.0), lat0=np.radians(23.0),
                     a=6378206.4, e2=0.00676866)
    x, y = albers_fwd(np.array([-75.0]), np.array([35.0]), P)
    assert x[0] == pytest.approx(1885472.7, abs=0.5)
    assert y[0] == pytest.approx(1535925.0, abs=0.5)
    lon, lat = albers_inv(x, y, P)
    assert lon[0] == pytest.approx(-75.0, abs=1e-9)
    assert lat[0] == pytest.approx(35.0, abs=1e-9)


@pytest.mark.skipif(not os.path.exists(FIX), reason="reference fixture absent")
class TestNAIPFixture:
    def test_layers_and_grid(self):
        from dggsray.core.hfaio import read_img
        g, meta = read_img(FIX)
        assert g.data.shape == (4, 723, 1224)
        assert g.data.dtype == np.uint8
        assert g.nodata == 255.0
        assert meta["projection"] == "Albers_Conical_Equal_Area"
        assert meta["units"] == "meters"
        assert g.res_x == pytest.approx(119.9264705882, abs=1e-6)
        # upperLeftCenter is a pixel center -> half-pixel edge shift
        assert g.left == pytest.approx(1012035.8319862592 - g.res_x / 2)

    def test_proj_params(self):
        from dggsray.core.hfaio import read_img
        _g, meta = read_img(FIX)
        pp = meta["proj_params"]
        assert pp["name"] == "Albers Conical Equal Area"
        assert pp["number"] == 3
        assert pp["spheroid_name"] == "GRS 1980"
        a, b, e2 = pp["spheroid"]
        assert a == pytest.approx(6378137.0)
        assert e2 == pytest.approx(0.00669438, abs=1e-7)
        deg = np.degrees(pp["params"][2:6])
        assert list(np.round(deg, 4)) == [29.5, 45.5, -96.0, 23.0]

    def test_blocks_are_continuous(self):
        """Natural imagery correlates strongly across the 64-px block seams;
        a block-order bug would destroy that."""
        from dggsray.core.hfaio import read_img
        g, _ = read_img(FIX)
        d = g.data[0].astype(np.float64)
        for r in (63, 127, 191):
            if d[r].std() > 1 and d[r + 1].std() > 1:
                assert np.corrcoef(d[r], d[r + 1])[0, 1] > 0.8

    def test_open_raster_dispatch(self):
        from dggsray.core.raster import open_raster
        g = open_raster(FIX)
        assert g.data.shape == (4, 723, 1224)

    def test_naip_to_rhealpix_res7(self, tmp_path):
        """The reference's conversion (tests_data.py:150: NAIP_30.img, res 7,
        nearest) through raster_to_rhealpix with the file's own Albers CRS."""
        from dggsray.core.rhpx import GridConfig
        from dggsray.core.tiffio import read_geotiff
        from dggsray.ops.warp import raster_to_rhealpix

        out = str(tmp_path / "naip_rhpx.tif")
        res = raster_to_rhealpix(FIX, out, dst_resolution_idx=7,
                                 input_crs="auto")
        assert res == 7
        g = read_geotiff(out)
        grid = GridConfig(3, 1, 0)
        assert g.res_x == pytest.approx(grid.cell_width(7))
        assert g.data.shape[0] == 4
        valid = g.data[0][g.data[0] != g.nodata]
        assert valid.size > 100          # the clipped AOI survives the warp
        assert 50 < valid.mean() < 200   # plausible imagery, not fill

    def test_resolution_inferred_from_meters(self, tmp_path):
        """120 m Albers pixels -> closest rhealpix res (res 10 is ~114 m at
        n_side 3), exercising the projected-in-meters inference branch."""
        from dggsray.ops.warp import raster_to_rhealpix
        out = str(tmp_path / "naip_auto.tif")
        res = raster_to_rhealpix(FIX, out, input_crs="auto")
        assert res == 10
