"""NetCDF classic (CDF-1) reader against the reference's real fixture
(c_gls_SCE500_*, the file its NetCDF raster tests convert at
/root/reference/tests/data_tests/tests_data.py:154,185,329) plus a
synthetic writer-side roundtrip for record variables and CDF-2."""
import os
import struct

import numpy as np
import pytest

from dggsray.core.netcdfio import NetCDFClassic, read_netcdf_raster
from dggsray.core.raster import open_raster, parse_raster_path, \
    raster_subdatasets

FIX = "/root/reference/tests/test_data/c_gls_SCE500_202112070000_CEURO_MODIS_V1.0.1.nc"


def _write_classic(path, version=1):
    """Hand-build a tiny CDF file from the spec: dims (t unlimited, y=2, x=3),
    fixed var 'grid' (y,x) int16 with _FillValue, record var 'tv' (t,y) f32."""
    def pad(b):
        return b + b"\x00" * (-len(b) % 4)

    def name(s):
        return struct.pack(">I", len(s)) + pad(s.encode())

    hdr = b"CDF" + bytes([version])
    hdr += struct.pack(">I", 2)                      # numrecs = 2
    hdr += struct.pack(">II", 0x0A, 3)               # dim list
    hdr += name("t") + struct.pack(">I", 0)          # unlimited
    hdr += name("y") + struct.pack(">I", 2)
    hdr += name("x") + struct.pack(">I", 3)
    hdr += struct.pack(">II", 0, 0)                  # no global attrs
    hdr += struct.pack(">II", 0x0B, 2)               # var list
    off = struct.pack(">Q" if version == 2 else ">I", 0)  # placeholder

    grid_var = name("grid") + struct.pack(">I", 2) + struct.pack(">II", 1, 2)
    grid_var += struct.pack(">II", 0x0C, 1)          # 1 var attr
    grid_var += name("_FillValue") + struct.pack(">II", 3, 1) \
        + pad(struct.pack(">h", -9))
    grid_var += struct.pack(">II", 3, 12)            # NC_SHORT, vsize 12
    tv_var = name("tv") + struct.pack(">I", 2) + struct.pack(">II", 0, 1)
    tv_var += struct.pack(">II", 0, 0)               # no attrs
    tv_var += struct.pack(">II", 5, 8)               # NC_FLOAT, vsize 8/rec

    base = len(hdr) + len(grid_var) + len(off) + len(tv_var) + len(off)
    grid_begin = base
    tv_begin = base + 12
    fmt = ">Q" if version == 2 else ">I"
    body = hdr + grid_var + struct.pack(fmt, grid_begin) \
        + tv_var + struct.pack(fmt, tv_begin)
    body += np.array([[1, 2, 3], [4, -9, 6]], ">i2").tobytes()
    body += np.array([1.5, 2.5], ">f4").tobytes()    # record 0
    body += np.array([3.5, 4.5], ">f4").tobytes()    # record 1
    with open(path, "wb") as f:
        f.write(body)


@pytest.mark.skipif(not os.path.exists(FIX), reason="reference fixture absent")
class TestReferenceFixture:
    def test_header(self):
        nc = NetCDFClassic(FIX)
        assert nc.dims == {"lon": 1220, "lat": 740, "time": 1}
        assert set(nc.variables) == {"time", "crs", "lat", "lon", "sce500"}
        assert nc.subdatasets() == ["sce500"]
        v = nc.variables["sce500"]
        assert v.shape == (1, 740, 1220)
        assert v.nodata == 255.0

    def test_coordinates_and_data(self):
        nc = NetCDFClassic(FIX)
        lat = nc.read("lat")
        lon = nc.read("lon")
        # CEURO 500 m grid: 0.05-deg cells, centers from the product spec;
        # lat stored ASCENDING (35.025..71.975) — the raster view flips it
        assert lat[0] == pytest.approx(35.025)
        assert lat[-1] == pytest.approx(71.975)
        assert lon[0] == pytest.approx(-10.975)
        assert np.allclose(np.diff(lon), 0.05)
        d = nc.read("sce500")
        assert d.dtype == np.dtype(">i2").newbyteorder("=")
        assert d.min() >= 100 and d.max() <= 255

    def test_raster_view(self):
        g, meta = read_netcdf_raster(FIX)
        assert g.data.shape == (1, 740, 1220)
        assert g.left == pytest.approx(-11.0)
        assert g.top == pytest.approx(72.0)
        assert g.res_x == pytest.approx(0.05)
        assert g.res_y == pytest.approx(0.05)
        assert g.nodata == 255.0
        assert meta["var_attrs"]["grid_mapping"] == "crs"

    def test_open_raster_subdataset_syntax(self):
        assert parse_raster_path(f'NETCDF:"{FIX}":sce500') == (FIX, "sce500")
        assert parse_raster_path(f"{FIX}:sce500") == (FIX, "sce500")
        assert parse_raster_path("/a/b.tif") == ("/a/b.tif", None)
        subs = raster_subdatasets(FIX)
        assert subs == [f'NETCDF:"{FIX}":sce500']
        g = open_raster(subs[0])
        assert g.data.shape == (1, 740, 1220)

    def test_netcdf_to_rhpx_raster(self, tmp_path):
        """The reference's NetCDF conversion (tests_data.py:329, res 6 there;
        res 5 here to keep the destination small) through the same
        raster_to_rhpx path every GeoTIFF takes."""
        from dggsray.core.rhpx import GridConfig
        from dggsray.core.tiffio import read_geotiff
        from dggsray.ops.warp import raster_to_rhealpix

        out = str(tmp_path / "sce500_rhpx.tif")
        res = raster_to_rhealpix(FIX, out, dst_resolution_idx=5)
        assert res == 5
        g = read_geotiff(out)
        grid = GridConfig(3, 1, 0)
        assert g.res_x == pytest.approx(grid.cell_width(5))
        data = g.data[0]
        valid = data[data != g.nodata]
        # snow-cover flags survive the warp untouched (nearest)
        assert valid.size > 1000
        assert valid.min() >= 100 and valid.max() <= 254


def test_synthetic_roundtrip_cdf1_cdf2(tmp_path):
    for ver in (1, 2):
        p = str(tmp_path / f"t{ver}.nc")
        _write_classic(p, version=ver)
        nc = NetCDFClassic(p)
        assert nc.dims == {"t": 0, "y": 2, "x": 3}
        assert nc.numrecs == 2
        g = nc.read("grid")
        assert g.tolist() == [[1, 2, 3], [4, -9, 6]]
        assert nc.variables["grid"].nodata == -9.0
        tv = nc.read("tv")
        assert tv.shape == (2, 2)
        assert tv.tolist() == [[1.5, 2.5], [3.5, 4.5]]


def _write_single_short_recvar(path):
    """Spec special case: ONE record variable of NC_SHORT (t, y=3) — records
    pack contiguously at the UNPADDED 6 bytes, though vsize rounds to 8."""
    import struct

    def pad(b):
        return b + b"\x00" * (-len(b) % 4)

    def name(s):
        return struct.pack(">I", len(s)) + pad(s.encode())

    hdr = b"CDF\x01"
    hdr += struct.pack(">I", 3)                      # numrecs = 3
    hdr += struct.pack(">II", 0x0A, 2)               # dim list
    hdr += name("t") + struct.pack(">I", 0)          # unlimited
    hdr += name("y") + struct.pack(">I", 3)
    hdr += struct.pack(">II", 0, 0)                  # no global attrs
    hdr += struct.pack(">II", 0x0B, 1)               # var list, 1 var
    sv = name("sv") + struct.pack(">I", 2) + struct.pack(">II", 0, 1)
    sv += struct.pack(">II", 0, 0)                   # no attrs
    sv += struct.pack(">II", 3, 8)                   # NC_SHORT, vsize 8 (padded)
    begin = len(hdr) + len(sv) + 4
    body = hdr + sv + struct.pack(">I", begin)
    data = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], ">i2")
    body += data.tobytes()                           # 3 recs x 6 bytes, NO pad
    with open(path, "wb") as f:
        f.write(body)
    return data.astype(np.int16)


class TestSingleRecordVarPacking:
    def test_unpadded_contiguous_records(self, tmp_path):
        p = str(tmp_path / "one_recvar.nc")
        want = _write_single_short_recvar(p)
        nc = NetCDFClassic(p)
        got = nc.read("sv")
        assert got.shape == (3, 3)
        assert (got == want).all()
