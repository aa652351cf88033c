"""CLI end-to-end: the seven commands chained on synthetic inputs, exit code 0 and
"OK" on stdout (the reference's script-test contract,
tests/script_tests/tests_rhpx_scripts.py:51-95), plus roundtrip bit-equality."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args):
    out = subprocess.run([sys.executable, "-m", "dggsray", *args],
                         capture_output=True, text=True, cwd=REPO, timeout=300)
    return out.returncode, out.stdout


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    from dggsray.core.tiffio import GeoTiff, write_geotiff
    H, W = 60, 80
    data = (np.add.outer(np.arange(H), np.arange(W)) % 97).astype(np.int16)[None]
    tif = str(d / "geo.tif")
    write_geotiff(tif, GeoTiff(data, left=-4.0, top=41.0, res_x=0.02,
                               res_y=0.02, nodata=-1))
    feats = []
    for lon, lat, he, cls in [(-3.5, 40.5, 0.4, "a"), (-3.0, 40.2, 0.3, "b")]:
        ring = [[lon - he, lat - he], [lon + he, lat - he],
                [lon + he, lat + he], [lon - he, lat + he], [lon - he, lat - he]]
        feats.append({"type": "Feature", "properties": {"class": cls},
                      "geometry": {"type": "Polygon", "coordinates": [ring]}})
    gj = str(d / "polys.geojson")
    json.dump({"type": "FeatureCollection", "features": feats}, open(gj, "w"))
    return {"dir": d, "tif": tif, "geojson": gj}


class TestCli:
    def test_netcdf4_input(self, inputs, tmp_path):
        """A NetCDF-4 (HDF5) raster goes through the same CLI command a
        GeoTIFF does — the user-facing closure of the hdf5io reader."""
        from dggsray.core.hdf5io import write_netcdf4
        ny, nx = 24, 31
        lat = np.linspace(41.0, 40.0, ny)
        lon = np.linspace(-4.0, -3.0, nx)
        data = (np.add.outer(np.arange(ny), np.arange(nx)) % 53) \
            .astype(np.int16)
        nc = str(tmp_path / "h.nc")
        write_netcdf4(nc, {"v": (data, ("lat", "lon"), {}),
                           "lat": (lat, ("lat",), {}),
                           "lon": (lon, ("lon",), {})},
                      dims={"lat": ny, "lon": nx})
        out_tif = str(tmp_path / "h_rhpx.tif")
        rc, out = run_cli("ras-to-rhpx-ras", nc, out_tif)
        assert rc == 0 and "OK" in out
        from dggsray.core.tiffio import read_geotiff
        g = read_geotiff(out_tif)
        assert g.data.size > 0

    def test_full_chain(self, inputs):
        d = inputs["dir"]
        rc, out = run_cli("ras-to-rhpx-ras", inputs["tif"], str(d / "r.tif"))
        assert rc == 0 and "OK" in out and "dst_resolution_idx" in out

        rc, out = run_cli("print-ras-rhpx-metadata", str(d / "r.tif"))
        assert rc == 0 and "'res_idx'" in out and "'n_side': 3" in out

        rc, out = run_cli("ras-rhpx-to-vec-rhpx", str(d / "r.tif"),
                          str(d / "cells"))
        assert rc == 0 and "OK" in out
        assert os.path.exists(d / "cells" / "_meta.json")

        rc, out = run_cli("print-vec-rhpx-metadata", str(d / "cells"))
        assert rc == 0 and "'res_idx'" in out

        rc, out = run_cli("vec-rhpx-to-ras-rhpx", str(d / "cells"),
                          str(d / "back.tif"), "--nodata", "-1")
        assert rc == 0 and "OK" in out
        from dggsray.core.tiffio import read_geotiff
        a = read_geotiff(str(d / "r.tif"))
        b = read_geotiff(str(d / "back.tif"))
        assert np.array_equal(a.data, b.data)       # zero-RMSE roundtrip

        rc, out = run_cli("vec-to-rhpx-ras", inputs["geojson"],
                          str(d / "v.tif"), "--property-for-class", "class",
                          "--dst-resolution-idx", "7")
        assert rc == 0 and "OK" in out

        rc, out = run_cli("vec-ras-area-error", inputs["geojson"],
                          str(d / "v.tif"), "--property-for-class", "class")
        assert rc == 0 and "RMSE:" in out and "BIAS:" in out

    def test_non_rhpx_metadata(self, inputs):
        # non-rHPX file => res_idx -1 and empty dggs dict (reference
        # tests_data.py:697-703)
        rc, out = run_cli("print-ras-rhpx-metadata", inputs["tif"])
        assert rc == 0 and "'res_idx': -1" in out and "'rhealpixdggs': {}" in out

    def test_bad_rdggs_rejected(self, inputs):
        rc, out = run_cli("ras-to-rhpx-ras", inputs["tif"], "/tmp/x.tif",
                          "--rdggs", "5/0/0")
        assert rc != 0


class TestRdggsGridPassthrough:
    def test_composites_honor_cap_squares(self, inputs):
        """--rdggs 3/2/1 must reach the storage composites: a raster inside
        the north cap square of GridConfig(3,2,1) converts and roundtrips on
        THAT grid (regression: the CLI used to pass only n_side, so cap
        squares silently fell back to 3/1/0)."""
        d = inputs["dir"]
        from dggsray.core.rhpx import GridConfig, align_point
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        grid = GridConfig(3, 2, 1)
        F = grid.cell_width(0)
        w = grid.cell_width(2)
        # center of the ns=2 north square: x in [0, F], y in [F/2, 3F/2]
        left, top = align_point(F / 2, F, 2, grid)
        arr = (np.arange(12, dtype=np.int32).reshape(3, 4) + 1)[None]
        tif = str(d / "g321.tif")
        write_geotiff(tif, GeoTiff(arr, left, top, w, w, nodata=0))
        rc, out = run_cli("ras-rhpx-to-vec-rhpx", tif, str(d / "c321"),
                          "--rdggs", "3/2/1")
        assert rc == 0 and "OK" in out
        meta = json.load(open(d / "c321" / "_meta.json"))["attrs"]
        assert meta["rhealpixdggs"]["north_square"] == 2
        assert meta["rhealpixdggs"]["south_square"] == 1
        rc, out = run_cli("vec-rhpx-to-ras-rhpx", str(d / "c321"),
                          str(d / "b321.tif"), "--rdggs", "3/2/1")
        assert rc == 0 and "OK" in out
        assert np.array_equal(read_geotiff(str(d / "b321.tif")).data, arr)


class TestCorpusDedupCommand:
    def test_end_to_end(self, ray_session, tmp_path, capsys):
        """corpus-dedup writes the kept corpus + stats, prints OK, and the
        numbers reconcile with the library pipeline."""
        import json as _json

        from dggsray.cli import main
        out = str(tmp_path / "dd")
        rc = main(["corpus-dedup", "/root/testdata/sf0.001", out])
        assert rc == 0
        text = capsys.readouterr().out
        assert "OK" in text
        stats = _json.load(open(f"{out}/stats.json"))
        assert stats["n_docs"] == 500
        assert stats["n_kept"] + stats["n_dropped"] == 500
        assert stats["n_dropped"] > 0
        import pyarrow.dataset as pads
        kept = pads.dataset(f"{out}/kept").to_table()
        assert kept.num_rows == stats["n_kept"]
        assert len(set(kept.column("doc_id").to_pylist())) == kept.num_rows
