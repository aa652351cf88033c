"""reproject_vector_file — reference vectorutils.py:42-51 parity
(geopandas read_file -> to_crs -> to_file, here via the lonlat hub and the
engine's own GPKG/GeoJSON backends)."""
import json
import os

import numpy as np
import pytest

DATA = "/root/reference/tests/test_data"
ARAGON = f"{DATA}/Aragón_ETRS89_30N.shp"


def _square_geojson(path, props=None):
    ring = [[-3.5, 40.0], [-3.0, 40.0], [-3.0, 40.5], [-3.5, 40.5],
            [-3.5, 40.0]]
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": {"type": "Polygon",
                                         "coordinates": [ring]},
         "properties": props or {"name": "sq", "code": 7}}]}
    with open(path, "w") as f:
        json.dump(fc, f)
    return np.asarray(ring)


class TestReprojectVectorFile:
    def test_geojson_to_utm_gpkg_roundtrip(self, tmp_path):
        from dggsray.core.tmerc import utm_fwd
        from dggsray.io.gpkg import read_gpkg_polygons
        from dggsray.ops.vectorwarp import reproject_vector_file

        src = str(tmp_path / "sq.geojson")
        ring = _square_geojson(src)
        dst = str(tmp_path / "sq_utm.gpkg")
        n = reproject_vector_file(src, dst, "utm:30N")
        assert n == 1

        # raw stored coordinates are true UTM meters
        import sqlite3
        con = sqlite3.connect(dst)
        wkt, = con.execute("SELECT definition FROM gpkg_spatial_ref_sys "
                           "WHERE srs_id=32630").fetchone()
        assert "UTM_Zone_30N" in wkt
        con.close()

        # reader inverts back to lonlat and keeps attributes
        feats, attrs, crs = read_gpkg_polygons(dst)
        assert crs == ("utm", (30, True))
        assert attrs[0]["name"] == "sq" and attrs[0]["code"] == 7
        got = feats[0]["rings"][0]
        exp_e, exp_n = utm_fwd(ring[:, 0], ring[:, 1], 30)
        assert np.abs(got[:, 0] - ring[:, 0]).max() < 1e-8
        assert np.abs(got[:, 1] - ring[:, 1]).max() < 1e-8
        assert exp_e.min() > 400_000            # sanity: projection really ran

    def test_geojson_to_geojson_rhealpix(self, tmp_path):
        from dggsray.core.rhpx import DEFAULT_GRID, project_fwd
        from dggsray.ops.vectorwarp import reproject_vector_file

        src = str(tmp_path / "sq.geojson")
        ring = _square_geojson(src)
        dst = str(tmp_path / "sq_rhpx.geojson")
        reproject_vector_file(src, dst, "rhealpix")
        gj = json.load(open(dst))
        assert gj["crs"]["properties"]["name"] == "rhealpix"
        got = np.asarray(gj["features"][0]["geometry"]["coordinates"][0])
        ex, ey = project_fwd(ring[:, 0], ring[:, 1], DEFAULT_GRID)
        assert np.abs(got[:, 0] - ex).max() < 1e-6
        assert np.abs(got[:, 1] - ey).max() < 1e-6
        assert gj["features"][0]["properties"]["code"] == 7

    @pytest.mark.skipif(not os.path.exists(ARAGON), reason="fixtures absent")
    def test_aragon_shp_to_geographic_gpkg(self, tmp_path):
        """The reference's canonical UTM shapefile -> WGS84 GeoPackage; bbox
        must land on Aragón's geodetic extent."""
        from dggsray.io.gpkg import read_gpkg_polygons
        from dggsray.ops.vectorwarp import reproject_vector_file

        dst = str(tmp_path / "aragon_wgs84.gpkg")
        n = reproject_vector_file(ARAGON, dst, "geographic")
        assert n == 1
        feats, attrs, crs = read_gpkg_polygons(dst)
        assert crs[0] == "geographic"
        assert attrs[0]["TEXTO"] == "Aragón"
        r = np.vstack(feats[0]["rings"])
        assert -2.2 < r[:, 0].min() < -2.1 and 0.7 < r[:, 0].max() < 0.8
        assert 39.8 < r[:, 1].min() < 39.9 and 42.9 < r[:, 1].max() < 43.0

    def test_line_and_point_geojson(self, tmp_path):
        from dggsray.io.gpkg import read_gpkg_polygons
        from dggsray.ops.vectorwarp import reproject_vector_file
        src = str(tmp_path / "mix.geojson")
        fc = {"type": "FeatureCollection", "features": [
            {"type": "Feature", "geometry": {
                "type": "LineString",
                "coordinates": [[-3.0, 40.0], [-2.5, 40.5]]},
             "properties": {"k": "line"}},
            {"type": "Feature", "geometry": {
                "type": "Point", "coordinates": [-3.0, 40.0]},
             "properties": {"k": "pt"}}]}
        json.dump(fc, open(src, "w"))
        dst = str(tmp_path / "mix.geojson")
        out = str(tmp_path / "mix_utm.geojson")
        reproject_vector_file(dst, out, "utm:30N")
        gj = json.load(open(out))
        types = {f["geometry"]["type"] for f in gj["features"]}
        assert types == {"LineString", "Point"}
        e, n = gj["features"][1]["geometry"]["coordinates"]
        assert 400_000 < e < 600_000 and 4.3e6 < n < 4.5e6

    def test_gpkg_in_gpkg_out(self, tmp_path):
        """gpkg -> utm gpkg -> geographic gpkg closes the loop."""
        from dggsray.io.gpkg import read_gpkg_polygons
        from dggsray.ops.vectorwarp import reproject_vector_file
        src = str(tmp_path / "sq.geojson")
        ring = _square_geojson(src)
        g1 = str(tmp_path / "a.gpkg")
        g2 = str(tmp_path / "b.gpkg")
        reproject_vector_file(src, g1, "utm:30N")
        reproject_vector_file(g1, g2, "geographic")
        feats, attrs, crs = read_gpkg_polygons(g2)
        assert crs[0] == "geographic"
        got = feats[0]["rings"][0]
        assert np.abs(got[:, 0] - ring[:, 0]).max() < 1e-8
        assert np.abs(got[:, 1] - ring[:, 1]).max() < 1e-8
