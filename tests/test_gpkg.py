"""Real GeoPackage backend (stdlib sqlite3 + hand-built GP/WKB binary):
write/read roundtrip with the reference's metadata scheme, raster composite
roundtrip, and reading the reference's own NYC fixture."""
import os
import sqlite3

import numpy as np
import pyarrow as pa
import pytest

NYC = "/root/reference/tests/test_data/NYC_Noise_Part_UTM_18N_WGS84.gpkg"


class TestRoundtrip:
    def test_write_read_with_metadata(self, ray_session, tmp_path):
        from dggsray.io.gpkg import (get_gpkg_rhpx_metadata, read_geopackage,
                                     write_geopackage)
        t = pa.table({"cellid": pa.array(["N0", "N1", "N24", "S3"]),
                      "band1": pa.array([10, 20, 30, 40], pa.int64())})
        meta = {"rhealpixdggs": {"n_side": 3, "north_square": 1,
                                 "south_square": 0}, "nbands": 1}
        p = str(tmp_path / "cells.gpkg")
        assert write_geopackage(t, p, meta) == 4
        ds, m2 = read_geopackage(p)
        df = ds.to_pandas().sort_values("cellid").reset_index(drop=True)
        assert list(df["band1"]) == [10, 20, 30, 40]
        assert m2 == meta
        assert get_gpkg_rhpx_metadata(p) == meta
        # geometry envelopes are real planar cell squares (width = res width)
        from dggsray.core.rhpx import DEFAULT_GRID
        w = DEFAULT_GRID.cell_width(1)
        row = df[df.cellid == "N0"].iloc[0]
        assert row.geom_max_x - row.geom_min_x == pytest.approx(w)

    def test_gpkg_core_tables_standard(self, tmp_path):
        """The file carries the GPKG application_id and the spec core tables
        plus the reference's exact metadata extension rows
        (reference storage.py:53-66)."""
        from dggsray.io.gpkg import write_geopackage
        t = pa.table({"cellid": pa.array(["N0"]),
                      "v": pa.array([1], pa.int64())})
        p = str(tmp_path / "c.gpkg")
        write_geopackage(t, p, {"x": 1})
        con = sqlite3.connect(p)
        app_id = con.execute("PRAGMA application_id").fetchone()[0]
        assert app_id == 0x47504B47          # 'GPKG'
        tables = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'")}
        assert {"gpkg_spatial_ref_sys", "gpkg_contents",
                "gpkg_geometry_columns", "gpkg_metadata",
                "gpkg_extensions", "data"} <= tables
        uri = con.execute(
            "SELECT md_standard_uri FROM gpkg_metadata WHERE id=1").fetchone()[0]
        assert uri == "http://www.iaaa.es/geo2dggs/spec/1"
        ext = con.execute(
            "SELECT table_name FROM gpkg_extensions").fetchall()
        assert ("gpkg_metadata",) in ext and ("gpkg_metadata_reference",) in ext
        # the rhealpix CRS rides as WKT in gpkg_spatial_ref_sys
        wkt = con.execute(
            "SELECT definition FROM gpkg_spatial_ref_sys WHERE srs_id=100000"
        ).fetchone()[0]
        assert "rhealpix" in wkt.lower() or "healpix" in wkt.lower()
        con.close()

    def test_raster_gpkg_raster_composite(self, ray_session, tmp_path):
        """rhealpix_to_geopackage + geopackage_to_rhealpix = exact raster
        roundtrip (the reference's storage composites, storage.py:71-97)."""
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.core.rhpx import DEFAULT_GRID, align_point
        from dggsray.io.gpkg import (geopackage_to_rhealpix,
                                     rhealpix_to_geopackage)
        rng = np.random.default_rng(7)
        res = 3
        w = DEFAULT_GRID.cell_width(res)
        left, top = align_point(-1e6, 1e6, res, DEFAULT_GRID)
        arr = rng.integers(1, 9, (1, 6, 7)).astype(np.int32)
        src = str(tmp_path / "src.tif")
        write_geotiff(src, GeoTiff(arr, left, top, w, w, nodata=0,
                                   tags={"GDAL_METADATA":
                                         '<GDALMetadata><Item name="n_side">3'
                                         '</Item></GDALMetadata>'}))
        gp = str(tmp_path / "cells.gpkg")
        rhealpix_to_geopackage(src, gp)
        back = str(tmp_path / "back.tif")
        geopackage_to_rhealpix(gp, back)
        g2 = read_geotiff(back)
        assert (g2.data == arr).all()
        assert g2.left == pytest.approx(left)
        assert g2.res_x == pytest.approx(w)


@pytest.mark.skipif(not os.path.exists(NYC), reason="reference fixture absent")
def test_read_reference_nyc_fixture(ray_session):
    """The reference's own GPKG (written by GDAL) reads with attributes and
    per-feature geometry envelopes."""
    from dggsray.io.gpkg import read_geopackage
    ds, _meta = read_geopackage(NYC)
    df = ds.to_pandas()
    assert len(df) == 23432
    assert {"lat", "lng", "geom_min_x", "geom_min_y"} <= set(df.columns)
    # NYC in UTM 18N: eastings ~500-600 km, northings ~4.49-4.53 Mm
    assert df.geom_min_x.between(500_000, 620_000).all()
    assert df.geom_min_y.between(4_480_000, 4_540_000).all()
    assert df.lat.between(40.4, 41.0).all()


def test_read_geopackage_features_and_burn(ray_session, tmp_path):
    """A WGS84 polygon layer (built with the module's own GP/WKB encoders)
    loads as engine features and burns to cells — the reference's gpkg vector
    input path (geopandas.read_file + vector_to_rhealpix)."""
    import struct

    from dggsray.io.gpkg import _gp_header, _wkb_polygon, \
        read_geopackage_features
    from dggsray.ops.vector2dggs import burn_polygons_to_cells

    p = str(tmp_path / "poly.gpkg")
    con = sqlite3.connect(p)
    con.execute("PRAGMA application_id = 1196444487")
    con.execute("CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT, srs_id "
                "INTEGER PRIMARY KEY, organization TEXT, "
                "organization_coordsys_id INTEGER, definition TEXT, "
                "description TEXT)")
    con.execute("INSERT INTO gpkg_spatial_ref_sys VALUES ('WGS 84', 4326, "
                "'EPSG', 4326, 'GEOGCS[\"WGS 84\"]', NULL)")
    con.execute("CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, "
                "data_type TEXT, identifier TEXT, srs_id INTEGER)")
    con.execute("INSERT INTO gpkg_contents VALUES ('zones', 'features', "
                "'zones', 4326)")
    con.execute("CREATE TABLE gpkg_geometry_columns (table_name TEXT, "
                "column_name TEXT, geometry_type_name TEXT, srs_id INTEGER, "
                "z TINYINT, m TINYINT)")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('zones', 'geom', "
                "'POLYGON', 4326, 0, 0)")
    con.execute("CREATE TABLE zones (fid INTEGER PRIMARY KEY, geom BLOB, "
                "kind TEXT)")
    # a ~4x4-degree square over the equator
    xs = np.array([0.0, 4.0, 4.0, 0.0, 0.0])
    ys = np.array([0.0, 0.0, 4.0, 4.0, 0.0])
    blob = _gp_header(4326, 0, 4, 0, 4) + _wkb_polygon(xs, ys)
    con.execute("INSERT INTO zones (geom, kind) VALUES (?, 'farm')", (blob,))
    con.commit()
    con.close()

    feats = read_geopackage_features(p, property_for_class="kind")
    assert len(feats) == 1 and feats[0]["value"] == 1
    cells = burn_polygons_to_cells(feats, 4)
    assert cells.num_rows > 10            # the square covers many res-4 cells


class TestEwkbFlags:
    """EWKB type words carry dimension flags in the high bits (spatialite /
    ogr2ogr output); the flags must be masked before the base-type math."""

    def _ewkb_z_polygon(self, with_srid=False):
        import struct
        typ = 0x80000003 | (0x20000000 if with_srid else 0)
        b = b"\x01" + struct.pack("<I", typ)
        if with_srid:
            b += struct.pack("<I", 4326)
        b += struct.pack("<I", 1)                       # 1 ring
        pts = [(0.0, 0.0, 5.0), (4.0, 0.0, 5.0), (4.0, 3.0, 5.0),
               (0.0, 0.0, 5.0)]
        b += struct.pack("<I", len(pts))
        for x, y, z in pts:
            b += struct.pack("<3d", x, y, z)
        return b

    def test_envelope_rings_length(self):
        from dggsray.io.gpkg import _wkb_envelope, _wkb_length, _wkb_rings
        for srid in (False, True):
            wkb = self._ewkb_z_polygon(with_srid=srid)
            assert _wkb_envelope(wkb) == (0.0, 4.0, 0.0, 3.0)
            assert _wkb_length(wkb) == len(wkb)
            rings = _wkb_rings(wkb)
            assert len(rings) == 1 and rings[0].shape == (4, 2)
            assert rings[0][1].tolist() == [4.0, 0.0]


class TestRenamedCellColumnRoundtrip:
    def test_geo_id_column_name_recorded_in_metadata(self, ray_session, tmp_path):
        """rhealpix_to_geopackage(geo_id_column_name=...) must record the
        rename in the GPKG metadata so the metadata-driven read side (the CLI
        path, which passes no column name) still resolves the cell column
        (regression: only the parquet composite recorded it)."""
        from dggsray.core.rhpx import DEFAULT_GRID, align_point
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        from dggsray.io.gpkg import (geopackage_to_rhealpix,
                                     get_gpkg_rhpx_metadata,
                                     rhealpix_to_geopackage)
        rng = np.random.default_rng(13)
        res = 3
        w = DEFAULT_GRID.cell_width(res)
        left, top = align_point(-1e6, 1e6, res, DEFAULT_GRID)
        arr = rng.integers(1, 9, (1, 4, 5)).astype(np.int32)
        src = str(tmp_path / "src.tif")
        write_geotiff(src, GeoTiff(arr, left, top, w, w, nodata=0))
        gp = str(tmp_path / "cells.gpkg")
        rhealpix_to_geopackage(src, gp, geo_id_column_name="cell_code")
        assert get_gpkg_rhpx_metadata(gp)["geo_id_column_name"] == "cell_code"
        back = str(tmp_path / "back.tif")
        geopackage_to_rhealpix(gp, back)      # no column name: metadata-driven
        assert (read_geotiff(back).data == arr).all()
