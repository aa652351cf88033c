"""Shapefile reader against the reference's own vector fixtures (the inputs
of its vector tests and AUID benchmarks, tests_data.py:195-198,437-500)."""
import os
import subprocess
import sys

import numpy as np
import pytest

DATA = "/root/reference/tests/test_data"
ARAGON = f"{DATA}/Aragón_ETRS89_30N.shp"


@pytest.mark.skipif(not os.path.exists(ARAGON), reason="fixtures absent")
class TestFixtures:
    def test_aragon(self):
        from dggsray.io.shapefile import read_shapefile
        feats, attrs, crs = read_shapefile(ARAGON)
        assert crs == ("utm", (30, True))
        assert len(feats) == 1
        assert len(feats[0]["rings"]) == 3
        assert attrs[0]["CODIGO"] == "02"
        assert attrs[0]["TEXTO"] == "Aragón"       # UTF-8 dbf text
        r = np.vstack(feats[0]["rings"])
        # Aragón's geodetic bbox (ETRS89): lon -2.2..0.8, lat 39.8..42.9
        assert -2.2 < r[:, 0].min() < -2.1 and 0.7 < r[:, 0].max() < 0.8
        assert 39.8 < r[:, 1].min() < 39.9 and 42.9 < r[:, 1].max() < 43.0

    def test_comunidades(self):
        from dggsray.io.shapefile import read_shapefile
        feats, attrs, crs = read_shapefile(
            f"{DATA}/Comunidades_Autonomas_ETRS89_30N.shp")
        assert len(feats) == 19            # Spain's autonomous communities
        assert sum(len(f["rings"]) for f in feats) == 449
        assert attrs[0]["Texto"] == "Andalucía"

    def test_pop_agric_geographic(self):
        from dggsray.io.shapefile import read_shapefile
        feats, attrs, crs = read_shapefile(f"{DATA}/Pop_AgricRegion.shp")
        assert crs[0] == "geographic"      # no UTM in .prj
        assert len(feats) == 73
        assert attrs[0]["OBJECTID"] == 1
        assert isinstance(attrs[0]["SE_AREA_SH"], float)
        r = feats[0]["rings"][0]
        assert 25 < r[:, 0].min() < 31     # southern Africa lon range

    def test_cli_burn_aragon(self, tmp_path):
        """vec-to-rhpx-ras straight from the .shp with a class property —
        mirrors the reference's Aragón vector test inputs."""
        out = str(tmp_path / "aragon.tif")
        res = subprocess.run(
            [sys.executable, "-m", "dggsray", "vec-to-rhpx-ras", ARAGON, out,
             "--dst-resolution-idx", "6", "--property-for-class", "CODIGO"],
            capture_output=True, text=True, cwd="/root/repo", timeout=300)
        assert "OK" in res.stdout, res.stderr[-800:]
        from dggsray.core.tiffio import read_geotiff
        g = read_geotiff(out)
        burned = (g.data[0] != 0).sum()
        assert 250 < burned < 350          # ~296 res-6 cells cover Aragón


@pytest.mark.skipif(not os.path.exists(ARAGON), reason="fixtures absent")
def test_aragon_auid_roundtrip(ray_session, tmp_path):
    """The reference's AUID-for-Aragón benchmark shape (tests_data.py:437-468):
    burn the shapefile at res 6 with CODIGO ('02' -> int 2, the reference's
    try-int-first class mapping), take band1==2 cells, generate the AUID and
    recover the identical sorted CUID set."""
    from dggsray.cli import _load_geojson_features
    from dggsray.core.auid import AUIDGenerator
    from dggsray.ops.vector2dggs import burn_polygons_to_cells

    feats = _load_geojson_features(ARAGON, "CODIGO", 1)
    assert feats[0]["value"] == 2          # int('02'), not first-seen 1
    cells = burn_polygons_to_cells(feats, 6)
    cellids = cells.column("cellid").to_pylist()
    vals = cells.column("value").to_pylist()
    cuids = sorted(c for c, v in zip(cellids, vals) if v == 2)
    assert len(cuids) > 200
    gen = AUIDGenerator()
    auid_b64, _h = gen.generate_auid_hash_b64(cuids)
    back = gen.cuids_from_auid_b64(auid_b64)
    assert sorted(back) == back            # reference's own assertion
    assert back == cuids


class TestDeletedDbfRows:
    def test_deleted_row_drops_whole_feature(self, tmp_path):
        """A soft-deleted .dbf row (0x2A flag) must remove geometry AND
        attributes together — not shift every later feature's attributes."""
        import struct
        import numpy as np
        base = str(tmp_path / "del")
        # .shp: 3 point records
        pts = [(0.0, 0.0), (1.0, 1.0), (2.0, 2.0)]
        rec = b""
        for i, (x, y) in enumerate(pts):
            content = struct.pack("<i2d", 1, x, y)
            rec += struct.pack(">ii", i + 1, len(content) // 2) + content
        filelen = (100 + len(rec)) // 2
        hdr = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, filelen)
        hdr += struct.pack("<ii", 1000, 1)
        hdr += struct.pack("<8d", 0, 0, 2, 2, 0, 0, 0, 0)
        open(base + ".shp", "wb").write(hdr + rec)
        # .dbf: 3 rows, middle one deleted
        nfields = 1
        hdrlen = 32 + nfields * 32 + 1
        reclen = 1 + 8
        d = struct.pack("<B3BIHH20x", 3, 24, 1, 1, 3, hdrlen, reclen)
        d += b"CLS".ljust(11, b"\x00") + b"N" + b"\x00" * 4 + bytes([8, 0]) \
            + b"\x00" * 14
        d += b"\x0d"
        for i, flag in [(7, 0x20), (8, 0x2A), (9, 0x20)]:
            d += bytes([flag]) + str(i).rjust(8).encode()
        open(base + ".dbf", "wb").write(d)
        from dggsray.io.shapefile import read_dbf, read_shapefile
        attrs_raw = read_dbf(base + ".dbf")
        assert attrs_raw[1] is None and len(attrs_raw) == 3
        feats, attrs, _crs = read_shapefile(base + ".shp", to_lonlat=False)
        assert len(feats) == 2 and len(attrs) == 2
        assert [a["CLS"] for a in attrs] == [7, 9]
        assert feats[1]["coords"][0].tolist() == [2.0, 2.0]
