"""Feather cell-table output and WKT CRS serialization."""
import numpy as np
import pyarrow as pa
import pytest


class TestFeather:
    def test_feather_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd
        from dggsray.io.storage import read_cell_table, write_cell_table

        t = pa.table({"cellid": pa.array([f"N{i % 9}" for i in range(500)]),
                      "v": pa.array(np.arange(500, dtype=np.int64))})
        ds = rd.from_arrow(t).repartition(4)
        meta = {"res_idx": 1, "nbands": 1}
        out = str(tmp_path / "ft")
        write_cell_table(ds, out, meta, fmt="feather")
        back, meta2 = read_cell_table(out)
        assert meta2 == meta
        df = back.to_pandas().sort_values(["cellid", "v"]).reset_index(drop=True)
        exp = t.to_pandas().sort_values(["cellid", "v"]).reset_index(drop=True)
        assert df.equals(exp)

    def test_feather_table_input(self, ray_session, tmp_path):
        from dggsray.io.storage import read_cell_table, write_cell_table
        t = pa.table({"cellid": pa.array(["N1", "N2"]),
                      "v": pa.array([1, 2], pa.int64())})
        out = str(tmp_path / "ft2")
        write_cell_table(t, out, {"res_idx": 1}, fmt="feather")
        back, _ = read_cell_table(out)
        assert back.count() == 2

    def test_bad_format_rejected(self, ray_session, tmp_path):
        from dggsray.io.storage import write_cell_table
        t = pa.table({"a": pa.array([1])})
        with pytest.raises(ValueError, match="unsupported format"):
            write_cell_table(t, str(tmp_path / "x"), {}, fmt="orc")


class TestWkt:
    def test_wkt_roundtrip(self):
        from dggsray.core.rhpx import GridConfig
        for ns, ss in [(1, 0), (0, 0), (2, 3)]:
            g = GridConfig(3, ns, ss)
            wkt = g.to_wkt()
            assert 'METHOD["PROJ rhealpix"]' in wkt
            assert f'PARAMETER["north_square",{ns}' in wkt
            assert f'PARAMETER["south_square",{ss}' in wkt
            g2 = GridConfig.from_wkt(wkt, n_side=3)
            assert (g2.north_square, g2.south_square) == (ns, ss)

    def test_from_wkt_rejects_other_crs(self):
        from dggsray.core.rhpx import GridConfig
        with pytest.raises(ValueError, match="rHEALPix"):
            GridConfig.from_wkt('PROJCRS["WGS 84 / UTM zone 30N"]')
