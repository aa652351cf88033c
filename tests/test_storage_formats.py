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


class TestLZW:
    def test_codec_roundtrip(self):
        rng = np.random.default_rng(3)
        cases = [b"", b"A", b"TOBEORNOTTOBEORTOBEORNOT" * 10,
                 rng.integers(0, 256, 100000, dtype=np.uint8).tobytes(),
                 (b"\x00" * 5000 + b"\x01\x02" * 3000) * 4,
                 bytes(range(256)) * 40]
        from dggsray.core.tiffio import _lzw_decode, _lzw_encode
        for data in cases:       # random data forces width bumps + table reset
            assert _lzw_decode(_lzw_encode(data)) == data

    def test_geotiff_lzw_roundtrip(self, tmp_path):
        from dggsray.core.tiffio import GeoTiff, read_geotiff, write_geotiff
        rng = np.random.default_rng(5)
        arr = rng.integers(0, 1000, (2, 37, 53)).astype(np.int16)
        p = str(tmp_path / "z.tif")
        write_geotiff(p, GeoTiff(arr, -10.0, 50.0, 0.1, 0.1, nodata=7),
                      compress="lzw")
        r = read_geotiff(p)
        assert (r.data == arr).all()
        assert r.nodata == 7

    def test_lzw_predictor2(self, tmp_path):
        """Hand-built minimal TIFF: LZW strips of horizontally-differenced
        uint8 rows + Predictor=2 tag -> read_geotiff must reconstruct."""
        import struct
        from dggsray.core.tiffio import _lzw_encode, read_geotiff
        rng = np.random.default_rng(9)
        a = rng.integers(0, 255, (4, 6), dtype=np.uint8)
        diff = a.astype(np.int16)
        diff[:, 1:] -= a.astype(np.int16)[:, :-1]
        payload = _lzw_encode((diff % 256).astype(np.uint8).tobytes())
        entries = [(256, 3, 1, 6), (257, 3, 1, 4), (258, 3, 1, 8),
                   (259, 3, 1, 5), (262, 3, 1, 1), (273, 4, 1, 0),
                   (277, 3, 1, 1), (278, 3, 1, 4),
                   (279, 4, 1, len(payload)), (317, 3, 1, 2)]
        ifd_off = 8
        data_off = ifd_off + 2 + len(entries) * 12 + 4
        buf = b"II*\x00" + struct.pack("<I", ifd_off)
        buf += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            if tag == 273:
                val = data_off
            buf += struct.pack("<HHI", tag, typ, cnt)
            buf += struct.pack("<I", val) if typ == 4 \
                else struct.pack("<HH", val, 0)
        buf += struct.pack("<I", 0) + payload
        p = str(tmp_path / "pred.tif")
        open(p, "wb").write(buf)
        r = read_geotiff(p)
        assert (r.data[0] == a).all()


class TestFilesystemSeamParquet:
    def test_cell_table_and_query_reads_localize(self, ray_session, tmp_path):
        """The register_filesystem seam covers parquet reads too: a
        scheme-qualified cell-table directory and a scheme-qualified sf_dir
        both resolve through the registered fetcher (remote cell tables and
        image tables share the raster seam)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from dggsray.core import raster as R
        from dggsray.io.storage import (get_parquet_rhpx_metadata,
                                        read_cell_table, write_cell_table)
        from dggsray.pipelines import relational

        cells = rd.from_arrow(pa.table({
            "cellid": pa.array(["N0", "N1"]),
            "value": pa.array([1.5, 2.5])}))
        tbl_dir = str(tmp_path / "cells")
        write_cell_table(cells, tbl_dir, {"n_side": 3})
        sf_dir = tmp_path / "sf"
        sf_dir.mkdir()
        pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                                 "text": pa.array(["a b", "c d"])}),
                       str(sf_dir / "documents.parquet"))
        calls = []

        def fetch(url):
            calls.append(url)
            return url.split("://", 1)[1]

        R.register_filesystem("mem", fetch)
        try:
            ds, meta = read_cell_table(f"mem://{tbl_dir}")
            assert meta["n_side"] == 3
            assert sorted(r["cellid"] for r in ds.take_all()) == ["N0", "N1"]
            assert get_parquet_rhpx_metadata(f"mem://{tbl_dir}") \
                == {"n_side": 3}
            out = relational._read(f"mem://{sf_dir}", "documents").take_all()
            assert len(out) == 2
            assert any(u.startswith("mem://") for u in calls)
        finally:
            R._FILESYSTEMS.pop("mem", None)
