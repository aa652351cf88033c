"""SQL-database sink/source (reference geodataframe_to_postgis parity,
storage.py:17-29, on stdlib sqlite3 — no network in this sandbox)."""
import numpy as np
import pyarrow as pa
import pytest


def _tbl(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table({
        "cellid": pa.array([f"N{i%9}{i%3}" for i in range(n)]),
        "value": pa.array(rng.integers(0, 100, n), pa.int64()),
        "weight": pa.array(rng.random(n)),
        "blob": pa.array([bytes([i % 251]) * 3 for i in range(n)],
                         pa.binary()),
        "tags": pa.array([[i, i + 1] for i in range(n)],
                         pa.list_(pa.int64())),
    })


class TestSqlDb:
    def test_roundtrip_dataset(self, ray_session, tmp_path):
        import ray.data as rd
        from dggsray.io.sqldb import dataset_to_sqldb, sqldb_to_dataset
        db = str(tmp_path / "t.db")
        t = _tbl()
        ds = rd.from_arrow(t)
        n = dataset_to_sqldb(ds, db, "cells", chunksize=128)
        assert n == 1000
        back = sqldb_to_dataset(db, "cells", block_rows=256).take_all()
        assert len(back) == 1000
        got = sorted((r["cellid"], r["value"]) for r in back)
        want = sorted(zip(t.column("cellid").to_pylist(),
                          t.column("value").to_pylist()))
        assert got == want
        # floats and blobs survive exactly
        by_id = {r["cellid"] + str(r["value"]): r for r in back}
        k = t.column("cellid")[0].as_py() + str(t.column("value")[0].as_py())
        assert by_id[k]["blob"] == t.column("blob")[0].as_py()
        # list columns ride along as JSON text
        import json
        assert json.loads(by_id[k]["tags"]) == t.column("tags")[0].as_py()

    def test_if_exists_contract(self, tmp_path):
        from dggsray.io.sqldb import dataset_to_sqldb, sqldb_to_dataset
        db = str(tmp_path / "t.db")
        t = _tbl(10)
        dataset_to_sqldb(t, db, "x")
        with pytest.raises(ValueError, match="already exists"):
            dataset_to_sqldb(t, db, "x")            # fail (default)
        dataset_to_sqldb(t, db, "x", if_exists="append")
        assert sqldb_to_dataset(db, "x").count() == 20
        dataset_to_sqldb(t, db, "x", if_exists="replace")
        assert sqldb_to_dataset(db, "x").count() == 10
        with pytest.raises(ValueError, match="fail|replace|append"):
            dataset_to_sqldb(t, db, "x", if_exists="upsert")

    def test_metadata_side_table(self, tmp_path):
        from dggsray.io.sqldb import (dataset_to_sqldb, read_sqldb_metadata)
        db = str(tmp_path / "t.db")
        meta = {"n_side": 3, "res_idx": 8, "crs": "rhealpix",
                "nodata": None}
        dataset_to_sqldb(_tbl(5), db, "cells", metadata=meta)
        assert read_sqldb_metadata(db, "cells") == meta
        assert read_sqldb_metadata(db, "nope") == {}

    def test_sql_queryable(self, tmp_path):
        """The point of the sink: the table is plain SQL afterwards."""
        import sqlite3
        from dggsray.io.sqldb import dataset_to_sqldb
        db = str(tmp_path / "t.db")
        t = _tbl(100)
        dataset_to_sqldb(t, db, "cells")
        con = sqlite3.connect(db)
        n, s = con.execute(
            "SELECT COUNT(*), SUM(value) FROM cells WHERE value >= 50"
        ).fetchone()
        vals = t.column("value").to_numpy()
        assert n == int((vals >= 50).sum()) and s == int(vals[vals >= 50].sum())
        con.close()

    def test_append_binds_by_name_not_position(self, tmp_path):
        import sqlite3
        from dggsray.io.sqldb import dataset_to_sqldb
        db = str(tmp_path / "t.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE x (b INTEGER, a INTEGER)")  # reversed order
        con.commit(); con.close()
        t = pa.table({"a": pa.array([1, 2], pa.int64()),
                      "b": pa.array([10, 20], pa.int64())})
        dataset_to_sqldb(t, db, "x", if_exists="append")
        con = sqlite3.connect(db)
        assert con.execute("SELECT a, b FROM x ORDER BY a").fetchall() \
            == [(1, 10), (2, 20)]
        con.close()

    def test_all_null_page_keeps_declared_type(self, ray_session, tmp_path):
        from dggsray.io.sqldb import dataset_to_sqldb, sqldb_to_dataset
        db = str(tmp_path / "t.db")
        t = pa.table({"k": pa.array(range(300), pa.int64()),
                      "v": pa.array([None] * 300, pa.float64())})
        dataset_to_sqldb(t, db, "x")
        ds = sqldb_to_dataset(db, "x", block_rows=100)
        sch = ds.schema()
        sch = getattr(sch, "base_schema", sch)
        assert sch.field("v").type == pa.float64()
        assert ds.count() == 300
