"""Hive-partitioned cell-table output: write_cell_table(partition_depth=N)
lays out one directory per cell-id prefix (the resumable key-range unit),
read_cell_table reassembles the identical table, finished_partitions lists
completed ranges, and a partition-pruned read touches only its directory."""
import os

import numpy as np
import pyarrow as pa


def _table(n=200, res=3):
    rng = np.random.default_rng(5)
    faces = np.array(list("NOPQRS"))[rng.integers(0, 6, n)]
    digits = rng.integers(0, 9, (n, res))
    cells = [f + "".join(map(str, d)) for f, d in zip(faces, digits)]
    return pa.table({"cellid": pa.array(cells, pa.string()),
                     "band1": pa.array(rng.integers(0, 255, n), pa.int64())})


class TestPartitionedCellTable:
    def test_roundtrip_and_layout(self, ray_session, tmp_path):
        import ray.data as rd
        from dggsray.io.storage import (finished_partitions, read_cell_table,
                                        write_cell_table)
        t = _table()
        out = str(tmp_path / "cells")
        write_cell_table(rd.from_arrow(t), out, {"res": 3},
                         partition_depth=1)
        # layout: one dir per 2-char prefix, each with parquet files
        parts = finished_partitions(out)
        expect = sorted({c[:2] for c in t.column("cellid").to_pylist()})
        assert parts == expect
        ds, meta = read_cell_table(out)
        assert meta == {"res": 3}
        got = ds.to_pandas().sort_values(["cellid", "band1"]) \
            .reset_index(drop=True)
        ref = t.to_pandas().sort_values(["cellid", "band1"]) \
            .reset_index(drop=True)
        assert set(got.columns) == {"cellid", "band1"}
        assert got.cellid.tolist() == ref.cellid.tolist()
        assert got.band1.tolist() == ref.band1.tolist()
        # every row landed in the directory matching its own prefix
        import glob
        import pyarrow.parquet as pq
        for d in glob.glob(os.path.join(out, "cell_part=*")):
            pfx = d.split("=", 1)[1]
            for f in glob.glob(os.path.join(d, "*.parquet")):
                cells = pq.read_table(f, columns=["cellid"]) \
                    .column("cellid").to_pylist()
                assert all(c.startswith(pfx) for c in cells)

    def test_pruned_read_touches_one_partition(self, ray_session, tmp_path):
        import glob

        import ray.data as rd
        import pyarrow.parquet as pq
        from dggsray.io.storage import write_cell_table
        t = _table()
        out = str(tmp_path / "cells")
        write_cell_table(rd.from_arrow(t), out, {"res": 3},
                         partition_depth=1)
        pfx = sorted({c[:2] for c in t.column("cellid").to_pylist()})[0]
        files = glob.glob(os.path.join(out, f"cell_part={pfx}", "*.parquet"))
        sub = pq.read_table(files, columns=["cellid"])
        ref = [c for c in t.column("cellid").to_pylist()
               if c.startswith(pfx)]
        assert sorted(sub.column("cellid").to_pylist()) == sorted(ref)

    def test_resume_skips_finished_ranges(self, ray_session, tmp_path):
        import ray.data as rd
        from dggsray.io.storage import (finished_partitions, read_cell_table,
                                        write_cell_table)
        t = _table()
        out = str(tmp_path / "cells")
        prefixes = sorted({c[:2] for c in t.column("cellid").to_pylist()})
        half = set(prefixes[:len(prefixes) // 2])
        # first (interrupted) run wrote only half the key ranges
        mask = pa.array([c[:2] in half
                         for c in t.column("cellid").to_pylist()])
        write_cell_table(rd.from_arrow(t.filter(mask)), out, {"res": 3},
                         partition_depth=1)
        done = set(finished_partitions(out))
        assert done == half
        # resume: write only rows whose range is not finished
        rest = pa.array([c[:2] not in done
                         for c in t.column("cellid").to_pylist()])
        write_cell_table(rd.from_arrow(t.filter(rest)), out, {"res": 3},
                         partition_depth=1)
        ds, _ = read_cell_table(out)
        assert sorted(ds.to_pandas().cellid) \
            == sorted(t.column("cellid").to_pylist())
