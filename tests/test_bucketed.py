"""Bucketed tables (`dggsray/ops/bucketed.py`): stable bucketing, idempotent
writes, shuffle-free join equal to a hash join."""
import numpy as np
import pyarrow as pa
import pytest


class TestBucketed:
    def test_join_equals_hash_join(self, ray_session, tmp_path):
        import ray.data as rd
        from dggsray.ops.bucketed import bucketed_join, write_bucketed
        rng = np.random.default_rng(8)
        a = pa.table({"k": pa.array(rng.integers(0, 300, 2_000),
                                    type=pa.int64()),
                      "va": pa.array(rng.integers(0, 100, 2_000),
                                     type=pa.int64())})
        b = pa.table({"k": pa.array(rng.integers(0, 300, 1_500),
                                    type=pa.int64()),
                      "vb": pa.array(rng.integers(0, 100, 1_500),
                                     type=pa.int64())})
        pa_dir, pb_dir = str(tmp_path / "a"), str(tmp_path / "b")
        write_bucketed(rd.from_arrow(a).repartition(4), "k", 8, pa_dir)
        write_bucketed(rd.from_arrow(b).repartition(3), "k", 8, pb_dir)
        got = bucketed_join(pa_dir, pb_dir, on="k").to_pandas() \
            .sort_values(["k", "va", "vb"]).reset_index(drop=True)
        exp = a.join(b, keys="k", join_type="inner").to_pandas() \
            .sort_values(["k", "va", "vb"]).reset_index(drop=True)
        assert got[exp.columns.tolist()].equals(exp)

    def test_string_keys_and_idempotent_write(self, ray_session, tmp_path):
        import ray.data as rd
        from dggsray.ops.bucketed import bucketed_join, write_bucketed
        a = pa.table({"k": pa.array([f"u{i % 40}" for i in range(500)]),
                      "va": pa.array(np.arange(500, dtype=np.int64))})
        b = pa.table({"k": pa.array([f"u{i}" for i in range(40)]),
                      "vb": pa.array(np.arange(40, dtype=np.int64))})
        pa_dir, pb_dir = str(tmp_path / "a"), str(tmp_path / "b")
        write_bucketed(rd.from_arrow(a), "k", 6, pa_dir)
        write_bucketed(rd.from_arrow(a), "k", 6, pa_dir)  # idempotent
        write_bucketed(rd.from_arrow(b), "k", 6, pb_dir)
        got = bucketed_join(pa_dir, pb_dir, on="k")
        assert got.count() == 500  # every left row matches exactly one right

    def test_contract_mismatch_rejected(self, ray_session, tmp_path):
        import ray.data as rd
        from dggsray.ops.bucketed import bucketed_join, write_bucketed
        t = pa.table({"k": pa.array(np.arange(50, dtype=np.int64)),
                      "v": pa.array(np.arange(50, dtype=np.int64))})
        pa_dir, pb_dir = str(tmp_path / "a"), str(tmp_path / "b")
        write_bucketed(rd.from_arrow(t), "k", 4, pa_dir)
        write_bucketed(rd.from_arrow(t), "k", 8, pb_dir)
        with pytest.raises(ValueError):
            bucketed_join(pa_dir, pb_dir, on="k")
        with pytest.raises(ValueError):
            write_bucketed(rd.from_arrow(t), "k", 16, pa_dir)
