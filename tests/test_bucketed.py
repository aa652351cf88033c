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


class TestZipWithIndex:
    def test_positions_follow_sorted_order(self, ray_session):
        import ray.data as rd
        from dggsray.ops.indexing import deterministic_shuffle, zip_with_index
        t = pa.table({"doc_id": pa.array(np.arange(1000, dtype=np.int64))})
        out = deterministic_shuffle(rd.from_arrow(t).repartition(7),
                                    "doc_id").to_pandas()
        assert sorted(out.position) == list(range(1000))
        # position order == Knuth-hash order
        k = (out.doc_id.to_numpy().astype(np.uint64) * np.uint64(2654435761)) \
            % np.uint64(1 << 32)
        by_pos = out.sort_values("position")
        kk = (by_pos.doc_id.to_numpy().astype(np.uint64)
              * np.uint64(2654435761)) % np.uint64(1 << 32)
        assert (np.diff(kk.astype(np.int64)) >= 0).all()
        # reproducible across runs
        out2 = deterministic_shuffle(rd.from_arrow(t).repartition(3),
                                     "doc_id").to_pandas()
        a = out.sort_values("doc_id").position.to_numpy()
        b = out2.sort_values("doc_id").position.to_numpy()
        assert (a == b).all()

    def test_zip_with_index_block_order(self, ray_session):
        import ray.data as rd
        from dggsray.ops.indexing import zip_with_index
        t = pa.table({"v": pa.array(np.arange(200, dtype=np.int64))})
        out = zip_with_index(rd.from_arrow(t).repartition(5).sort("v")) \
            .to_pandas().sort_values("position")
        assert (out.v.to_numpy() == np.arange(200)).all()

    def test_fallback_without_private_api(self, ray_session, monkeypatch):
        """iter_internal_ref_bundles is a Ray developer API: with it gone
        (future Ray), the stable-API fallback must give identical output."""
        import ray.data as rd
        from dggsray.ops.indexing import zip_with_index
        monkeypatch.delattr(rd.Dataset, "iter_internal_ref_bundles")
        t = pa.table({"v": pa.array(np.arange(200, dtype=np.int64))})
        out = zip_with_index(rd.from_arrow(t).repartition(5).sort("v")) \
            .to_pandas().sort_values("position")
        assert (out.v.to_numpy() == np.arange(200)).all()


class TestBucketProperties:
    def test_bucket_hash_stable_and_spread(self):
        from hypothesis import given, settings, strategies as st
        from dggsray.ops.bucketed import _bucket_of

        @settings(max_examples=60, deadline=None)
        @given(st.lists(st.integers(-2**62, 2**62), min_size=1,
                        max_size=300),
               st.sampled_from([2, 4, 8, 32]))
        def run(ids, n):
            col = pa.array(np.array(ids, dtype=np.int64))
            b1 = _bucket_of(col, n)
            b2 = _bucket_of(col, n)
            assert (b1 == b2).all()
            assert ((b1 >= 0) & (b1 < n)).all()

        run()

    def test_bucket_uniformity_large_sample(self):
        from dggsray.ops.bucketed import _bucket_of
        ids = pa.array(np.arange(80_000, dtype=np.int64))
        b = _bucket_of(ids, 16)
        counts = np.bincount(b, minlength=16)
        # splitmix64 spread: every bucket within 10% of the mean
        assert (abs(counts - 5000) < 500).all(), counts

    def test_qsketch_weight_conserved_under_merge(self):
        from hypothesis import given, settings, strategies as st
        from dggsray.ops.sketch import qsketch_batch, qsketch_merge

        @settings(max_examples=60, deadline=None)
        @given(st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=400),
               st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=400))
        def run(a, b):
            sa = qsketch_batch(np.array(a), k=64)
            sb = qsketch_batch(np.array(b), k=64)
            m = qsketch_merge(sa, sb, k=64)
            assert abs(m[1].sum() - (len(a) + len(b))) < 1e-6
            # points stay sorted
            assert (np.diff(m[0]) >= 0).all()

        run()
