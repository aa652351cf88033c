"""Round-5 oracled query additions: per-user argmax (grouped-window
shape, packed-key tie-break), exact daily-active-users, and the
embedding-norm histogram under the milli-unit integer contract.  Each
pinned against direct DuckDB computation at sf0.001."""
import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("events", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


class TestEventsUserArgmax:
    def test_matches_duckdb_row_number(self, ray_session):
        from dggsray.pipelines.relational import events_user_argmax
        out = events_user_argmax(SF).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        con = _con()
        ref = con.sql(
            "SELECT CAST(user_id AS BIGINT) u, "
            "CAST(round(value*100) AS BIGINT) c, "
            "CAST(event_id AS BIGINT) e FROM events "
            "QUALIFY row_number() OVER (PARTITION BY user_id "
            "ORDER BY round(value*100) DESC, event_id ASC) = 1 "
            "ORDER BY 1").df()
        assert out.user_id.tolist() == ref.u.tolist()
        assert out.max_cents.tolist() == ref.c.tolist()
        assert out.event_id.tolist() == ref.e.tolist()
        assert len(out) > 10

    def test_tie_breaks_to_smallest_event_id(self, ray_session):
        # duplicate max cents for a user must pick the smaller event_id
        import pyarrow as pa
        import ray.data as rd

        from dggsray.pipelines.relational import events_user_argmax
        import tempfile
        import pyarrow.parquet as pq
        with tempfile.TemporaryDirectory() as tmp:
            pq.write_table(pa.table({
                "event_id": pa.array([5, 3, 9], pa.int64()),
                "user_id": pa.array([1, 1, 1], pa.int64()),
                "value": pa.array([7.0, 7.0, 1.0])}),
                f"{tmp}/events.parquet")
            out = events_user_argmax(tmp).to_pandas()
        assert out.event_id.tolist() == [3]
        assert out.max_cents.tolist() == [700]


class TestDailyActiveUsers:
    def test_matches_duckdb(self, ray_session):
        from dggsray.pipelines.relational import events_daily_active_users
        out = events_daily_active_users(SF).to_pandas() \
            .sort_values("day").reset_index(drop=True)
        con = _con()
        ref = con.sql(
            "SELECT CAST(floor(epoch_us(ts)/86400000000) AS BIGINT) d, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) n FROM events "
            "GROUP BY 1 ORDER BY 1").df()
        assert out.day.tolist() == ref.d.tolist()
        assert out.n_users.tolist() == ref.n.tolist()
        assert len(out) > 1


class TestEmbedNormBuckets:
    def test_matches_numpy(self, ray_session):
        import pyarrow.parquet as pq

        from dggsray.pipelines.relational import embed_norm_buckets
        out = embed_norm_buckets(SF).to_pandas() \
            .sort_values("bucket").reset_index(drop=True)
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        emb = np.stack(t.column("embedding").to_numpy(
            zero_copy_only=False))
        W = np.floor(emb.astype(np.float64) * 1000 + 0.5).astype(np.int64)
        n2 = (W * W).sum(1)
        b = n2 // 50_000
        ids = t.column("vec_id").to_numpy()
        exp = {}
        for bb in np.unique(b):
            m = b == bb
            exp[int(bb)] = (int(m.sum()), int(ids[m].min()))
        got = {int(r.bucket): (int(r.n_vectors), int(r.min_vec_id))
               for r in out.itertuples()}
        assert got == exp


class TestCellNeighborSmooth:
    def test_neighborhood_equals_brute_force(self, ray_session):
        """3x3 smoothing must equal a driver-side brute force over the
        same (gx, gy) keys, including the horizontal equatorial wrap."""
        import pyarrow.parquet as pq

        from dggsray.core.rhpx import F, project_fwd
        from dggsray.pipelines.relational import (cell_neighbor_smooth,
                                                  derived_lonlat)
        res = 3
        side, total, w = 3 ** res, 4 * 3 ** res, F / 3 ** res
        out = cell_neighbor_smooth(SF, res=res).to_pandas() \
            .sort_values(["gx", "gy"]).reset_index(drop=True)
        k = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]) \
            .column("c_custkey").to_numpy().astype(np.int64)
        lon, lat = derived_lonlat(k)
        x, y = project_fwd(lon, lat)
        gx = np.floor((x + 2 * F) / w).astype(np.int64)
        gy = np.floor((F / 2 - y) / w).astype(np.int64)
        from collections import Counter
        cnt = Counter(zip(gx.tolist(), gy.tolist()))
        exp = {}
        for (cx, cy), n in cnt.items():
            s = 0
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    s += cnt.get(((cx + dx) % total, cy + dy), 0)
            exp[(cx, cy)] = (n, s)
        got = {(int(r.gx), int(r.gy)): (int(r.n_cell),
                                        int(r.n_neighborhood))
               for r in out.itertuples()}
        assert got == exp
        assert any(v[1] > v[0] for v in got.values())   # smoothing real
        assert (out.gy >= 0).all() and (out.gy < side).all()
        assert (out.gx >= 0).all() and (out.gx < total).all()


class TestEmbedLabelCentroidDist:
    def test_matches_numpy_exact(self, ray_session):
        import pyarrow.parquet as pq

        from dggsray.pipelines.relational import embed_label_centroid_dist
        out = embed_label_centroid_dist(SF).to_pandas() \
            .sort_values(["label_a", "label_b"]).reset_index(drop=True)
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["label", "embedding"])
        lab = t.column("label").to_numpy()
        W = np.floor(np.stack(t.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64) * 1000
            + 0.5).astype(np.int64)
        labs = np.sort(np.unique(lab))
        C = np.stack([(1000 * W[lab == v].sum(axis=0))
                      // (lab == v).sum() for v in labs])
        exp = {}
        for i in range(labs.size):
            for j in range(i + 1, labs.size):
                d = C[i] - C[j]
                exp[(int(labs[i]), int(labs[j]))] = int((d * d).sum())
        got = {(int(r.label_a), int(r.label_b)): int(r.d2_milli)
               for r in out.itertuples()}
        assert got == exp
        assert len(got) == labs.size * (labs.size - 1) // 2
        assert all(v > 0 for v in got.values())


class TestRegionAssignerProperty:
    def test_hypothesis_random_polygons(self):
        """Property: for ANY set of random (possibly self-intersecting)
        polygons, RegionAssigner equals the per-feature even-odd brute
        force with later-wins paint order — the index/banding layer can
        never change semantics."""
        from hypothesis import given, settings, strategies as st

        from dggsray.core.rhpx import DEFAULT_GRID, project_fwd
        from dggsray.ops.vector2dggs import RegionAssigner, _points_in_ring

        @settings(max_examples=20, deadline=None)
        @given(st.lists(
            st.lists(st.tuples(st.floats(-50, 50), st.floats(-33, 33)),
                     min_size=3, max_size=6),
            min_size=1, max_size=6),
            st.randoms(use_true_random=False))
        def check(polys, rnd):
            feats = [{"feature_id": i, "rings": [list(map(list, p))]}
                     for i, p in enumerate(polys)]
            ra = RegionAssigner(feats, res=3)
            rng = np.random.default_rng(rnd.randrange(2**31))
            lon = rng.uniform(-55.0, 55.0, 2000)
            lat = rng.uniform(-34.0, 34.0, 2000)
            got = ra.assign_lonlat(lon, lat)
            px, py = project_fwd(lon, lat, DEFAULT_GRID)
            exp = np.full(len(px), -1, np.int64)
            for f in feats:
                inside = np.zeros(len(px), bool)
                for ring in f["rings"]:
                    r = np.asarray(ring, float)
                    r = np.vstack([r, r[:1]])
                    xs, ys = project_fwd(r[:, 0], r[:, 1], DEFAULT_GRID)
                    inside ^= _points_in_ring(
                        px, py, np.column_stack([xs, ys]))
                exp[inside] = f["feature_id"]
            assert np.array_equal(got, exp)

        check()
