"""cell_embedding_centroid: per-cell element-wise embedding mean in exact
integer micro-units.  Pinned against a brute-force numpy groupby at
sf0.001, plus mass conservation over the cell partition."""
import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _brute(res=1):
    from dggsray.core.rhpx import DEFAULT_GRID, cells_from_lonlat
    from dggsray.pipelines.relational import derived_lonlat
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    keys = t.column("vec_id").to_numpy()
    lon, lat = derived_lonlat(keys)
    cells = np.asarray(cells_from_lonlat(res, lon, lat, DEFAULT_GRID))
    emb = np.stack(t.column("embedding").to_numpy(zero_copy_only=False))
    v = np.floor(emb.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    out = {}
    for c in np.unique(cells):
        m = cells == c
        out[c] = (v[m].sum(axis=0), int(m.sum()))
    return out


class TestCellEmbeddingCentroid:
    def test_matches_bruteforce(self, ray_session):
        from dggsray.pipelines.relational import cell_embedding_centroid
        got = cell_embedding_centroid(SF, res=1)
        ref = _brute(res=1)
        assert set(got.cell) == set(ref)
        for c, grp in got.groupby("cell"):
            grp = grp.sort_values("dim")
            sums, n = ref[c]
            assert grp.dim.tolist() == list(range(len(sums)))
            assert grp.sum_e6.to_numpy().tolist() == sums.tolist()
            assert (grp.n_points == n).all()
            assert grp.centroid_e6.to_numpy().tolist() \
                == (sums // n).tolist()

    def test_mass_conservation(self, ray_session):
        # summing the per-cell sums over the cell partition must equal the
        # global micro-unit sum per dimension, and n_points must total the
        # table row count for every dim
        from dggsray.pipelines.relational import cell_embedding_centroid
        got = cell_embedding_centroid(SF, res=1)
        t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
        emb = np.stack(t.column("embedding").to_numpy(zero_copy_only=False))
        v = np.floor(emb.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        per_dim = got.groupby("dim").sum_e6.sum()
        assert per_dim.to_numpy().tolist() == v.sum(axis=0).tolist()
        assert (got.groupby("dim").n_points.sum() == emb.shape[0]).all()
