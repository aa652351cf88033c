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


class TestEmbedCellAssign:
    def test_matches_bruteforce(self, ray_session):
        from dggsray.pipelines.relational import (cell_embedding_centroid,
                                                  embed_cell_assign)
        out = embed_cell_assign(SF, res=1).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        cent = cell_embedding_centroid(SF, res=1)
        cells = sorted(cent.cell.unique())
        D = int(cent.dim.max()) + 1
        C = np.zeros((len(cells), D), dtype=np.int64)
        idx = {c: i for i, c in enumerate(cells)}
        C[[idx[c] for c in cent.cell], cent.dim.to_numpy()] = \
            cent.centroid_e6.to_numpy()
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        order = np.argsort(t.column("vec_id").to_numpy())
        emb = np.stack(t.column("embedding").to_numpy(
            zero_copy_only=False))[order]
        v = np.floor(emb.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        for i in range(v.shape[0]):
            d = ((v[i][None, :] - C) ** 2).sum(axis=1)
            j = int(np.argmin(d))
            assert out.cell_assigned[i] == cells[j]
            assert out.dist_e12[i] == d[j]

    def test_assignment_no_worse_than_home_cell(self, ray_session):
        # the assigned centroid distance can never exceed the distance to
        # the centroid of the vector's OWN geographic cell
        from dggsray.core.rhpx import DEFAULT_GRID, cells_from_lonlat
        from dggsray.pipelines.relational import (cell_embedding_centroid,
                                                  derived_lonlat,
                                                  embed_cell_assign)
        out = embed_cell_assign(SF, res=1).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        cent = cell_embedding_centroid(SF, res=1)
        cmat = {c: g.sort_values("dim").centroid_e6.to_numpy()
                for c, g in cent.groupby("cell")}
        t = pq.read_table(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        order = np.argsort(t.column("vec_id").to_numpy())
        keys = t.column("vec_id").to_numpy()[order]
        emb = np.stack(t.column("embedding").to_numpy(
            zero_copy_only=False))[order]
        v = np.floor(emb.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        lon, lat = derived_lonlat(keys)
        home = cells_from_lonlat(1, lon, lat, DEFAULT_GRID)
        for i, h in enumerate(home):
            dh = int(((v[i] - cmat[h]) ** 2).sum())
            assert out.dist_e12[i] <= dh
