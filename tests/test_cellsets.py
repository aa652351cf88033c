"""Distributed CUID compaction vs the exact driver optimizer, and area set ops."""
import numpy as np
import pyarrow as pa
import pytest

from dggsray.core.auid import optimize_cuids
from dggsray.core.rhpx import GridConfig, cells_from_lonlat


def _ds(cells):
    import ray.data as rd
    return rd.from_arrow(pa.table({"cellid": pa.array(list(cells), pa.string())}))


class TestDistributedOptimize:
    def test_equals_driver_optimizer_on_region(self, ray_session):
        from dggsray.ops.cellsets import distributed_optimize
        g = GridConfig(3, 1, 0)
        lons, lats = np.meshgrid(np.linspace(-2.0, 1.0, 120),
                                 np.linspace(39.5, 42.5, 120))
        cells = cells_from_lonlat(6, lons.ravel(), lats.ravel(), g)
        got = distributed_optimize(_ds(cells), 3)
        exp = optimize_cuids(sorted(set(cells)), 3)
        assert got == exp
        assert len(got) < len(set(cells))

    def test_goldens(self, ray_session):
        from dggsray.ops.cellsets import distributed_optimize
        # reference optimizer goldens run through the distributed path
        assert distributed_optimize(
            _ds(["N11", "N11", "N12", "N21", "N22", "N23", "N24"]), 2) == \
            ["N11", "N12", "N2"]
        assert distributed_optimize(
            _ds(["R11", "R12", "R13", "R141", "R142", "R143", "R144"]), 2) == ["R1"]
        assert distributed_optimize(
            _ds(["N1", "N2", "N3", "N4", "S", "O", "Q"]), 2) == \
            ["N", "O", "Q", "S"]

    def test_duplicate_area_terminal_guard(self, ray_session):
        from dggsray.ops.cellsets import distributed_optimize
        # N1 present AND its full children: children must NOT collapse into N1
        cells = ["N1", "N11", "N12", "N13", "N14"]
        assert distributed_optimize(_ds(cells), 2) == \
            optimize_cuids(cells, 2)

    def test_adversarial_mixed_depth(self, ray_session):
        from dggsray.ops.cellsets import distributed_optimize
        rng = np.random.default_rng(8)
        g = GridConfig(2, 1, 0)
        cells = []
        for res in (2, 3, 4, 5):
            lon = rng.uniform(-30, 30, 400)
            lat = rng.uniform(-30, 30, 400)
            cells.extend(cells_from_lonlat(res, lon, lat, g))
        got = distributed_optimize(_ds(cells), 2)
        exp = optimize_cuids(sorted(set(cells)), 2)
        assert got == exp


class TestAreaSetOps:
    def test_union_intersection_difference(self, ray_session):
        from dggsray.ops.cellsets import area_setop, expand_to_resolution
        a = _ds(["N1", "N22"])       # mixed resolution
        b = _ds(["N12", "N2"])
        g2 = GridConfig(2, 1, 0)
        union = set(area_setop(a, b, "union", 2, g2).to_pandas().cellid)
        inter = set(area_setop(_ds(["N1", "N22"]), _ds(["N12", "N2"]),
                               "intersection", 2, g2).to_pandas().cellid)
        diff = set(area_setop(_ds(["N1", "N22"]), _ds(["N12", "N2"]),
                              "difference", 2, g2).to_pandas().cellid)
        ea = {"N10", "N11", "N12", "N13", "N22"}
        eb = {"N12", "N20", "N21", "N22", "N23"}
        assert union == ea | eb
        assert inter == ea & eb == {"N12", "N22"}
        assert diff == ea - eb
        # expansion sanity
        ex = set(expand_to_resolution(_ds(["N"]), 1, g2).to_pandas().cellid)
        assert ex == {"N0", "N1", "N2", "N3"}

    def test_too_deep_raises(self, ray_session):
        from dggsray.ops.cellsets import area_setop
        with pytest.raises(Exception):
            area_setop(_ds(["N111"]), _ds(["N1"]), "union", 1,
                       GridConfig(2, 1, 0)).to_pandas()


class TestVectorToOptimalCuids:
    """vector -> minimal CUID cover (reference _vector_to_optimal_set_of_cuids
    semantics via rasterize-then-optimize, vector_to_rhpx.py:263-385)."""

    def _feats(self):
        # a polygon exactly covering face N's 9 res-1 cells collapses to ["N"]
        import numpy as np
        from dggsray.core.rhpx import DEFAULT_GRID, cell_vertices, project_inv
        (left, top), _, (right, bottom), _ = cell_vertices("N", DEFAULT_GRID)
        # build ring in lonlat from planar corners slightly inset
        eps = (right - left) * 1e-6
        xs = np.array([left + eps, right - eps, right - eps, left + eps])
        ys = np.array([bottom + eps, bottom + eps, top - eps, top - eps])
        lon, lat = project_inv(xs, ys, DEFAULT_GRID)
        ring = np.column_stack([lon, lat])
        return [{"feature_id": 0, "value": 1, "rings": [ring]}]

    def test_full_face_collapses(self):
        from dggsray.core.auid import is_optimal_cuids
        from dggsray.core.rhpx import DEFAULT_GRID
        from dggsray.ops.vector2dggs import vector_to_optimal_cuids
        cuids = vector_to_optimal_cuids(self._feats(), 2)
        assert cuids == ["N"]
        assert is_optimal_cuids(cuids, DEFAULT_GRID.n_side)

    def test_partial_area_optimal_and_equivalent(self):
        """A half-face polygon: optimized set must be optimal and expand back
        to exactly the burned res-2 cells."""
        import numpy as np
        from dggsray.core.auid import is_optimal_cuids
        from dggsray.core.cells import get_descendant_cellids_at_resolution_idx
        from dggsray.core.rhpx import DEFAULT_GRID, cell_vertices, project_inv
        from dggsray.ops.vector2dggs import burn_polygons_to_cells, \
            vector_to_optimal_cuids
        (left, top), _, (right, bottom), _ = cell_vertices("N", DEFAULT_GRID)
        eps = (right - left) * 1e-6
        mid = (top + bottom) / 2
        xs = np.array([left + eps, right - eps, right - eps, left + eps])
        ys = np.array([bottom + eps, bottom + eps, mid - eps, mid - eps])
        lon, lat = project_inv(xs, ys, DEFAULT_GRID)
        feats = [{"feature_id": 0, "value": 1,
                  "rings": [np.column_stack([lon, lat])]}]
        res = 3
        cuids = vector_to_optimal_cuids(feats, res)
        assert is_optimal_cuids(cuids, DEFAULT_GRID.n_side)
        burned = set(burn_polygons_to_cells(feats, res)
                     .column("cellid").to_pylist())
        expanded = set()
        for c in cuids:
            # descendants-at returns [] for cells already at res
            expanded.update(
                get_descendant_cellids_at_resolution_idx(c, DEFAULT_GRID, res)
                or [c])
        assert expanded == burned
        assert len(cuids) < len(burned)          # it actually compacted

    def test_with_auid_matches_direct_generation(self):
        from dggsray.core.auid import generate_bp_auid_from_cuids
        from dggsray.ops.vector2dggs import vector_to_optimal_cuids
        cuids, comp_b64, hash_b64 = vector_to_optimal_cuids(
            self._feats(), 2, with_auid=True)
        _a, _h, exp_hash, _c, exp_comp, _t = \
            generate_bp_auid_from_cuids(cuids)
        assert (comp_b64, hash_b64) == (exp_comp, exp_hash)

    def test_from_geojson_file(self, tmp_path):
        import json
        import numpy as np
        from dggsray.core.rhpx import DEFAULT_GRID, cell_vertices, project_inv
        from dggsray.ops.vector2dggs import vector_to_optimal_cuids
        (left, top), _, (right, bottom), _ = cell_vertices("N", DEFAULT_GRID)
        eps = (right - left) * 1e-6
        xs = np.array([left + eps, right - eps, right - eps, left + eps])
        ys = np.array([bottom + eps, bottom + eps, top - eps, top - eps])
        lon, lat = project_inv(xs, ys, DEFAULT_GRID)
        ring = np.column_stack([lon, lat]).tolist() + \
            [np.column_stack([lon, lat])[0].tolist()]
        p = str(tmp_path / "face.geojson")
        json.dump({"type": "FeatureCollection", "features": [
            {"type": "Feature", "properties": {},
             "geometry": {"type": "Polygon", "coordinates": [ring]}}]},
            open(p, "w"))
        assert vector_to_optimal_cuids(p, 2) == ["N"]
