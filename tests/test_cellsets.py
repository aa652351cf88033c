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
