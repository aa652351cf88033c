"""Goldens ported from /root/reference/tests/unit_tests/tests_dggstools.py (hierarchy,
geodesy) and tests_auids.py (AUID encode/decode/optimize/subarea)."""
import numpy as np
import pytest

from dggsray.core import cells as C
from dggsray.core import auid as A
from dggsray.core.geodesy import (geodesic_distance, get_geodesic_size,
                                  line_length, polygon_area_m2)
from dggsray.core.rhpx import GridConfig

G2 = GridConfig(2, 1, 0)
G3 = GridConfig(3, 1, 0)


class TestHierarchy:
    # reference tests_dggstools.py:91-175
    def test_parent(self):
        assert C.get_parent_cellid("N") == ""
        assert C.get_parent_cellid("N1") == "N"
        assert C.get_parent_cellid("N23") == "N2"
        assert C.get_parent_cellid("O1230") == "O123"

    def test_children(self):
        assert C.get_children_cellids("N", G2) == ["N0", "N1", "N2", "N3"]
        assert C.get_children_cellids("S1", G2) == ["S10", "S11", "S12", "S13"]
        assert C.get_children_cellids("N", G3) == [f"N{i}" for i in range(9)]

    def test_ascendants(self):
        assert C.get_ascendant_cellid_at_resolution_idx("N", 0) is None
        assert C.get_ascendant_cellid_at_resolution_idx("N1", 0) == "N"
        assert C.get_ascendant_cellid_at_resolution_idx("N0821", 0) == "N"
        assert C.get_ascendant_cellid_at_resolution_idx("N0821", 1) == "N0"
        assert C.get_ascendant_cellids_up_to_resolution_idx("N", 0) == []
        assert C.get_ascendant_cellids_up_to_resolution_idx("N0", 0) == ["N"]
        assert C.get_ascendant_cellids_up_to_resolution_idx("N12313", 0) == \
            ["N", "N1", "N12", "N123", "N1231"]
        assert C.get_ascendant_cellids_up_to_resolution_idx("N12313", 2) == \
            ["N12", "N123", "N1231"]

    def test_descendants(self):
        assert C.get_descendant_cellids_at_resolution_idx("N", G2, 0) == []
        assert C.get_descendant_cellids_at_resolution_idx("N", G2, 1) == \
            ["N0", "N1", "N2", "N3"]
        assert C.get_descendant_cellids_at_resolution_idx("N", G2, 2) == \
            [f"N{i}{j}" for i in range(4) for j in range(4)]
        assert C.get_descendant_cellids_at_resolution_idx("N0", G2, 3) == \
            [f"N0{i}{j}" for i in range(4) for j in range(4)]
        assert C.get_descendant_cellids_up_to_resolution_idx("N", G2, 2) == \
            C.get_descendant_cellids_at_resolution_idx("N", G2, 1) + \
            C.get_descendant_cellids_at_resolution_idx("N", G2, 2)

    def test_truncate_vectorized(self):
        arr = np.array(["N12313", "O0", "Q88442"])
        out = C.truncate_to_resolution(arr, 2)
        assert list(out) == ["N12", "O0", "Q88"]

    def test_explode_children(self):
        kids, idx = C.explode_to_children(np.array(["N", "S1"]), G2)
        assert list(kids) == ["N0", "N1", "N2", "N3", "S10", "S11", "S12", "S13"]
        assert list(idx) == [0, 0, 0, 0, 1, 1, 1, 1]


class TestAUID:
    # reference tests_auids.py
    def test_encode_decode_roundtrip(self):
        for cuids in (['N11', 'N12', 'N2', 'N3'],
                      ['N1', 'N21', 'N22', 'N23', 'N25', 'S12', 'S13'],
                      ["[1,(0,0)]2", "[1,(0,1)]2", "[1,(1,1)]2"],
                      ['N(0,0)3', 'N(1,0)1', 'N(1,1)1', 'N(3,1)2', 'N(3,2)2']):
            for wop in (True, False):
                bp, _, _, _, _, _ = A.generate_bp_auid_from_cuids(cuids, with_opening_par=wop)
                assert A.generate_cuids_from_bp_auid(bp, with_opening_par=wop) == sorted(cuids)

    def test_repetition_invariance(self):
        bp1, *_ = A.generate_bp_auid_from_cuids(['N1', 'N1'])
        bp2, *_ = A.generate_bp_auid_from_cuids(['N1'])
        assert bp1 == bp2

    def test_order_invariance(self):
        bp1, *_ = A.generate_bp_auid_from_cuids(['N22', 'N21'])
        bp2, *_ = A.generate_bp_auid_from_cuids(['N21', 'N22'])
        assert bp1 == bp2

    def test_generator_roundtrip(self):
        a = A.AUIDGenerator()
        for cuids in (['N1'], ['N(1,0)1', 'N(1,0)2', 'N(1,1)1']):
            comp, h = a.generate_auid_hash_b64(cuids)
            assert a.cuids_from_auid_b64(comp) == sorted(cuids)
            assert a.hash_b64_from_auid(comp) == h

    def test_optimizer_goldens(self):
        # reference tests_auids.py:136-163
        assert A.optimize_cuids(["N11", "N11", "N12", "N21", "N22", "N23", "N24"], 2) \
            == ["N11", "N12", "N2"]
        assert A.optimize_cuids(
            ["N11", "N11", "N12", "N21", "N22", "N23", "N24", "N311", "N312", "N313",
             "N314", "N321", "N322", "N323", "N324", "N331", "N332", "N333", "N334",
             "N341", "N342", "N343", "N344"], 2) == ["N11", "N12", "N2", "N3"]
        assert A.optimize_cuids(
            ["N11", "N11", "N12", "N21", "N22", "N23", "N24", "N311", "N312", "N313",
             "N314", "N321", "N322", "N323", "N324", "N331", "N332", "N333", "N334",
             "N341", "N342", "N343"], 2) == \
            ["N11", "N12", "N2", "N31", "N32", "N33", "N341", "N342", "N343"]
        assert A.optimize_cuids(["N", "S", "O", "Q"], 2) == ["N", "O", "Q", "S"]
        assert A.optimize_cuids(["N1", "N2", "N3", "N4", "S", "O", "Q"], 2) == \
            ["N", "O", "Q", "S"]
        assert A.optimize_cuids(["R11", "R12", "R13", "R141", "R142", "R143", "R144"], 2) \
            == ["R1"]
        assert A.optimize_cuids(["R11", "R12", "R13", "R141", "R142", "R143"], 2) == \
            ["R11", "R12", "R13", "R141", "R142", "R143"]
        assert A.optimize_cuids(
            ["R11", "R12", "R13", "R14", "R15", "R16", "R17", "R18", "R19"], 3) == ["R1"]

    def test_is_optimal(self):
        assert not A.is_optimal_cuids(["N11", "N11", "N12", "N21", "N22", "N23", "N24"], 2)
        assert A.is_optimal_cuids(["N11", "N12", "N2"], 2)
        assert A.is_optimal_cuids(["N11", "N12", "N2", "N3"], 2)
        assert not A.is_optimal_cuids(
            ["R11", "R12", "R13", "R14", "R15", "R16", "R17", "R18", "R19"], 3)
        assert A.is_optimal_cuids(("R1",), 3)

    def test_rhpx_generator_optimizes(self):
        a = A.RHEALPixAUIDGenerator(n_side=2)
        ins = ['N1', 'N21', 'N22', 'N23', 'N24', 'S12', 'S13']
        comp, _ = a.generate_auid_hash_b64(ins)
        assert a.cuids_from_auid_b64(comp) == A.optimize_cuids(ins, 2)

    def test_subarea(self):
        # reference tests_auids.py:93-134
        for wtp in (True, False):
            a = A.AUIDGenerator(with_trailing_pars=wtp)
            a1, _ = a.generate_auid_hash_b64(['N1', 'N21', 'N22', 'N23', 'N25', 'S12', 'S13'])
            a2, _ = a.generate_auid_hash_b64(['N1', 'N21', 'N22', 'N23', 'N25', 'S12', 'S13', 'S14'])
            assert A.is_a_subarea(a1, a2)
            b1, _ = a.generate_auid_hash_b64(['N1', 'N21', 'N22', 'N23', 'N25', 'S12', 'S13', 'O143'])
            b2, _ = a.generate_auid_hash_b64(
                ['N1', 'N21', 'N22', 'N23', 'N25', 'O143', 'O5135321', 'S12', 'S13',
                 'S14', 'S145', 'S2123', 'S2124'])
            assert A.is_a_subarea(b1, b2)
            c1, _ = a.generate_auid_hash_b64(['N1', 'N21', 'N22', 'N23', 'N25', 'S12', 'S13', 'S15'])
            c2, _ = a.generate_auid_hash_b64(['N1', 'N21', 'N22', 'N23', 'N25', 'S12', 'S13', 'S14'])
            assert not A.is_a_subarea(c1, c2)
            d1, _ = a.generate_auid_hash_b64(['N1', 'N21', 'N22', 'N23', 'N25', 'S12', 'S13', 'O1434'])
            assert not A.is_a_subarea(d1, b2)


class TestGeodesy:
    # reference tests_dggstools.py:41-90
    def test_iberia_diag(self):
        diag, res = get_geodesic_size(-9.64, 44.24, 3.53, 35.66,
                                      (3.53 + 9.64) / 0.0333333,
                                      (44.24 - 35.66) / 0.033333)
        assert diag == pytest.approx(1471245.1842697694, abs=0.01)
        assert res == pytest.approx(3120.012427237816, abs=1e-4)

    def test_globe_diag(self):
        diag, res = get_geodesic_size(-180, 90, 180, -90, 360 / 0.0333333, 180 / 0.033333)
        assert diag == pytest.approx(20003931.458625447, abs=0.5)
        assert res == pytest.approx(1656.6676042015517, abs=1e-3)

    def test_distance_symmetry_and_zero(self):
        assert geodesic_distance([2.0], [41.0], [2.0], [41.0])[0] == 0.0
        d1 = geodesic_distance([0.0], [0.0], [1.0], [0.0])[0]
        # one degree of longitude at the equator ~ 111.32 km
        assert d1 == pytest.approx(111319.49, abs=1.0)

    def test_polygon_area(self):
        # 1x1 degree box at the equator: ~111.32 km x ~110.57 km ~ 12308.8 km^2
        lons = [0, 1, 1, 0]
        lats = [0, 0, 1, 1]
        area = polygon_area_m2(lons, lats)
        assert area == pytest.approx(12308.8e6, rel=1e-3)
        # whole equatorial band +-30deg ~ half the sphere's area... sanity: octant
        area8 = polygon_area_m2([0, 90, 90, 0], [0, 0, 89.999, 89.999])
        from dggsray.core.ellipsoid import R_A
        import math
        assert area8 == pytest.approx(4 * math.pi * R_A**2 / 8, rel=1e-3)

    def test_line_length_chain(self):
        l1 = line_length([0, 1, 2], [0, 0, 0])
        assert l1 == pytest.approx(2 * 111319.49, abs=2.0)
