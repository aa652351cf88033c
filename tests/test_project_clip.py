"""Explicit planar project+clip — reference rhpxutils.py:228-238 parity
(fiona transform -> shapely .intersection(planar_boundary), here pointwise
projection through the lonlat hub + Sutherland-Hodgman clipping against the
six resolution-0 face squares; output is the same region split at face
edges)."""
import numpy as np
import pytest

from dggsray.core.rhpx import DEFAULT_GRID, F, project_fwd
from dggsray.ops.vectorwarp import (_ring_area, clip_ring_to_box,
                                    project_and_clip_to_rhealpix,
                                    rhealpix_face_boxes)


def _even_odd(px, py, rings):
    """Crossing-number containment of points (px, py) in a polygon given as
    [outer, hole, ...] rings (each (n, 2), closed or open)."""
    inside = np.zeros(len(px), dtype=bool)
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if r.shape[0] >= 2 and np.array_equal(r[0], r[-1]):
            r = r[:-1]
        n = r.shape[0]
        for i in range(n):
            x1, y1 = r[i]
            x2, y2 = r[(i + 1) % n]
            crosses = ((y1 > py) != (y2 > py))
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            inside ^= crosses & (px < np.where(crosses, xint, np.inf))
    return inside


def _mp_contains(px, py, multipoly):
    got = np.zeros(len(px), dtype=bool)
    for poly in multipoly["coordinates"]:
        got |= _even_odd(px, py, [np.asarray(r) for r in poly])
    return got


def _mp_net_area(multipoly):
    tot = 0.0
    for poly in multipoly["coordinates"]:
        tot += _ring_area(np.asarray(poly[0]))
        for hole in poly[1:]:
            tot -= _ring_area(np.asarray(hole))
    return tot


class TestFaceBoxes:
    def test_tile_without_overlap(self):
        boxes = rhealpix_face_boxes()
        assert len(boxes) == 6
        for (x0, y0, x1, y1) in boxes:
            assert abs((x1 - x0) - F) < 1e-6 and abs((y1 - y0) - F) < 1e-6
        for i in range(6):
            for j in range(i + 1, 6):
                a, b = boxes[i], boxes[j]
                ox = min(a[2], b[2]) - max(a[0], b[0])
                oy = min(a[3], b[3]) - max(a[1], b[1])
                assert min(ox, oy) <= 1e-6  # at most edge contact


class TestClipRing:
    BOX = (0.0, 0.0, 10.0, 10.0)

    def test_fully_inside_unchanged(self):
        ring = np.array([[2, 2], [8, 2], [8, 8], [2, 8], [2, 2]], float)
        out = clip_ring_to_box(ring, self.BOX)
        assert abs(_ring_area(out) - 36.0) < 1e-9

    def test_fully_outside_empty(self):
        ring = np.array([[20, 20], [30, 20], [30, 30], [20, 20]], float)
        assert clip_ring_to_box(ring, self.BOX).shape[0] == 0

    def test_half_overlap_area(self):
        # square [5,15]^2 overlaps the box in [5,10]^2 -> area 25
        ring = np.array([[5, 5], [15, 5], [15, 15], [5, 15]], float)
        out = clip_ring_to_box(ring, self.BOX)
        assert abs(_ring_area(out) - 25.0) < 1e-9

    def test_box_inside_ring_gives_whole_box(self):
        ring = np.array([[-5, -5], [15, -5], [15, 15], [-5, 15]], float)
        out = clip_ring_to_box(ring, self.BOX)
        assert abs(_ring_area(out) - 100.0) < 1e-9


class TestProjectAndClip:
    def test_lonlat_square_containment_equivalence(self):
        """Even-odd containment over the clipped output equals containment
        in the directly-projected polygon (which lies inside the cube), on
        probe points off the face edges."""
        ring = np.array([[-10, -10], [10, -10], [10, 10], [-10, 10],
                         [-10, -10]], float)
        out = project_and_clip_to_rhealpix(
            {"type": "Polygon", "coordinates": [ring.tolist()]})
        assert out["type"] == "MultiPolygon"
        # straddles the face boundary at x=0 -> split into 2 pieces
        assert len(out["coordinates"]) == 2

        px, py = project_fwd(ring[:, 0], ring[:, 1], DEFAULT_GRID)
        planar = np.column_stack([px, py])
        rng = np.random.default_rng(7)
        qx = rng.uniform(planar[:, 0].min() - 1e5, planar[:, 0].max() + 1e5,
                         500) + 0.123
        qy = rng.uniform(planar[:, 1].min() - 1e5, planar[:, 1].max() + 1e5,
                         500) + 0.321
        exp = _even_odd(qx, qy, [planar])
        got = _mp_contains(qx, qy, out)
        assert np.array_equal(got, exp)
        # split pieces conserve area exactly
        assert abs(_mp_net_area(out) - _ring_area(planar)) \
            < 1e-6 * _ring_area(planar)

    def test_hole_survives_clip(self):
        geom = {"type": "Polygon", "coordinates": [
            [[-10, -10], [10, -10], [10, 10], [-10, 10], [-10, -10]],
            [[-3, -3], [3, -3], [3, 3], [-3, 3], [-3, -3]]]}
        out = project_and_clip_to_rhealpix(geom)
        n_holes = sum(len(p) - 1 for p in out["coordinates"])
        assert n_holes == 2  # the hole also straddles x=0

        def area_of(lonlat):
            a = np.asarray(lonlat, float)
            x, y = project_fwd(a[:, 0], a[:, 1], DEFAULT_GRID)
            return _ring_area(np.column_stack([x, y]))

        exp = area_of(geom["coordinates"][0]) - area_of(geom["coordinates"][1])
        assert abs(_mp_net_area(out) - exp) < 1e-6 * exp

    def test_multipolygon_and_wide_band(self):
        """A 340-degree equatorial band crosses all four equatorial faces."""
        geom = {"type": "MultiPolygon", "coordinates": [
            [[[-170, -20], [170, -20], [170, 20], [-170, 20], [-170, -20]]]]}
        out = project_and_clip_to_rhealpix(geom)
        assert len(out["coordinates"]) == 4

    def test_rhealpix_input_clips_outside_cube(self):
        """Planar input partially outside the unfolded cube loses exactly
        the outside part (the reference's raison d'etre for the clip)."""
        x0, y0, x1, y1 = rhealpix_face_boxes()[3]  # equatorial face at x in [0,F]
        half = 0.25 * F
        ring = [[x1 - half, y0 + half], [x1 + half, y0 + half],
                [x1 + half, y0 + 3 * half], [x1 - half, y0 + 3 * half],
                [x1 - half, y0 + half]]
        out = project_and_clip_to_rhealpix(
            {"type": "Polygon", "coordinates": [ring]}, input_crs="rhealpix")
        # right half survives in the next face over, left half in this one
        assert len(out["coordinates"]) == 2
        exp = (half * 2 * half) * 2
        assert abs(_mp_net_area(out) - exp) < 1e-12 * exp

    def test_utm_input_routes_through_inverse(self):
        from dggsray.core.tmerc import utm_fwd
        lon = np.array([-3.5, -3.0, -3.0, -3.5, -3.5])
        lat = np.array([40.0, 40.0, 40.5, 40.5, 40.0])
        e, n = utm_fwd(lon, lat, 30)
        out = project_and_clip_to_rhealpix(
            {"type": "Polygon",
             "coordinates": [np.column_stack([e, n]).tolist()]},
            input_crs="utm:30N")
        exp = project_and_clip_to_rhealpix(
            {"type": "Polygon",
             "coordinates": [np.column_stack([lon, lat]).tolist()]})
        assert abs(_mp_net_area(out) - _mp_net_area(exp)) \
            < 1e-4 * _mp_net_area(exp)

    def test_unsupported_geometry_raises(self):
        with pytest.raises(NotImplementedError):
            project_and_clip_to_rhealpix(
                {"type": "LineString", "coordinates": [[0, 0], [1, 1]]})


class TestBurnClipToCube:
    def test_noop_for_equatorial_multiface_polygon(self):
        """For geometry inside the contiguous equatorial band the per-face
        clip changes nothing (cell centers never sit on face edges)."""
        from dggsray.ops.vector2dggs import burn_polygons_to_cells
        tri = np.array([[-20.0, -10.0], [45.0, 5.0], [10.0, 30.0],
                        [-20.0, -10.0]])
        feats = [{"feature_id": 1, "value": 1, "rings": [tri]}]
        a = burn_polygons_to_cells(feats, 3, clip_to_cube=True)
        b = burn_polygons_to_cells(feats, 3, clip_to_cube=False)
        ca = sorted(a.column("cellid").to_pylist())
        cb = sorted(b.column("cellid").to_pylist())
        assert ca == cb and len(ca) > 0

    def test_polar_spanning_polygon_clip_is_implicit(self):
        """Polygons with vertices in the N face and in far equatorial faces
        draw straight planar edges through the EMPTY quadrants of the
        unfolded cross.  The reference must clip first
        (vector_to_rhpx.py:224) because rasterio burns a face-blind grid;
        this engine's burn is equivalent WITHOUT the explicit clip: parity
        at a face point wrt the ring equals parity wrt ring ∩ face, and
        cell_from_point drops out-of-face centers.  Pin the equivalence on
        adversarial polar-spanning polygons, and pin the dropping behavior
        itself."""
        from dggsray.core.rhpx import DEFAULT_GRID, cell_from_point
        from dggsray.ops.vector2dggs import burn_polygons_to_cells
        rng = np.random.default_rng(11)
        for _ in range(10):
            k = int(rng.integers(3, 6))
            lon = rng.uniform(-179, 179, k)
            lat = np.concatenate([rng.uniform(60, 88, max(1, k // 2)),
                                  rng.uniform(-30, 30, k - max(1, k // 2))])
            rng.shuffle(lat)
            ring = np.vstack([np.column_stack([lon, lat]),
                              [[lon[0], lat[0]]]])
            feats = [{"feature_id": 1, "value": 1, "rings": [ring]}]
            a = burn_polygons_to_cells(feats, 3, clip_to_cube=True)
            b = burn_polygons_to_cells(feats, 3, clip_to_cube=False)
            assert sorted(a.column("cellid").to_pylist()) \
                == sorted(b.column("cellid").to_pylist())
        # the mechanism: empty-quadrant points get no cell at all
        got = cell_from_point(3, np.array([0.5 * F, 1.5 * F, -1.5 * F]),
                              np.array([0.9 * F, 0.9 * F, 0.9 * F]),
                              DEFAULT_GRID)
        assert list(got) == ["", "", ""]
