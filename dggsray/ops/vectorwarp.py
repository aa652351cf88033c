"""Vector-file reprojection between engine CRSes.

Reference parity: vectorutils.reproject_vector_file
(/root/reference/dggstools/rhpx/utils/vectorutils.py:42-51), which is
geopandas read_file -> to_crs -> to_file(driver="GPKG").  Here the feature
coordinates route through the lonlat hub with the same pure-numpy projections
the raster warp uses (ops.warp._crs_funcs), and the writers are the engine's
own GPKG / GeoJSON backends.

Driver-side utility by design: vector files in this engine are the SMALL side
of every pipeline (they get broadcast, rasterized, or joined against cell
tables); the 100 TB side is always the raster/cell Datasets.
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..core.rhpx import DEFAULT_GRID, GridConfig


def _load_features(input_path: str, layer: str | None):
    """-> (feats, attrs) with coordinates in lonlat.  feats are engine dicts
    ({rings} | {coords}); attrs are per-feature attribute dicts."""
    low = input_path.lower()
    if low.endswith(".gpkg"):
        from ..io.gpkg import read_gpkg_polygons
        feats, attrs, _crs = read_gpkg_polygons(input_path, layer)
        return feats, attrs
    if low.endswith(".shp"):
        from ..io.shapefile import read_shapefile
        feats, attrs, _crs = read_shapefile(input_path)
        # drop geometry-less (null-shape) features WITH their attrs — a
        # truncation here would shift every later feature's attributes
        kept = [(f, a) for f, a in zip(feats, attrs)
                if "rings" in f or "coords" in f]
        return [f for f, _ in kept], [a for _, a in kept]
    with open(input_path) as f:
        gj = json.load(f)
    feats, attrs = [], []
    for i, ft in enumerate(gj["features"]):
        g = ft["geometry"]
        if g["type"] == "Polygon":
            rings = [np.asarray(r, dtype=np.float64) for r in g["coordinates"]]
            feats.append({"feature_id": i, "rings": rings})
        elif g["type"] == "MultiPolygon":
            rings = [np.asarray(r, dtype=np.float64)
                     for poly in g["coordinates"] for r in poly]
            feats.append({"feature_id": i, "rings": rings})
        elif g["type"] == "LineString":
            feats.append({"feature_id": i, "coords":
                          np.asarray(g["coordinates"], dtype=np.float64)})
        elif g["type"] == "Point":
            feats.append({"feature_id": i, "coords":
                          np.asarray([g["coordinates"]], dtype=np.float64)})
        else:
            raise ValueError(f"unsupported GeoJSON geometry {g['type']!r}")
        attrs.append(dict(ft.get("properties") or {}))
    return feats, attrs


def _geojson_geometry(ft: dict) -> dict:
    if "rings" in ft:
        return {"type": "Polygon",
                "coordinates": [np.asarray(r).tolist() for r in ft["rings"]]}
    coords = np.atleast_2d(ft["coords"])
    if len(coords) == 1:
        return {"type": "Point", "coordinates": coords[0].tolist()}
    return {"type": "LineString", "coordinates": coords.tolist()}


def reproject_vector_file(input_path: str, output_path: str, dst_crs: str,
                          layer: str | None = None,
                          grid: GridConfig = DEFAULT_GRID) -> int:
    """Reproject a vector file (GeoJSON / Shapefile / GeoPackage) to dst_crs
    and write it — GeoPackage by default, GeoJSON when output_path ends in
    .geojson/.json.  Returns the feature count.  Input CRS is read from the
    file itself (.prj / gpkg srs; GeoJSON is lonlat)."""
    from .warp import _crs_funcs

    feats, attrs = _load_features(input_path, layer)
    fwd, _ = _crs_funcs(dst_crs, grid)

    def tr(arr: np.ndarray) -> np.ndarray:
        x, y = fwd(arr[:, 0], arr[:, 1])
        return np.column_stack([x, y])

    out = []
    for ft in feats:
        nf = {"feature_id": ft["feature_id"]}
        if "rings" in ft:
            nf["rings"] = [tr(r) for r in ft["rings"]]
        else:
            nf["coords"] = tr(np.atleast_2d(ft["coords"]))
        out.append(nf)

    if output_path.lower().endswith((".geojson", ".json")):
        fc = {"type": "FeatureCollection",
              "crs": {"type": "name", "properties": {"name": dst_crs}},
              "features": [{"type": "Feature",
                            "geometry": _geojson_geometry(ft),
                            "properties": at}
                           for ft, at in zip(out, attrs)]}
        tmp = output_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(fc, f)
        os.replace(tmp, output_path)
        return len(out)
    from ..io.gpkg import write_feature_geopackage
    return write_feature_geopackage(out, attrs, output_path, crs=dst_crs,
                                    layer_name=layer or "data", grid=grid)


# ---------------------------------------------------------------------------
# Explicit planar project + clip (reference rhpxutils.py:228-238:
# project_and_clip_to_rhealpix = fiona transform -> shapely intersection with
# the unfolded-cube boundary).  Here: the same pointwise projection through
# the lonlat hub, then Sutherland-Hodgman clipping of every ring against each
# of the six resolution-0 face squares — intersection-with-a-union as the
# union of per-face intersections (the faces are disjoint up to shared
# edges), no geometry library needed.
# ---------------------------------------------------------------------------

def rhealpix_face_boxes(grid: GridConfig = DEFAULT_GRID):
    """The six resolution-0 face squares of the unfolded cube as planar
    (xmin, ymin, xmax, ymax) — the reference's planar_boundary
    (rhpxutils.py:218-226) as boxes instead of a shapely union."""
    from ..core.rhpx import F
    x0, ytop = grid.face_origins()
    return [(float(x0[i]), float(ytop[i] - F), float(x0[i] + F),
             float(ytop[i])) for i in range(6)]


def clip_ring_to_box(ring: np.ndarray, box) -> np.ndarray:
    """Sutherland-Hodgman clip of a closed ring (n, 2) against an
    axis-aligned box.  Returns the clipped ring (m, 2), possibly empty.
    Convex clip region -> a simple ring stays simple."""
    xmin, ymin, xmax, ymax = box
    pts = np.asarray(ring, dtype=np.float64)
    if pts.shape[0] >= 2 and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    for axis, sign, bound in ((0, 1, xmax), (0, -1, xmin),
                              (1, 1, ymax), (1, -1, ymin)):
        if pts.shape[0] == 0:
            break
        inside = sign * pts[:, axis] <= sign * bound + 1e-9
        out = []
        n = pts.shape[0]
        for i in range(n):
            j = (i + 1) % n
            a, b = pts[i], pts[j]
            if inside[i]:
                out.append(a)
            if inside[i] != inside[j]:
                t = (bound - a[axis]) / (b[axis] - a[axis])
                out.append(a + t * (b - a))
        pts = np.array(out, dtype=np.float64) if out \
            else np.zeros((0, 2), np.float64)
    return pts


def _ring_area(ring: np.ndarray) -> float:
    if ring.shape[0] < 3:
        return 0.0
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, -1))
                           - np.dot(y, np.roll(x, -1))))


def project_and_clip_to_rhealpix(geom: dict, input_crs: str = "geographic",
                                 grid: GridConfig = DEFAULT_GRID) -> dict:
    """GeoJSON Polygon/MultiPolygon -> GeoJSON MultiPolygon in planar
    rHEALPix coordinates, clipped to the unfolded cube (reference
    rhpxutils.project_and_clip_to_rhealpix).  One output polygon per
    (input polygon, face) pair with a non-empty outer ring; each hole is
    clipped to the same face, so even-odd containment over the output
    equals the clipped even-odd containment of the input within every
    face."""
    from .warp import _crs_funcs
    from ..core.rhpx import project_fwd

    if input_crs in ("geographic", None):
        def fwd(x, y):
            return project_fwd(x, y, grid)
    elif input_crs == "rhealpix":
        def fwd(x, y):
            return x, y
    else:
        pf, pi = _crs_funcs(input_crs, grid)
        def fwd(x, y):
            lon, lat = pi(np.asarray(x, np.float64),
                          np.asarray(y, np.float64))
            return project_fwd(lon, lat, grid)

    if geom.get("type") == "Polygon":
        polys = [geom["coordinates"]]
    elif geom.get("type") == "MultiPolygon":
        polys = list(geom["coordinates"])
    else:
        raise NotImplementedError(
            f"project_and_clip_to_rhealpix: geometry type "
            f"{geom.get('type')!r} (Polygon/MultiPolygon)")

    boxes = rhealpix_face_boxes(grid)
    out = []
    for rings in polys:
        planar = []
        for r in rings:
            arr = np.asarray(r, dtype=np.float64)
            x, y = fwd(arr[:, 0], arr[:, 1])
            planar.append(np.column_stack([np.asarray(x, np.float64),
                                           np.asarray(y, np.float64)]))
        for box in boxes:
            outer = clip_ring_to_box(planar[0], box)
            if _ring_area(outer) <= 0.0:
                continue
            piece = [np.vstack([outer, outer[:1]]).tolist()]
            for hole in planar[1:]:
                hc = clip_ring_to_box(hole, box)
                if _ring_area(hc) > 0.0:
                    piece.append(np.vstack([hc, hc[:1]]).tolist())
            out.append(piece)
    return {"type": "MultiPolygon", "coordinates": out}
