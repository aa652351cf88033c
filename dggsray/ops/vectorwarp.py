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
