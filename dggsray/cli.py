"""CLI mirroring the reference's seven typer commands
(/root/reference/dggstools/__main__.py:34-229) on this engine's formats:
rasters are GeoTIFFs (stdlib tiffio), vector inputs are GeoJSON files, cell
tables are parquet directories with a _meta.json sidecar.

    python -m dggsray ras-to-rhpx-ras IN.tif OUT.tif [--rdggs 3/1/0 ...]
    python -m dggsray vec-to-rhpx-ras IN.geojson OUT.tif ...
    python -m dggsray vec-ras-area-error IN.geojson RASTER.tif ...
    python -m dggsray ras-rhpx-to-vec-rhpx IN.tif OUT_DIR ...
    python -m dggsray vec-rhpx-to-ras-rhpx IN_DIR OUT.tif ...
    python -m dggsray print-ras-rhpx-metadata IN.tif
    python -m dggsray print-vec-rhpx-metadata IN_DIR

Plus one engine-native command beyond the reference's surface:

    python -m dggsray corpus-dedup DOCS_DIR OUT_DIR [--threshold 0.5]
        near-dedup the documents corpus (minhash pairs -> connected
        components -> one representative per cluster), writing the kept
        corpus as parquet plus a stats.json.

Each command prints "OK" on success (the reference's script tests grep for it,
tests/script_tests/tests_rhpx_scripts.py:51-95).
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def parse_rdggs(s: str):
    from .core.rhpx import GridConfig
    n, ns, ss = (int(x) for x in s.split("/"))
    return GridConfig(n, ns, ss)


def _load_geojson_features(path: str, property_for_class: str | None,
                           fixed_value: int,
                           geom_types=("Polygon", "MultiPolygon"),
                           layer: str | None = None):
    """Vector file -> engine feature dicts (rings in lonlat).  GeoJSON
    FeatureCollections and ESRI Shapefiles (io.shapefile, UTM .prj handled)
    are accepted; MultiPolygon parts become separate rings of one feature."""
    from .ops.vector2dggs import feature_class_values

    if path.lower().endswith(".gpkg"):
        from .io.gpkg import read_geopackage_features
        return read_geopackage_features(
            path, layer=layer, property_for_class=property_for_class,
            fixed_value=fixed_value)
    if path.lower().endswith(".shp"):
        from .io.shapefile import read_shapefile
        feats, attrs, _crs = read_shapefile(path)
        # filter geometry-less features WITH their attrs (pairing is by
        # position; slicing attrs would shift every later class value)
        kept = [(f, a) for f, a in zip(feats, attrs)
                if "rings" in f or "coords" in f]
        feats = [f for f, _ in kept]
        if property_for_class is not None:
            classes = [a[property_for_class] for _, a in kept]
        else:
            classes = [int(fixed_value)] * len(feats)
        values = feature_class_values(classes)
        for ft, v in zip(feats, values):
            ft["value"] = int(v)
        return feats

    with open(path) as f:
        gj = json.load(f)
    feats, classes = [], []
    for i, f in enumerate(gj["features"]):
        g = f["geometry"]
        assert g["type"] in geom_types, \
            f"geometry type {g['type']} not allowed here"
        rings = []
        if g["type"] == "Polygon":
            rings = [np.asarray(r, dtype=np.float64) for r in g["coordinates"]]
        elif g["type"] == "MultiPolygon":
            for poly in g["coordinates"]:
                rings.extend(np.asarray(r, dtype=np.float64) for r in poly)
        elif g["type"] == "LineString":
            feats.append({"feature_id": i, "coords":
                          np.asarray(g["coordinates"], dtype=np.float64)})
        elif g["type"] == "MultiLineString":
            feats.append({"feature_id": i, "coords": np.vstack(
                [np.asarray(c, dtype=np.float64) for c in g["coordinates"]])})
        if g["type"] in ("Polygon", "MultiPolygon"):
            feats.append({"feature_id": i, "rings": rings})
        if property_for_class is not None:
            classes.append(f.get("properties", {})[property_for_class])
        else:
            classes.append(int(fixed_value))
    values = feature_class_values(classes)
    for ft, v in zip(feats, values):
        ft["value"] = int(v)
    return feats


_RAY_OWNED = {"v": False}


def _ray_init():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
        _RAY_OWNED["v"] = True
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="dggsray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_common(sp):
        sp.add_argument("--rdggs", default="3/1/0",
                        help="N_side/north_square/south_square")

    sp = sub.add_parser("ras-to-rhpx-ras")
    sp.add_argument("input"), sp.add_argument("output")
    add_common(sp)
    sp.add_argument("--dst-resolution-idx", type=int, default=-1)
    sp.add_argument("--rescaling-strategy", default="closest",
                    choices=["higher", "lower", "closest"])
    sp.add_argument("--input-crs", default="geographic",
                    help="geographic | rhealpix | utm:NNh (e.g. utm:30N) | "
                         "epsg:326NN/327NN | albers | webmerc/epsg:3857 | "
                         "lcc:lat1,lat2,lat0,lon0[,fe,fn] | epsg:3413/3031 | "
                         "ups:N/S | pstereo:lat_ts,lon0[,fe,fn] | sinu | "
                         "auto (read the CRS embedded in the file: ERDAS "
                         ".img, GeoTIFF GeoKeys, JPEG PAM/world-file)")
    sp.add_argument("--resampling", default="nearest",
                    choices=["nearest", "bilinear", "cubic", "cubic_spline",
                             "lanczos"])
    sp.add_argument("--src-nodata", type=float, default=None)
    sp.add_argument("--dst-nodata", type=float, default=None)

    sp = sub.add_parser("vec-to-rhpx-ras")
    sp.add_argument("input"), sp.add_argument("output")
    add_common(sp)
    sp.add_argument("--dst-resolution-idx", type=int, default=-1)
    sp.add_argument("--property-for-class", default=None)
    sp.add_argument("--fixed-value", type=int, default=1)
    sp.add_argument("--nodata", type=float, default=0)
    sp.add_argument("--layer", default=None,
                    help="GeoPackage layer name (default: first feature layer)")
    sp.add_argument("--all-touched", action="store_true",
                    help="burn every cell the geometry touches, not just "
                         "cells whose center is covered (reference "
                         "vector_to_rhpx.py all_touched)")

    sp = sub.add_parser("vec-ras-area-error")
    sp.add_argument("vector"), sp.add_argument("raster")
    add_common(sp)
    sp.add_argument("--property-for-class", default=None)
    sp.add_argument("--fixed-value", type=int, default=1)

    sp = sub.add_parser("ras-rhpx-to-vec-rhpx")
    sp.add_argument("input"), sp.add_argument("output")
    add_common(sp)
    sp.add_argument("--geo-id-column-name", default="cellid")
    sp.add_argument("--layer-name", default="data",
                    help="output GeoPackage layer name")
    sp.add_argument("--add-uid", action="store_true")
    sp.add_argument("--values-in-json", action="store_true")
    sp.add_argument("--store-nodata", action="store_true")

    sp = sub.add_parser("vec-rhpx-to-ras-rhpx")
    sp.add_argument("input"), sp.add_argument("output")
    add_common(sp)
    sp.add_argument("--nodata", type=float, default=0)

    sp = sub.add_parser("print-ras-rhpx-metadata")
    sp.add_argument("input")
    add_common(sp)

    sp = sub.add_parser("print-vec-rhpx-metadata")
    sp.add_argument("input")

    sp = sub.add_parser(
        "corpus-dedup",
        help="near-dedup a documents corpus: minhash pairs -> connected "
             "components -> write the retained corpus + stats JSON")
    sp.add_argument("input", help="directory holding documents.parquet")
    sp.add_argument("output", help="output directory for kept parquet")
    sp.add_argument("--threshold", type=float, default=0.5)

    args = p.parse_args(argv)
    grid = parse_rdggs(getattr(args, "rdggs", "3/1/0"))

    if args.cmd == "ras-to-rhpx-ras":
        from .ops.warp import RescalingStrategy, raster_to_rhealpix
        res = raster_to_rhealpix(
            args.input, args.output, grid, args.dst_resolution_idx,
            RescalingStrategy(args.rescaling_strategy), args.input_crs,
            args.resampling, args.src_nodata, args.dst_nodata)
        print(f"dst_resolution_idx: {res}")
    elif args.cmd == "vec-to-rhpx-ras":
        _ray_init()
        import ray.data as rd
        from .ops.cells2raster import cells_to_raster_array, meta_from_cells
        from .ops.vector2dggs import burn_polygons_to_cells
        from .core.tiffio import GeoTiff, write_geotiff
        feats = _load_geojson_features(args.input, args.property_for_class,
                                       args.fixed_value,
                                       layer=getattr(args, "layer", None))
        res = args.dst_resolution_idx
        if res == -1:
            # reference sizes the intermediate raster from the bbox
            # (vector_to_rhpx.py:124-136); equivalent default here: pick the
            # closest resolution to 1/1000 of the bbox diagonal
            from .core.geodesy import get_geodesic_size
            allpts = np.vstack([r for f in feats for r in f["rings"]])
            diag, _ = get_geodesic_size(allpts[:, 0].min(), allpts[:, 1].max(),
                                        allpts[:, 0].max(), allpts[:, 1].min(),
                                        1000, 1000)
            res = grid.get_closest_resolution(diag / 1000)[0]
        cells = burn_polygons_to_cells(feats, res, grid,
                                       all_touched=args.all_touched) \
            .rename_columns(["cellid", "band1"])
        ds = rd.from_arrow(cells)
        meta = meta_from_cells(
            cells.column("cellid").to_numpy(zero_copy_only=False), grid,
            nodata=args.nodata, dtype="uint16")
        arr, _ = cells_to_raster_array(ds, meta=meta, grid=grid)
        write_geotiff(args.output, GeoTiff(
            arr.astype(np.uint16), meta["left"], meta["top"], meta["res"],
            meta["res"], nodata=args.nodata,
            tags={"GDAL_METADATA": f'<GDALMetadata><Item name="n_side">'
                                   f'{grid.n_side}</Item></GDALMetadata>'}))
        print(f"dst_resolution_idx: {res}")
    elif args.cmd == "vec-ras-area-error":
        _ray_init()
        import ray.data as rd
        from .ops.metrics import vector_raster_area_error
        from .ops.raster2dggs import geotiff_to_tiles, tiles_to_cells
        feats = _load_geojson_features(args.vector, args.property_for_class,
                                       args.fixed_value)
        tiles, meta = geotiff_to_tiles(args.raster, grid)
        cells = tiles_to_cells(tiles, meta, grid) \
            .rename_columns({"band1": "value"})
        rmse, bias, tv, tc = vector_raster_area_error(
            feats, cells, meta["res_idx"], grid)
        print(f"RMSE: {rmse:.0f}")
        print(f"BIAS: {bias:.0f}")
        print(f"total_vector_area: {tv:.0f}")
        print(f"total_cells_area: {tc:.0f}")
    elif args.cmd == "ras-rhpx-to-vec-rhpx":
        _ray_init()
        if args.output.endswith(".gpkg"):
            from .io.gpkg import rhealpix_to_geopackage
            rhealpix_to_geopackage(args.input, args.output, grid.n_side,
                                   args.geo_id_column_name,
                                   layer_name=args.layer_name,
                                   add_uid=args.add_uid,
                                   values_in_json=args.values_in_json,
                                   store_nodata=args.store_nodata,
                                   grid=grid)
        else:
            from .io.storage import rhealpix_to_parquet
            rhealpix_to_parquet(args.input, args.output, grid.n_side,
                                args.geo_id_column_name, args.add_uid,
                                args.values_in_json, args.store_nodata,
                                grid=grid)
    elif args.cmd == "vec-rhpx-to-ras-rhpx":
        _ray_init()
        if args.input.endswith(".gpkg"):
            from .io.gpkg import geopackage_to_rhealpix
            geopackage_to_rhealpix(args.input, args.output, args.nodata,
                                   grid.n_side, grid=grid)
        else:
            from .io.storage import parquet_to_rhealpix
            parquet_to_rhealpix(args.input, args.output, args.nodata,
                                grid.n_side, grid=grid)
    elif args.cmd == "print-ras-rhpx-metadata":
        from .core.raster import raster_subdatasets
        from .ops.warp import get_rhpx_metadata
        subs = raster_subdatasets(args.input)
        if subs:        # gdalinfo-style listing for NetCDF containers
            print({"subdatasets": subs})
        print(get_rhpx_metadata(args.input, grid.n_side))
    elif args.cmd == "print-vec-rhpx-metadata":
        if args.input.endswith(".gpkg"):
            from .io.gpkg import get_gpkg_rhpx_metadata
            print(get_gpkg_rhpx_metadata(args.input))
        else:
            from .io.storage import get_parquet_rhpx_metadata
            print(get_parquet_rhpx_metadata(args.input))
    elif args.cmd == "corpus-dedup":
        _ray_init()
        import os

        from .pipelines.relational import (docs_retained_after_dedup,
                                           docs_dup_components)
        kept = docs_retained_after_dedup(args.input,
                                         threshold=args.threshold)
        os.makedirs(args.output, exist_ok=True)
        kept.write_parquet(os.path.join(args.output, "kept"))
        comp = docs_dup_components(args.input, threshold=args.threshold)
        n_kept = kept.count()
        n_comp_rows = comp.count()
        import pyarrow.parquet as _pq
        n_docs = _pq.read_metadata(
            os.path.join(args.input, "documents.parquet")).num_rows
        stats = {"n_docs": int(n_docs), "n_kept": int(n_kept),
                 "n_dropped": int(n_docs - n_kept),
                 "n_clustered_docs": int(n_comp_rows),
                 "threshold": args.threshold}
        with open(os.path.join(args.output, "stats.json"), "w") as f:
            json.dump(stats, f)
        print(json.dumps(stats))
    print("OK")
    try:
        import ray
        # only tear down a session THIS process opened — an embedding
        # caller (tests, a driver) owns its own session lifecycle
        if _RAY_OWNED["v"] and ray.is_initialized():
            ray.shutdown()
            _RAY_OWNED["v"] = False
    except ImportError:
        pass
    return 0


def main_safe(argv=None):
    """CLI entry with the reference's error style: catch, print message, exit 1
    (reference __main__.py:67-72)."""
    try:
        return main(argv)
    except SystemExit:
        raise
    except Exception as ex:
        print(f"ERROR: {type(ex).__name__}: {ex}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main_safe())
