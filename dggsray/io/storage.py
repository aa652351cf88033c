"""Cell-table persistence: partitioned parquet + `_meta.json` sidecar carrying the
table-level metadata dict (the reference persists the same dict as a JSON row in
a GeoPackage gpkg_metadata table with uri http://www.iaaa.es/geo2dggs/spec/1 —
/root/reference/dggstools/rhpx/utils/storage.py:32-113).  Parquet is the
distributed-native format; REAL GeoPackage read/write (stdlib sqlite3 +
hand-built GPKG binary geometry, same metadata rows) lives in io.gpkg.
PostGIS remains out of scope (no network/DB in this environment)."""
from __future__ import annotations

import json
import os

import numpy as np

META_SPEC_URI = "http://www.iaaa.es/geo2dggs/spec/1"


class _NpEncoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        return super().default(o)


def write_cell_table(ds, path: str, meta: dict, fmt: str = "parquet",
                     partition_depth: int | None = None,
                     cell_col: str = "cellid"):
    """Dataset (or pyarrow Table) + metadata -> parquet/feather directory +
    sidecar.  Feather (= Arrow IPC file) is written one file per block INSIDE
    the map tasks — distributed, no driver materialization (reference feather
    output: tests_data.py:325-326 via GeoDataFrame.to_feather).

    partition_depth=N hive-partitions the parquet output by the cell-id
    prefix of length N+1 (face char + N digits) — the resumable-output
    layout for huge cell tables: each key-range directory is a unit a
    re-run can skip (`finished_partitions`), a reader can prune, and a
    downstream cell-keyed stage can consume shuffle-free.  The prefix
    column is materialized per batch (vectorized slice) and dropped again
    on read."""
    import pyarrow as pa
    import pyarrow.feather as paf
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    if fmt == "parquet":
        if partition_depth is not None:
            import pyarrow.compute as pc

            def add_part(b: pa.Table) -> pa.Table:
                part = pc.utf8_slice_codeunits(
                    pc.cast(b.column(cell_col), pa.string()), 0,
                    partition_depth + 1)
                return b.append_column("cell_part", part)

            if isinstance(ds, pa.Table):
                import ray.data as rd
                ds = rd.from_arrow(ds)
            ds.map_batches(add_part, batch_format="pyarrow") \
                .write_parquet(path, partition_cols=["cell_part"])
        elif isinstance(ds, pa.Table):
            pq.write_table(ds, os.path.join(path, "part-0.parquet"))
        else:
            ds.write_parquet(path)
    elif fmt == "feather":
        if isinstance(ds, pa.Table):
            paf.write_feather(ds, os.path.join(path, "part-0.feather"))
        else:
            def write_block(b: pa.Table) -> pa.Table:
                import uuid
                name = f"part-{uuid.uuid4().hex}.feather"
                paf.write_feather(b, os.path.join(path, name))
                return pa.table({"file": pa.array([name], pa.string()),
                                 "rows": pa.array([b.num_rows], pa.int64())})
            manifest = ds.map_batches(write_block, batch_format="pyarrow",
                                      batch_size=None).take_all()
            with open(os.path.join(path, "_manifest.json"), "w") as f:
                json.dump(sorted(r["file"] for r in manifest), f)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump({"spec": META_SPEC_URI, "attrs": meta, "format": fmt,
                   "partition_depth": partition_depth}, f, cls=_NpEncoder)


def finished_partitions(path: str) -> list[str]:
    """Cell-prefix partitions already present in a hive-partitioned cell
    table (directories `cell_part=<prefix>` containing at least one parquet
    file) — the resume primitive: a restarted writer filters its input to
    `~cellid.prefix in finished_partitions(out)` and appends only the
    missing key ranges."""
    import glob
    out = []
    for d in sorted(glob.glob(os.path.join(path, "cell_part=*"))):
        if glob.glob(os.path.join(d, "*.parquet")):
            out.append(os.path.basename(d).split("=", 1)[1])
    return out


def read_cell_table(path: str):
    """-> (Dataset, meta dict); reads parquet or feather per the sidecar.
    Scheme-qualified paths (s3://...) resolve through the same
    register_filesystem seam as rasters — the fetcher localizes the whole
    table directory."""
    import glob

    import ray.data as rd

    from ..core.raster import localize_path
    path = localize_path(path)
    with open(os.path.join(path, "_meta.json")) as f:
        side = json.load(f)
    meta = side["attrs"]
    if side.get("format", "parquet") == "feather":
        files = sorted(glob.glob(os.path.join(path, "*.feather")))
        return _read_feather(files), meta
    if side.get("partition_depth") is not None:
        ds = rd.read_parquet(path)     # hive layout: ray derives cell_part
        if "cell_part" in ds.schema().names:
            ds = ds.drop_columns(["cell_part"])
        return ds, meta
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    return rd.read_parquet(files), meta


def _read_feather(files: list[str]):
    """Distributed feather read: binary-file source + per-task IPC decode
    (Ray Data has no feather reader; feather v2 is the Arrow IPC file format,
    so each task deserializes its file zero-copy)."""
    import pyarrow as pa
    import ray.data as rd

    def decode(b: pa.Table) -> pa.Table:
        import pyarrow.ipc as ipc
        tabs = [ipc.open_file(pa.BufferReader(blob)).read_all()
                for blob in b.column("bytes").to_pylist()]
        return pa.concat_tables(tabs)

    return rd.read_binary_files(files).map_batches(
        decode, batch_format="pyarrow", batch_size=1)


def get_parquet_rhpx_metadata(path: str) -> dict:
    """Reference get_gpkg_rhpx_metadata analogue (storage.py:100-113)."""
    from ..core.raster import localize_path
    with open(os.path.join(localize_path(path), "_meta.json")) as f:
        return json.load(f)["attrs"]


def rhealpix_to_parquet(input_tif: str, output_path: str, n_side: int = 3,
                        geo_id_column_name: str = "cellid", add_uid: bool = False,
                        values_in_json: bool = False, store_nodata: bool = False,
                        grid=None):
    """Composite: rHPX raster file -> cell table parquet (+ metadata), the
    reference's rhealpix_to_geopackage (storage.py:71-83) on our formats.
    `grid` carries the FULL GridConfig (north/south cap squares included);
    the bare n_side remains for callers on the default (n, 1, 0) grid."""
    from ..core.rhpx import GridConfig
    from ..ops.raster2dggs import geotiff_to_tiles, tiles_to_cells

    grid = grid or GridConfig(n_side, 1, 0)
    tiles, meta = geotiff_to_tiles(input_tif, grid)
    cells = tiles_to_cells(tiles, meta, grid, store_nodata=store_nodata,
                           values_in_json=values_in_json, add_uid=add_uid)
    if geo_id_column_name != "cellid":
        cells = cells.rename_columns({"cellid": geo_id_column_name})
        meta = dict(meta, geo_id_column_name=geo_id_column_name)
    write_cell_table(cells, output_path, meta)
    return meta


def parquet_to_rhealpix(input_path: str, output_tif: str, nodata=0,
                        n_side: int = 3, grid=None):
    """Composite inverse: cell-table parquet -> rHPX raster file
    (reference geopackage_to_rhealpix, storage.py:86-97)."""
    import json as _json

    from ..core.rhpx import GridConfig
    from ..core.tiffio import GeoTiff, write_geotiff
    from ..ops.cells2raster import cells_to_raster_array

    ds, meta = read_cell_table(input_path)
    if meta.get("rhealpixdggs"):
        grid = GridConfig.from_meta(meta["rhealpixdggs"])
    elif grid is None:
        grid = GridConfig(n_side, 1, 0)
    gid = meta.get("geo_id_column_name", "cellid")
    if gid != "cellid":       # renamed on write; the raster path needs cellid
        ds = ds.rename_columns({gid: "cellid"})
    if meta.get("nodata") is None:
        meta = dict(meta, nodata=nodata, nodatavals=[nodata] * meta["nbands"])
    arr, _ = cells_to_raster_array(ds, meta=meta, grid=grid)
    write_geotiff(output_tif, GeoTiff(
        arr, meta["left"], meta["top"], meta["res"], meta["res"],
        nodata=meta["nodata"],
        tags={"GDAL_METADATA":
              f'<GDALMetadata><Item name="n_side">{grid.n_side}</Item>'
              f'<Item name="user_metadata">'
              f'{_json.dumps(meta, cls=_NpEncoder)}</Item></GDALMetadata>'}))
    return meta
