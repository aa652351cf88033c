"""cells -> raster: scatter cell rows back onto the aligned lattice.

Ray-Data-native re-expression of the reference's geodataframe_to_rhealpix_file
(/root/reference/dggstools/rhpx/rhpx_gdf_helper.py:261-335: rebuild the transform
from the table metadata, force the exact cell width, prefill nodata, scatter each
row at rowcol(centroid)) and rhealpix_data_frame_to_geodataframe (:368-445: derive
bounds from cell vertices, res from cell_width, floor-based height/width with a
min of 1).

Distributed layout: the raster is a Dataset of TILE rows
    {tile_row:int32, tile_col:int32, h:int32, w:int32, data:binary}
keyed by tile id; the scatter is a groupby(tile).map_groups — the shuffle key is
the cellid prefix in disguise (tiles nest in coarser cells because tile size is a
multiple of the cell width).  assemble_array() materializes small rasters to numpy
(driver-side, test/CLI use only)."""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..core.rhpx import DEFAULT_GRID, GridConfig, cell_centroid, cell_ul_vertex
from .joins import join_partitions

DEFAULT_TILE = 512  # cells per tile side


def _meta_from_bounds(minx: float, maxx: float, miny: float, maxy: float,
                      res_idx: int, grid: GridConfig, nodata, nbands: int,
                      dtype: str) -> dict:
    res = grid.cell_width(res_idx)
    left, right = float(minx), float(maxx + res)
    top, bottom = float(maxy), float(miny - res)
    height = max(1, math.floor((top - bottom) / res))
    width = max(1, math.floor((right - left) / res))
    return {"left": left, "top": top, "right": right, "bottom": bottom,
            "height": height, "width": width, "res": res, "res_idx": res_idx,
            "nbands": nbands, "nodata": nodata, "nodatavals": [nodata] * nbands,
            "store_nodata": nodata is not None, "dtypes": [dtype] * nbands,
            "rhealpixdggs": grid.to_meta()}


def meta_from_cells(cellids, grid: GridConfig = DEFAULT_GRID, nodata=None,
                    nbands: int = 1, dtype: str = "int16") -> dict:
    """Derive the raster metadata dict (the reference's gdf.attrs) from a cellid
    collection — bounds from cell vertices, floor-based height/width (>=1)."""
    cellids = np.asarray(cellids, dtype="U")
    res_idx = len(cellids[0]) - 1
    ulx, uly = cell_ul_vertex(cellids, grid)
    return _meta_from_bounds(ulx.min(), ulx.max(), uly.min(), uly.max(),
                             res_idx, grid, nodata, nbands, dtype)


def meta_from_cells_ds(ds, grid: GridConfig = DEFAULT_GRID,
                       cell_col: str = "cellid", nodata=None,
                       nbands: int = 1, dtype: str = "int16") -> dict:
    """Distributed twin of `meta_from_cells`: per-block vertex-extent
    partials folded by one in-plan Min/Max aggregate — the driver sees
    five scalars, never the cellid column (which scales with the
    raster)."""
    import pyarrow as pa
    from ray.data.aggregate import Max, Min

    def partial(b: pa.Table) -> pa.Table:
        cells = b.column(cell_col).to_numpy(zero_copy_only=False) \
            .astype("U")
        if cells.size == 0:
            return pa.table({"_minx": pa.array([], pa.float64()),
                             "_maxx": pa.array([], pa.float64()),
                             "_miny": pa.array([], pa.float64()),
                             "_maxy": pa.array([], pa.float64()),
                             "_len": pa.array([], pa.int64())})
        ulx, uly = cell_ul_vertex(cells, grid)
        return pa.table({"_minx": [float(ulx.min())],
                         "_maxx": [float(ulx.max())],
                         "_miny": [float(uly.min())],
                         "_maxy": [float(uly.max())],
                         "_len": [int(len(cells[0]))]})

    agg = ds.select_columns([cell_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .aggregate(Min("_minx"), Max("_maxx"), Min("_miny"), Max("_maxy"),
                   Max("_len"))
    return _meta_from_bounds(agg["min(_minx)"], agg["max(_maxx)"],
                             agg["min(_miny)"], agg["max(_maxy)"],
                             int(agg["max(_len)"]) - 1, grid, nodata,
                             nbands, dtype)


def cells_to_tiles(ds, meta: dict, grid: GridConfig = DEFAULT_GRID,
                   cell_col: str = "cellid", tile: int = DEFAULT_TILE):
    """Cell-table Dataset -> tile-row Dataset.  Exact-resolution contract of the
    reference (rhpx_gdf_helper.py:292-298): the lattice step IS cell_width(res_idx);
    rows whose centroid falls outside the target window are dropped (they would be
    out-of-range rowcol writes)."""
    from ray.data.aggregate import Max  # noqa: F401  (import kept close to groupby use)

    res = meta["res"]
    left, top = meta["left"], meta["top"]
    H, W = meta["height"], meta["width"]
    nbands = meta["nbands"]
    dtype = np.dtype(meta["dtypes"][0])
    band_cols = [f"band{i + 1}" for i in range(nbands)]

    def to_rowcol(b: pa.Table) -> pa.Table:
        cells = b.column(cell_col).to_numpy(zero_copy_only=False)
        cx, cy = cell_centroid(cells, grid)
        col = np.floor((cx - left) / res).astype(np.int64)
        row = np.floor((top - cy) / res).astype(np.int64)
        ok = (row >= 0) & (row < H) & (col >= 0) & (col < W)
        cols = {"row": pa.array(row[ok]), "col": pa.array(col[ok]),
                "tile_id": pa.array((row[ok] // tile) * ((W // tile) + 1)
                                    + (col[ok] // tile))}
        for bc in band_cols:
            cols[bc] = b.column(bc).filter(pa.array(ok))
        return pa.table(cols)

    def scatter(g: pa.Table) -> pa.Table:
        tid = g.column("tile_id")[0].as_py()
        trow, tcol = tid // ((W // tile) + 1), tid % ((W // tile) + 1)
        h = min(tile, H - trow * tile)
        w = min(tile, W - tcol * tile)
        arr = np.full((nbands, h, w), meta["nodata"] if meta["nodata"] is not None
                      else 0, dtype=dtype)
        r = g.column("row").to_numpy() - trow * tile
        c = g.column("col").to_numpy() - tcol * tile
        for i, bc in enumerate(band_cols):
            arr[i, r, c] = g.column(bc).to_numpy().astype(dtype)
        return pa.table({"tile_row": pa.array([trow], pa.int32()),
                         "tile_col": pa.array([tcol], pa.int32()),
                         "h": pa.array([h], pa.int32()),
                         "w": pa.array([w], pa.int32()),
                         "data": pa.array([arr.tobytes()], pa.binary())})

    return ds.map_batches(to_rowcol, batch_format="pyarrow") \
             .groupby("tile_id").map_groups(scatter, batch_format="pyarrow")


def assemble_array(tiles_ds, meta: dict, tile: int = DEFAULT_TILE) -> np.ndarray:
    """Materialize a (small) tile Dataset into one (bands, H, W) array."""
    H, W, nbands = meta["height"], meta["width"], meta["nbands"]
    dtype = np.dtype(meta["dtypes"][0])
    fill = meta["nodata"] if meta["nodata"] is not None else 0
    out = np.full((nbands, H, W), fill, dtype=dtype)
    for row in tiles_ds.iter_rows():
        tr, tc, h, w = row["tile_row"], row["tile_col"], row["h"], row["w"]
        arr = np.frombuffer(row["data"], dtype=dtype).reshape(nbands, h, w)
        out[:, tr * tile: tr * tile + h, tc * tile: tc * tile + w] = arr
    return out


def cells_to_raster_array(ds, meta: dict | None = None,
                          grid: GridConfig = DEFAULT_GRID,
                          cell_col: str = "cellid",
                          nodata=0) -> tuple[np.ndarray, dict]:
    """Convenience: cell-table Dataset -> (array, meta), deriving meta from the
    cells when not given (reference DataFrame->raster path)."""
    if meta is None:
        nbands = sum(1 for c in ds.schema().names if c.startswith("band"))
        first_band_type = ds.schema().types[ds.schema().names.index("band1")]
        meta = meta_from_cells_ds(ds, grid, cell_col, nodata=nodata,
                                  nbands=max(1, nbands),
                                  dtype=first_band_type
                                  .to_pandas_dtype().__name__)
    tiles = cells_to_tiles(ds, meta, grid, cell_col)
    return assemble_array(tiles, meta), meta


def grid_cells_for_bbox(nw: tuple, se: tuple, res: int,
                        grid: GridConfig = DEFAULT_GRID, as_geodetic: bool = True):
    """All cells of resolution `res` whose centroids fall inside the geodetic
    bbox (nw=(lon,lat), se=(lon,lat)) — the reference's
    rhealpix_grid_as_geodataframe (rhpx_gdf_helper.py:337-366) as a Dataset of
    (cellid, centroid lon/lat or planar x/y).  Enumeration is lattice-driven:
    project the bbox, walk the aligned lattice per planar region, keep centroids
    whose inverse projection is inside the bbox."""
    import ray.data as rd

    from ..core.rhpx import project_fwd, project_inv, align_point

    lon_w, lat_n = nw
    lon_e, lat_s = se
    cw = grid.cell_width(res)
    # sample the bbox boundary to get per-region planar extents
    n = 64
    bx = np.concatenate([np.linspace(lon_w, lon_e, n)] * 2 + [np.full(n, lon_w),
                                                              np.full(n, lon_e)])
    by = np.concatenate([np.full(n, lat_n), np.full(n, lat_s),
                         np.linspace(lat_s, lat_n, n), np.linspace(lat_s, lat_n, n)])
    px, py = project_fwd(bx, by, grid)
    from ..core.rhpx import F as _F
    region = np.where(py > _F / 2, 0, np.where(py < -_F / 2, 2, 1))
    tabs = []
    for reg in np.unique(region):
        m = region == reg
        left, top = align_point(px[m].min() - cw, py[m].max() + cw, res, grid)
        ncols = max(1, math.ceil((px[m].max() - left) / cw) + 1)
        nrows = max(1, math.ceil((top - py[m].min()) / cw) + 1)
        jj, ii = np.meshgrid(np.arange(ncols), np.arange(nrows))
        xs = left + (jj.ravel() + 0.5) * cw
        ys = top - (ii.ravel() + 0.5) * cw
        lon, lat = project_inv(xs, ys, grid)
        keep = (lon >= lon_w) & (lon <= lon_e) & (lat >= lat_s) & (lat <= lat_n)
        if not keep.any():
            continue
        from ..core.rhpx import cell_from_point
        cells = cell_from_point(res, xs[keep], ys[keep], grid)
        ok = cells != ""
        if as_geodetic:
            tabs.append(pa.table({"cellid": pa.array(cells[ok], pa.string()),
                                  "lon": pa.array(lon[keep][ok]),
                                  "lat": pa.array(lat[keep][ok])}))
        else:
            tabs.append(pa.table({"cellid": pa.array(cells[ok], pa.string()),
                                  "x": pa.array(xs[keep][ok]),
                                  "y": pa.array(ys[keep][ok])}))
    if not tabs:
        empty = {"cellid": pa.array([], pa.string())}
        return rd.from_arrow(pa.table(empty))
    t = pa.concat_tables(tabs)
    # cells straddling region boundaries can appear twice (padded lattices)
    import pyarrow.compute as pc
    t = t.group_by("cellid").aggregate(
        [(c, "min") for c in t.column_names if c != "cellid"])
    t = t.rename_columns(["cellid"] + [c for c in (["lon", "lat"] if as_geodetic
                                                   else ["x", "y"])])
    return rd.from_arrow(t)


def update_cells_from_tiles(original_ds, tiles_ds, meta: dict,
                            grid: GridConfig = DEFAULT_GRID):
    """Refresh band values of an existing cell table from a (modified) raster —
    the reference's rhealpix_file_to_geodataframe_update fast path
    (rhpx_gdf_helper.py:189-258: extents must match; requires the original to
    have been built with store_nodata so every pixel has a row).  Implemented as
    a cellid join: re-explode the raster and inner-join onto the original's
    cellids, keeping the original row order irrelevant (cell tables are sets)."""
    from .raster2dggs import tiles_to_cells

    assert meta.get("store_nodata"), \
        "store_nodata must be True for the original cell table (reference " \
        "rhpx_gdf_helper.py:207-208)"
    fresh = tiles_to_cells(tiles_ds, meta, grid, store_nodata=True)
    keep_cols = [c for c in original_ds.schema().names
                 if not c.startswith("band")]
    base = original_ds.select_columns(keep_cols) if keep_cols != ["cellid"] \
        else original_ds.select_columns(["cellid"])
    return base.join(fresh, join_type="inner", on=("cellid",), num_partitions=join_partitions())
