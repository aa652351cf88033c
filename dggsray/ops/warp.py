"""Whole-raster warp: geographic raster -> aligned rHEALPix raster.

Re-expression of the reference's raster_to_rhealpix chain
(/root/reference/dggstools/rhpx/raster_to_rhpx.py:134-194 + 20-130):
resolution inference (projected: min pixel size; geographic: geodesic diagonal
estimate), RescalingStrategy snap, calculate-transform + vertex-snap alignment,
right-edge clamp for geographic inputs, nearest/bilinear resampling, n_side tag
on the output.

CRS support matches this environment: inputs are either geographic WGS84 or
already in the rHEALPix plane (there is no PROJ database here; the reference
accepts any rasterio CRS).  The warp runs tiled over destination rows so memory
stays bounded regardless of output size.
"""
from __future__ import annotations

import enum
import math

import numpy as np

from ..core.geodesy import get_geodesic_size
from ..core.rhpx import DEFAULT_GRID, GridConfig, align_point, project_fwd, project_inv
from ..core.tiffio import GeoTiff, read_geotiff, write_geotiff


class RescalingStrategy(enum.Enum):
    TO_HIGHER = "higher"
    TO_LOWER = "lower"
    TO_CLOSEST = "closest"


def infer_resolution_idx(g: GeoTiff, crs: str, grid: GridConfig,
                         strategy: RescalingStrategy) -> int:
    """Reference raster_to_rhpx.py:156-190 semantics."""
    if crs == "rhealpix":
        best = min(abs(g.res_x), abs(g.res_y))
    else:
        right = g.left + g.data.shape[2] * g.res_x
        bottom = g.top - g.data.shape[1] * g.res_y
        _, best = get_geodesic_size(g.left, g.top, right, bottom,
                                    g.data.shape[2], g.data.shape[1])
    if strategy == RescalingStrategy.TO_HIGHER:
        return grid.get_closest_higher_resolution(best)[0]
    if strategy == RescalingStrategy.TO_LOWER:
        return grid.get_closest_lower_resolution(best)[0]
    return grid.get_closest_resolution(best)[0]


def raster_to_rhealpix(input_path: str, output_path: str,
                       grid: GridConfig = DEFAULT_GRID,
                       dst_resolution_idx: int = -1,
                       rescaling_strategy: RescalingStrategy = RescalingStrategy.TO_CLOSEST,
                       input_crs: str = "geographic",
                       resampling: str = "nearest",
                       src_nodata=None, dst_nodata=None,
                       row_chunk: int = 1024) -> int:
    """Returns the destination resolution index (reference contract)."""
    g = read_geotiff(input_path)
    if dst_resolution_idx == -1:
        dst_resolution_idx = infer_resolution_idx(g, input_crs, grid,
                                                  rescaling_strategy)
    cw = grid.cell_width(dst_resolution_idx)
    nbands, H, W = g.data.shape
    right = g.left + W * g.res_x
    bottom = g.top - H * g.res_y
    if input_crs == "geographic":
        # right-edge clamp (reference raster_to_rhpx.py:63-68)
        right = min(right, 180.0 - 1e-1)
    set_src_nd = g.nodata if src_nodata is None else src_nodata
    set_dst_nd = g.nodata if dst_nodata is None else dst_nodata
    if set_dst_nd is None:
        set_dst_nd = 0

    # destination bbox: project a boundary sample of the source extent
    if input_crs == "geographic":
        n = 64
        bx = np.concatenate([np.linspace(g.left, right, n),
                             np.linspace(g.left, right, n),
                             np.full(n, g.left), np.full(n, right)])
        by = np.concatenate([np.full(n, g.top), np.full(n, bottom),
                             np.linspace(bottom, g.top, n),
                             np.linspace(bottom, g.top, n)])
        px, py = project_fwd(bx, by, grid)
    else:
        px = np.array([g.left, right, g.left, right])
        py = np.array([g.top, g.top, bottom, bottom])
    dleft, dtop = align_point(px.min(), py.max(), dst_resolution_idx, grid)
    ncols = max(1, math.ceil((px.max() - dleft) / cw))
    nrows = max(1, math.ceil((dtop - py.min()) / cw))
    if ncols * nrows > 200_000_000:
        raise ValueError(f"destination raster {nrows}x{ncols} too large")

    out = np.full((nbands, nrows, ncols), set_dst_nd, dtype=g.data.dtype)
    for r0 in range(0, nrows, row_chunk):
        r1 = min(r0 + row_chunk, nrows)
        jj, ii = np.meshgrid(np.arange(ncols), np.arange(r0, r1))
        xs = dleft + (jj.ravel() + 0.5) * cw
        ys = dtop - (ii.ravel() + 0.5) * cw
        if input_crs == "geographic":
            lon, lat = project_inv(xs, ys, grid)
        else:
            lon, lat = xs, ys
        fc = (lon - g.left) / g.res_x
        fr = (g.top - lat) / g.res_y
        if resampling == "nearest":
            sc = np.floor(fc).astype(np.int64)
            sr = np.floor(fr).astype(np.int64)
            ok = (sc >= 0) & (sc < W) & (sr >= 0) & (sr < H)
            for b in range(nbands):
                vals = np.full(xs.shape[0], set_dst_nd, dtype=g.data.dtype)
                v = g.data[b, sr[ok], sc[ok]]
                if set_src_nd is not None:
                    v = np.where(v == set_src_nd, np.asarray(set_dst_nd).astype(
                        g.data.dtype), v)
                vals[ok] = v
                out[b, r0:r1, :] = vals.reshape(r1 - r0, ncols)
        elif resampling == "bilinear":
            x0 = np.floor(fc - 0.5).astype(np.int64)
            y0 = np.floor(fr - 0.5).astype(np.int64)
            wx = (fc - 0.5) - x0
            wy = (fr - 0.5) - y0
            ok = (x0 >= 0) & (x0 + 1 < W) & (y0 >= 0) & (y0 + 1 < H)
            for b in range(nbands):
                vals = np.full(xs.shape[0], set_dst_nd, dtype=np.float64)
                a00 = g.data[b, y0[ok], x0[ok]].astype(np.float64)
                a01 = g.data[b, y0[ok], x0[ok] + 1].astype(np.float64)
                a10 = g.data[b, y0[ok] + 1, x0[ok]].astype(np.float64)
                a11 = g.data[b, y0[ok] + 1, x0[ok] + 1].astype(np.float64)
                wxo, wyo = wx[ok], wy[ok]
                vals[ok] = (a00 * (1 - wxo) * (1 - wyo) + a01 * wxo * (1 - wyo)
                            + a10 * (1 - wxo) * wyo + a11 * wxo * wyo)
                out[b, r0:r1, :] = vals.reshape(r1 - r0, ncols) \
                    .astype(g.data.dtype)
        else:
            raise ValueError(f"unsupported resampling {resampling!r}")

    write_geotiff(output_path, GeoTiff(
        out, dleft, dtop, cw, cw, nodata=set_dst_nd,
        tags={"GDAL_METADATA": f'<GDALMetadata><Item name="n_side">'
                               f'{grid.n_side}</Item></GDALMetadata>'}))
    return dst_resolution_idx


def scale_raster(input_path: str, output_path: str, scale_x: float,
                 scale_y: float | None = None, resampling: str = "nearest"):
    """Resample by scale factors (reference rasterutils.py:68-119 semantics:
    ceil output shape, rescaled transform)."""
    if scale_y is None:
        scale_y = scale_x
    g = read_geotiff(input_path)
    nbands, H, W = g.data.shape
    oh, ow = math.ceil(H * scale_y), math.ceil(W * scale_x)
    rr = (np.arange(oh) * (H / oh)).astype(np.int64)
    cc = (np.arange(ow) * (W / ow)).astype(np.int64)
    out = g.data[:, rr][:, :, cc]
    write_geotiff(output_path, GeoTiff(
        out, g.left, g.top, g.res_x * (W / ow), g.res_y * (H / oh),
        nodata=g.nodata, tags=g.tags))


def get_rhpx_metadata(input_path: str, n_side: int = 3) -> dict:
    """Reference get_gdf_attrs_from_rhealpix_file semantics
    (rhpxutils.py:110-145): {} and res_idx -1 for non-rHPX files."""
    g = read_geotiff(input_path)
    grid = GridConfig(n_side, 1, 0)
    meta = {"left": g.left, "top": g.top,
            "right": g.left + g.data.shape[2] * g.res_x,
            "bottom": g.top - g.data.shape[1] * g.res_y,
            "res": g.res_x, "height": g.data.shape[1], "width": g.data.shape[2],
            "nbands": g.data.shape[0], "nodata": g.nodata,
            "nodatavals": [g.nodata] * g.data.shape[0],
            "dtypes": [g.data.dtype.name] * g.data.shape[0]}
    tag = g.tags.get("GDAL_METADATA", "")
    if "n_side" in tag:
        rx, _ = grid.get_closest_resolution(abs(g.res_x))
        ry, _ = grid.get_closest_resolution(abs(g.res_y))
        assert rx == ry, f"{input_path} is not a proper rhealpix file (non-square)"
        meta["res_idx"] = rx
        meta["rhealpixdggs"] = grid.to_meta()
    else:
        meta["res_idx"] = -1
        meta["rhealpixdggs"] = {}
    return meta
