"""Format dispatch for raster inputs (reference: rasterio/GDAL opens anything;
here the supported set is GeoTIFF (DEFLATE/LZW/PackBits/uncompressed,
tiffio), NetCDF classic + NetCDF-4/HDF5 subdatasets (netcdfio/hdf5io),
JPEG2000 + GeoJP2 (jp2io, from-scratch T.800 lossless codec), ERDAS .img
and JPEG+world-file — every raster format the reference's own test
fixtures use).  GDAL-style subdataset syntax is accepted:

    open_raster("scene.tif")
    open_raster("ortho.jp2")                      # lossless JP2 + GeoJP2
    open_raster("product.nc")                     # first 2D+ variable
    open_raster('NETCDF:"product.nc":sce500')     # explicit subdataset
    open_raster("product.nc:sce500")              # shorthand

Remote inputs (the reference reads S3 through `rasterio.Env` at
testing_playground/manual_tests.py:424-427; no network exists in this
sandbox) go through a pluggable filesystem seam: register a fetcher per URL
scheme with `register_filesystem("s3", fetch)` where `fetch(url) -> local
path`; `open_raster("s3://bucket/scene.tif")` then localizes before the
format dispatch.  Unregistered schemes raise NotImplementedError naming the
seam rather than failing on a bogus local path.
"""
from __future__ import annotations

from .tiffio import GeoTiff, read_geotiff

_FILESYSTEMS: dict[str, object] = {}


def register_filesystem(scheme: str, fetch) -> None:
    """Register `fetch(url) -> local_path` for a URL scheme (e.g. "s3")."""
    _FILESYSTEMS[scheme.lower()] = fetch


def localize_path(path: str) -> str:
    """Resolve a scheme-qualified path (raster, parquet cell table, image
    table — any engine input) through the registered filesystem.  Local
    paths pass through untouched; `file://` is stripped; other schemes call
    the registered fetcher, which may return a file OR directory path."""
    return _localize(path)


def _localize(path: str) -> str:
    """Resolve scheme-qualified paths through the registered filesystem."""
    if "://" not in path:
        return path
    scheme, rest = path.split("://", 1)
    if scheme.lower() == "file":
        return rest
    fetch = _FILESYSTEMS.get(scheme.lower())
    if fetch is None:
        raise NotImplementedError(
            f"no filesystem registered for scheme '{scheme}'; call "
            f"dggsray.core.raster.register_filesystem('{scheme}', fetch) "
            "with fetch(url) -> local path (the sandbox has no network; on "
            "a real cluster plug in boto3/fsspec here)")
    return fetch(path)


def parse_raster_path(path: str) -> tuple[str, str | None]:
    """(file_path, subdataset_or_None) from plain or GDAL-subdataset syntax."""
    if path.upper().startswith("NETCDF:"):
        rest = path[len("NETCDF:"):]
        if rest.startswith('"'):
            end = rest.index('"', 1)
            return rest[1:end], rest[end + 2:] or None
        if ":" in rest:
            f, v = rest.rsplit(":", 1)
            return f, v or None
        return rest, None
    if ".nc:" in path:
        f, v = path.rsplit(":", 1)
        return f, v
    return path, None


def open_raster(path: str) -> GeoTiff:
    f, sub = parse_raster_path(path)
    f = _localize(f)
    if f.lower().endswith(".nc"):
        from .netcdfio import read_netcdf_raster
        g, _meta = read_netcdf_raster(f, sub)
        return g
    if f.lower().endswith(".img"):
        from .hfaio import read_img
        g, _meta = read_img(f)
        return g
    if f.lower().endswith((".jpg", ".jpeg")):
        from .jpegio import read_jpeg_raster
        g, _srs = read_jpeg_raster(f)
        return g
    if f.lower().endswith((".jp2", ".j2k")):
        from .jp2io import read_jp2_raster
        return read_jp2_raster(f)
    return read_geotiff(f)


def raster_subdatasets(path: str) -> list[str]:
    f, _sub = parse_raster_path(path)
    f = _localize(f)
    if f.lower().endswith(".nc"):
        from .netcdfio import open_netcdf
        return [f'NETCDF:"{f}":{v}' for v in open_netcdf(f).subdatasets()]
    return []


def image_with_world_file_to_geotiff(input_path: str, output_path: str,
                                     set_nodata_to_zero: bool = False):
    """Plain image (JPEG + .jgw/.wld world file or PAM sidecar) -> GeoTIFF
    with the georeferencing burned in — the reference's
    image_with_world_file_to_geotiff (rhpx/utils/rasterutils.py:34-51)."""
    from .tiffio import write_geotiff

    g = open_raster(input_path)
    if set_nodata_to_zero:
        g.nodata = 0
    write_geotiff(output_path, g)
    return g
