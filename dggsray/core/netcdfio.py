"""Pure-numpy reader for NetCDF classic files (CDF-1 / CDF-2) — the format of
the reference's NetCDF raster fixtures (c_gls_SCE500_*.nc, read through GDAL
subdatasets in /root/reference/tests/data_tests/tests_data.py:154,185,329).
netCDF4/scipy/GDAL are absent in this environment, so the classic binary
format (a public, frozen spec: magic 'CDF\\x01'/'\\x02', big-endian header of
dim/attr/var lists, fixed vars at absolute offsets, record vars interleaved
per record) is parsed directly.

Exposes GDAL-style subdatasets (every variable with >= 2 dims) and a
geo-raster view: 2D slabs + affine georeferencing recovered from the 1D
coordinate variables of the trailing (y, x) dims, `_FillValue`/`missing_value`
nodata, CRS from a `crs`/`grid_mapping` variable when present (the reference
fixtures are regular lat/lon grids -> "geographic")."""
from __future__ import annotations

import struct

import numpy as np

_NC_DIMENSION = 0x0A
_NC_VARIABLE = 0x0B
_NC_ATTRIBUTE = 0x0C

_NC_TYPES = {
    1: (np.dtype(">i1"), 1),   # NC_BYTE
    2: (np.dtype("S1"), 1),    # NC_CHAR
    3: (np.dtype(">i2"), 2),   # NC_SHORT
    4: (np.dtype(">i4"), 4),   # NC_INT
    5: (np.dtype(">f4"), 4),   # NC_FLOAT
    6: (np.dtype(">f8"), 8),   # NC_DOUBLE
}


class _Cursor:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u32(self) -> int:
        v = struct.unpack_from(">I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def u64(self) -> int:
        v = struct.unpack_from(">Q", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.buf[self.pos:self.pos + n].decode("utf-8", "replace")
        self.pos += (n + 3) & ~3          # names pad to 4-byte boundary
        return s

    def values(self, nc_type: int, nelems: int):
        dt, size = _NC_TYPES[nc_type]
        nbytes = nelems * size
        raw = self.buf[self.pos:self.pos + nbytes]
        self.pos += (nbytes + 3) & ~3     # attribute payloads pad to 4
        if nc_type == 2:
            return raw.decode("utf-8", "replace")
        arr = np.frombuffer(raw, dtype=dt)
        return arr[0] if nelems == 1 else arr


class NCVariable:
    def __init__(self, name, dim_names, shape, nc_type, attrs, vsize, begin,
                 record):
        self.name = name
        self.dim_names = dim_names        # includes the record dim if any
        self.shape = shape                # record dim reported at true numrecs
        self.nc_type = nc_type
        self.attrs = attrs
        self.vsize = vsize                # per-record bytes for record vars
        self.begin = begin
        self.record = record

    @property
    def dtype(self):
        return _NC_TYPES[self.nc_type][0]

    @property
    def nodata(self):
        for k in ("_FillValue", "missing_value"):
            if k in self.attrs:
                v = self.attrs[k]
                return float(np.asarray(v).ravel()[0])
        return None


class NetCDFClassic:
    """Parsed header + on-demand variable reads (the file bytes are held once;
    slabs are np.frombuffer views copied only on byteswap)."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._buf = f.read()
        if self._buf[:3] != b"CDF" or self._buf[3] not in (1, 2):
            raise ValueError(f"{path}: not a NetCDF classic (CDF-1/CDF-2) file")
        self._v64 = self._buf[3] == 2
        c = _Cursor(self._buf)
        c.pos = 4
        self.numrecs = c.u32()            # 0xFFFFFFFF = STREAMING (treat as 0)
        if self.numrecs == 0xFFFFFFFF:
            self.numrecs = 0
        self.dims: dict[str, int] = {}
        self._dim_order: list[str] = []
        tag, n = c.u32(), c.u32()
        if tag == _NC_DIMENSION:
            for _ in range(n):
                name = c.name()
                self.dims[name] = c.u32()     # 0 = unlimited (record) dim
                self._dim_order.append(name)
        self.attrs = self._attr_list(c)
        self.variables: dict[str, NCVariable] = {}
        tag, n = c.u32(), c.u32()
        if tag == _NC_VARIABLE:
            for _ in range(n):
                name = c.name()
                ndims = c.u32()
                dimids = [c.u32() for _ in range(ndims)]
                vattrs = self._attr_list(c)
                nc_type = c.u32()
                vsize = c.u32()
                begin = c.u64() if self._v64 else c.u32()
                dim_names = [self._dim_order[d] for d in dimids]
                record = bool(dim_names) and self.dims[dim_names[0]] == 0
                shape = tuple(self.numrecs if (i == 0 and record)
                              else self.dims[d]
                              for i, d in enumerate(dim_names))
                self.variables[name] = NCVariable(
                    name, dim_names, shape, nc_type, vattrs, vsize, begin,
                    record)
        # total bytes of one record slab (sum of record vars' vsizes)
        self._recsize = sum(v.vsize for v in self.variables.values()
                            if v.record)

    def _attr_list(self, c: _Cursor) -> dict:
        tag, n = c.u32(), c.u32()
        out = {}
        if tag == _NC_ATTRIBUTE:
            for _ in range(n):
                name = c.name()
                nc_type = c.u32()
                nelems = c.u32()
                out[name] = c.values(nc_type, nelems)
        return out

    def read(self, name: str) -> np.ndarray:
        """Variable data in native byte order, shaped per its dims."""
        v = self.variables[name]
        dt, size = _NC_TYPES[v.nc_type]
        if not v.record:
            n = int(np.prod(v.shape, dtype=np.int64)) if v.shape else 1
            arr = np.frombuffer(self._buf, dtype=dt, count=n, offset=v.begin)
            out = arr.reshape(v.shape)
        else:
            per_rec = v.shape[1:] if len(v.shape) > 1 else ()
            n_per = int(np.prod(per_rec, dtype=np.int64)) if per_rec else 1
            recs = []
            # spec special case: with exactly ONE record variable its records
            # pack contiguously at the UNPADDED size (no 4-byte round-up),
            # otherwise records interleave at the file's full recsize
            n_recvars = sum(1 for vv in self.variables.values() if vv.record)
            stride = n_per * size if n_recvars == 1 else self._recsize
            for r in range(self.numrecs):
                recs.append(np.frombuffer(
                    self._buf, dtype=dt, count=n_per,
                    offset=v.begin + r * stride))
            out = (np.stack(recs).reshape((self.numrecs, *per_rec))
                   if recs else np.empty((0, *per_rec), dtype=dt))
        return out.astype(out.dtype.newbyteorder("=")) \
            if out.dtype.byteorder == ">" else out

    def subdatasets(self) -> list[str]:
        """GDAL-style subdataset names: every variable with >= 2 dims
        (gdalinfo on a NetCDF lists NETCDF:\"file\":var for these)."""
        return [n for n, v in self.variables.items() if len(v.shape) >= 2]


def open_netcdf(path: str):
    """Magic-byte dispatch: classic CDF-1/2 -> NetCDFClassic, HDF5 container
    (NetCDF-4, the modern climate-data format) -> hdf5io.NetCDF4.  Both
    expose the same .variables/.read/.subdatasets/.attrs surface."""
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic[:8] == b"\x89HDF\r\n\x1a\n":
        from .hdf5io import NetCDF4
        return NetCDF4(path)
    return NetCDFClassic(path)


def read_netcdf_raster(path: str, var: str | None = None):
    """A 2D geo-raster view of a NetCDF variable, as (GeoTiff-like, attrs).

    The trailing two dims are (y, x); leading dims (time...) take index 0 —
    matching GDAL's band-per-leading-index on the reference fixture where the
    time dim has one entry.  Georeferencing comes from the 1D coordinate
    variables named like the trailing dims (cell centers -> half-pixel shift
    to edges, the GDAL convention); y descending or ascending both normalize
    to top>bottom with positive res_y."""
    from .tiffio import GeoTiff

    nc = open_netcdf(path)
    if var is None:
        subs = nc.subdatasets()
        if not subs:
            raise ValueError(f"{path}: no 2D+ variables")
        var = subs[0]
    v = nc.variables[var]
    if len(v.shape) < 2:
        raise ValueError(f"{var}: not a raster (dims {v.dim_names})")
    data = nc.read(var)
    while data.ndim > 2:
        data = data[0]
    ydim, xdim = v.dim_names[-2], v.dim_names[-1]

    def axis(dim, length):
        if dim in nc.variables and nc.variables[dim].shape == (length,):
            return nc.read(dim).astype(np.float64)
        return np.arange(length, dtype=np.float64)  # pixel-index fallback

    ys = axis(ydim, data.shape[0])
    xs = axis(xdim, data.shape[1])
    res_x = float(xs[1] - xs[0]) if xs.size > 1 else 1.0
    res_y_signed = float(ys[1] - ys[0]) if ys.size > 1 else -1.0
    if res_y_signed > 0:                  # ascending y: flip to north-up
        data = data[::-1]
        ys = ys[::-1]
        res_y_signed = -res_y_signed
    left = float(xs[0]) - res_x / 2.0
    top = float(ys[0]) - res_y_signed / 2.0
    g = GeoTiff(data[None, ...], left=left, top=top, res_x=res_x,
                res_y=-res_y_signed, nodata=v.nodata,
                tags={"source": f'NETCDF:"{path}":{var}'})
    return g, {"var_attrs": dict(v.attrs), "global_attrs": dict(nc.attrs)}
