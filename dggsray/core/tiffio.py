"""Minimal GeoTIFF I/O (stdlib struct+zlib only — rasterio/GDAL are absent here).

Reads the reference's committed fixtures (little-endian, DEFLATE or uncompressed,
striped) and writes single- or multi-band GeoTIFFs with ModelPixelScale /
ModelTiepoint / nodata / free-form ASCII tags — enough to round-trip the
reference's raster artifacts (GeoTIFF write semantics at
/root/reference/dggstools/rhpx/rhpx_gdf_helper.py:319-335: DEFLATE, nodata,
user_metadata tag)."""
from __future__ import annotations

import struct
import zlib

import numpy as np

_DTYPES = {
    (8, 1): np.uint8, (8, 2): np.int8,
    (16, 1): np.uint16, (16, 2): np.int16,
    (32, 1): np.uint32, (32, 2): np.int32,
    (32, 3): np.float32, (64, 3): np.float64,
}
_INV_SF = {np.dtype(np.uint8): 1, np.dtype(np.int8): 2, np.dtype(np.uint16): 1,
           np.dtype(np.int16): 2, np.dtype(np.uint32): 1, np.dtype(np.int32): 2,
           np.dtype(np.float32): 3, np.dtype(np.float64): 3}


class GeoTiff:
    def __init__(self, data: np.ndarray, left: float, top: float,
                 res_x: float, res_y: float, nodata=None, tags=None):
        self.data = data            # (bands, h, w)
        self.left, self.top = left, top
        self.res_x, self.res_y = res_x, res_y
        self.nodata = nodata
        self.tags = tags or {}

    @property
    def shape(self):
        return self.data.shape

    def xy(self, row, col):
        """Center coordinates of pixel (row, col) — rasterio .xy semantics."""
        return (self.left + (np.asarray(col) + 0.5) * self.res_x,
                self.top - (np.asarray(row) + 0.5) * self.res_y)

    def index(self, x, y):
        """(row, col) containing point — rasterio .index semantics."""
        col = np.floor((np.asarray(x) - self.left) / self.res_x).astype(np.int64)
        row = np.floor((self.top - np.asarray(y)) / self.res_y).astype(np.int64)
        return row, col


def _packbits_decode(data: bytes) -> bytes:
    """TIFF PackBits (RLE) strip decode."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:                      # literal run of c+1 bytes
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:                    # repeat next byte 257-c times
            out += data[i:i + 1] * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first codes, ClearCode 256, EOI 257, early
    change: the code width bumps one code earlier than generic LZW)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9
    next_code = 258
    prev: bytes | None = None
    bitbuf = 0
    bitcnt = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
            bitcnt -= width
            if code == CLEAR:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                next_code = 258
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < next_code:
                entry = table[code]
                table.append(prev + entry[:1])
                next_code += 1
            else:                        # KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
                next_code += 1
            out += entry
            prev = entry
            if next_code == (1 << width) - 1 and width < 12:   # early change
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (round-trip partner of _lzw_decode)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code, width):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table = {bytes([i]): i for i in range(256)}
    width = 9
    next_code = 258
    emit(CLEAR, width)
    w = b""
    for b in data:
        c = bytes([b])
        if w + c in table:
            w += c
            continue
        emit(table[w], width)
        table[w + c] = next_code
        next_code += 1
        # early change: encoder switches right after ADDING entry 2^w - 1
        # (the decoder, one entry behind, switches at its next_code 2^w - 1)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:            # table nearly full: restart
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            width = 9
            next_code = 258
        w = c
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


_TAG_TYPES = {1: (1, "B"), 2: (1, "c"), 3: (2, "H"), 4: (4, "I"),
              12: (8, "d"), 11: (4, "f"), 16: (8, "Q"), 17: (8, "q")}


def _decode_tag(tag: int, typ: int, cnt: int, raw: bytes):
    size, fmt = _TAG_TYPES.get(typ, (1, "B"))
    total = size * cnt
    if typ == 2:
        return raw.rstrip(b"\x00").decode("latin1")
    if typ in _TAG_TYPES:
        # a corrupt count field can claim billions of values: validate
        # against the bytes actually present (the slice is bounded by the
        # file) BEFORE building the unpack format — `fmt * cnt` with a
        # bogus cnt allocated gigabytes and stalled for minutes (caught by
        # the codec fuzz tests)
        if len(raw) != total:
            raise ValueError(
                f"TIFF tag {tag}: value claims {total} bytes but only "
                f"{len(raw)} present — corrupt or truncated file")
        return struct.unpack(f"<{cnt}{fmt}", raw)
    return raw


def _tiff_layout(hdr: bytes):
    """(is_big, first_ifd_offset) from the 16-byte header prefix.  Classic
    TIFF is version 42 (4-byte offsets, 12-byte entries); BigTIFF is
    version 43 (8-byte offsets, 20-byte entries) — what GDAL writes for
    scenes past 4 GB, so a 100 TB archive is largely BigTIFF."""
    assert hdr[:2] == b"II", "only little-endian TIFFs supported"
    ver, = struct.unpack("<H", hdr[2:4])
    if ver == 42:
        return False, struct.unpack("<I", hdr[4:8])[0]
    if ver == 43:
        osz, zero = struct.unpack("<HH", hdr[4:8])
        if osz != 8 or zero != 0:
            raise ValueError(f"malformed BigTIFF header (offsetsize={osz})")
        return True, struct.unpack("<Q", hdr[8:16])[0]
    raise ValueError(f"not a TIFF/BigTIFF (version {ver})")


def parse_tiff_tags(d: bytes) -> dict:
    """Tag dict of a little-endian TIFF or BigTIFF byte buffer (first IFD
    only) — shared by read_geotiff and the GeoJP2 degenerate-GeoTIFF
    reader in jp2io."""
    big, off = _tiff_layout(d[:16])
    esz, inline = (20, 8) if big else (12, 4)
    if big:
        n = struct.unpack("<Q", d[off:off + 8])[0]
        base = off + 8
    else:
        n = struct.unpack("<H", d[off:off + 2])[0]
        base = off + 2
    tags = {}
    for i in range(n):
        e = d[base + i * esz: base + (i + 1) * esz]
        tag, typ = struct.unpack("<HH", e[:4])
        cnt = struct.unpack("<Q" if big else "<I",
                            e[4:4 + (8 if big else 4)])[0]
        size, _ = _TAG_TYPES.get(typ, (1, "B"))
        total = size * cnt
        vfield = e[esz - inline:]
        raw = vfield[:total] if total <= inline \
            else d[struct.unpack("<Q" if big else "<I",
                                 vfield[:inline])[0]:][:total]
        tags[tag] = _decode_tag(tag, typ, cnt, raw)
    return tags


def parse_tiff_tags_file(f) -> dict:
    """parse_tiff_tags over an open binary file using seeks: reads the
    header, the first IFD, and each out-of-line tag payload (all small) —
    never the strip data, so scanning an N-GB scene costs the driver
    O(tags) bytes.  Classic TIFF and BigTIFF."""
    f.seek(0)
    hdr = f.read(16)
    big, off = _tiff_layout(hdr)
    esz, inline = (20, 8) if big else (12, 4)
    f.seek(off)
    if big:
        n, = struct.unpack("<Q", f.read(8))
    else:
        n, = struct.unpack("<H", f.read(2))
    raw_entries = f.read(esz * n)
    tags = {}
    for i in range(n):
        e = raw_entries[i * esz:(i + 1) * esz]
        tag, typ = struct.unpack("<HH", e[:4])
        cnt = struct.unpack("<Q" if big else "<I",
                            e[4:4 + (8 if big else 4)])[0]
        size, _ = _TAG_TYPES.get(typ, (1, "B"))
        total = size * cnt
        vfield = e[esz - inline:]
        if total <= inline:
            raw = vfield[:total]
        else:
            at = struct.unpack("<Q" if big else "<I", vfield[:inline])[0]
            f.seek(at)
            raw = f.read(total)
        tags[tag] = _decode_tag(tag, typ, cnt, raw)
    return tags


def geokeys_from_tags(tags: dict) -> dict | None:
    """SHORT-valued GeoKeys from a parsed GeoKeyDirectoryTag, or None."""
    if 34735 not in tags:
        return None
    gk = tags[34735]
    geokeys = {}
    for i in range(gk[3] if len(gk) >= 4 else 0):
        kid, loc, cnt, val = gk[4 + i * 4: 8 + i * 4]
        if loc == 0:
            geokeys[kid] = val
    return geokeys


def _decode_tiff_unit(chunk: bytes, comp: int, dtype, rows: int, width: int,
                      bands: int, predictor: bool) -> np.ndarray:
    """One strip's/tile's bytes -> (rows, width, bands) interleaved array:
    decompress, undo the per-row horizontal predictor."""
    if comp == 8:
        raw = zlib.decompress(chunk)
    elif comp == 5:
        raw = _lzw_decode(chunk)
    elif comp == 32773:
        raw = _packbits_decode(chunk)
    else:
        raw = chunk
    arr = np.frombuffer(raw, dtype=dtype)[:rows * width * bands]
    if predictor:
        arr = np.cumsum(arr.reshape(-1, width, bands).astype(dtype), axis=1,
                        dtype=dtype).ravel()
    return arr.reshape(rows, width, bands)


def read_geotiff(path: str) -> GeoTiff:
    d = open(path, "rb").read()
    tags = parse_tiff_tags(d)
    w, h = tags[256][0], tags[257][0]
    bands = tags.get(277, (1,))[0]
    bits = tags.get(258, (8,) * bands)[0]
    sfmt = tags.get(339, (1,) * bands)[0]
    dtype = np.dtype(_DTYPES[(bits, sfmt)]).newbyteorder("<")
    comp = tags.get(259, (1,))[0]
    planar = tags.get(284, (1,))[0]
    if comp not in (1, 5, 8, 32773):
        raise ValueError(
            f"unsupported TIFF compression {comp} (supported: none=1, LZW=5, "
            f"DEFLATE=8, PackBits=32773)")
    if 322 in tags:
        # tiled layout (GDAL TILED=YES): TileWidth/TileLength 322/323,
        # TileOffsets/TileByteCounts 324/325; edge tiles are padded to the
        # full tile size, predictor differences per tile row
        if planar == 2:
            raise NotImplementedError("tiled planar-separate (284=2) TIFF")
        tw, th = tags[322][0], tags[323][0]
        offsets, counts = tags[324], tags[325]
        ntx = (w + tw - 1) // tw
        ilv = np.zeros((h, w, bands), dtype=dtype)
        pred = tags.get(317, (1,))[0] == 2
        for i, (o, c) in enumerate(zip(offsets, counts)):
            tile = _decode_tiff_unit(d[o:o + c], comp, dtype, th, tw,
                                     bands, pred)
            ty, tx = divmod(i, ntx)
            r0, c0 = ty * th, tx * tw
            rr, cc = min(th, h - r0), min(tw, w - c0)
            ilv[r0:r0 + rr, c0:c0 + cc] = tile[:rr, :cc]
        data = np.moveaxis(ilv, 2, 0)
    else:
        offsets, counts = tags[273], tags[279]
        raw = b""
        for o, c in zip(offsets, counts):
            chunk = d[o:o + c]
            if comp == 8:
                raw += zlib.decompress(chunk)
            elif comp == 5:
                raw += _lzw_decode(chunk)
            elif comp == 32773:
                raw += _packbits_decode(chunk)
            else:
                raw += chunk
        arr = np.frombuffer(raw, dtype=dtype)
        if tags.get(317, (1,))[0] == 2:  # horizontal-differencing predictor
            spp = bands if planar != 2 else 1
            arr = np.cumsum(
                arr.reshape(-1, w, spp).astype(dtype), axis=1,
                dtype=dtype).ravel()
        if planar == 2 and bands > 1:
            data = arr.reshape(bands, h, w)
        else:
            data = np.moveaxis(arr.reshape(h, w, bands), 2, 0)
    scale = tags.get(33550)
    tie = tags.get(33922)
    left = tie[3] if tie else 0.0
    top = tie[4] if tie else 0.0
    res_x = scale[0] if scale else 1.0
    res_y = scale[1] if scale else 1.0
    nodata = None
    if 42113 in tags:
        try:
            nodata = float(tags[42113])
        except ValueError:
            pass
    ascii_tags = {}
    if 42112 in tags:
        ascii_tags["GDAL_METADATA"] = tags[42112]
    # GeoKeyDirectoryTag: (version, rev, minor, n) then n 4-SHORT entries
    # (keyid, location, count, value); SHORT-valued keys live inline
    # (location 0) — enough for the EPSG model/CS codes auto-CRS needs
    geokeys = geokeys_from_tags(tags)
    if geokeys is not None:
        ascii_tags["geokeys"] = geokeys
    return GeoTiff(np.ascontiguousarray(data), left, top, res_x, res_y, nodata,
                   ascii_tags)


def geotiff_strip_spans(path: str):
    """Header-only scan of a striped GeoTIFF -> (meta, spans) — the
    per-strip analogue of jp2io.jp2_tile_spans_file.  Strips are whole-row
    units and the horizontal predictor (tag 317) differences per row, so
    every strip decodes independently via decode_geotiff_strip from its own
    byte range; the driver reads only the IFD (O(tags + n_strips) bytes).
    meta carries geometry + codec parameters; each span is
    {"strip", "offset", "count", "row0", "rows"}."""
    with open(path, "rb") as f:
        tags = parse_tiff_tags_file(f)
    w, h = tags[256][0], tags[257][0]
    bands = tags.get(277, (1,))[0]
    bits = tags.get(258, (8,) * bands)[0]
    sfmt = tags.get(339, (1,) * bands)[0]
    comp = tags.get(259, (1,))[0]
    if comp not in (1, 5, 8, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if tags.get(284, (1,))[0] == 2:
        raise NotImplementedError(
            "strip spans for planar-separate (284=2) TIFFs")
    offsets, counts = tags[273], tags[279]
    rps = tags.get(278, (h,))[0]
    scale = tags.get(33550)
    tie = tags.get(33922)
    nodata = None
    if 42113 in tags:
        try:
            nodata = float(tags[42113])
        except ValueError:
            pass
    meta = {"w": w, "h": h, "bands": bands,
            "dtype": np.dtype(_DTYPES[(bits, sfmt)]).newbyteorder("<").str,
            "comp": comp, "predictor": tags.get(317, (1,))[0],
            "rows_per_strip": rps,
            "left": tie[3] if tie else 0.0, "top": tie[4] if tie else 0.0,
            "res_x": scale[0] if scale else 1.0,
            "res_y": scale[1] if scale else 1.0,
            "nodata": nodata, "geokeys": geokeys_from_tags(tags)}
    spans = [{"strip": i, "offset": int(o), "count": int(c),
              "row0": i * rps, "rows": min(rps, h - i * rps)}
             for i, (o, c) in enumerate(zip(offsets, counts))]
    return meta, spans


def decode_geotiff_strip(meta: dict, chunk: bytes, rows: int) -> np.ndarray:
    """One strip's bytes -> (bands, rows, w) array, mirroring read_geotiff's
    per-strip decompress + per-row predictor + interleave handling."""
    comp = meta["comp"]
    if comp == 8:
        raw = zlib.decompress(chunk)
    elif comp == 5:
        raw = _lzw_decode(chunk)
    elif comp == 32773:
        raw = _packbits_decode(chunk)
    else:
        raw = chunk
    dtype = np.dtype(meta["dtype"])
    w, bands = meta["w"], meta["bands"]
    arr = np.frombuffer(raw, dtype=dtype)[:rows * w * bands]
    if meta["predictor"] == 2:
        arr = np.cumsum(arr.reshape(-1, w, bands).astype(dtype), axis=1,
                        dtype=dtype).ravel()
    return np.ascontiguousarray(
        np.moveaxis(arr.reshape(rows, w, bands), 2, 0))


def geotiff_tile_spans(path: str):
    """Header-only scan of a TILED GeoTIFF -> (meta, spans) — the
    two-dimensional analogue of geotiff_strip_spans: each tile is an
    independently compressed tw x th unit (predictor per tile row), so
    every tile decodes from its own byte range inside a Ray task while
    the driver reads only the IFD.  Each span is {"tile", "offset",
    "count", "row0", "col0", "rows", "cols"} with rows/cols already
    clipped to the image edge (the stored tile is padded)."""
    with open(path, "rb") as f:
        tags = parse_tiff_tags_file(f)
    if 322 not in tags:
        raise ValueError(f"{path}: not a tiled TIFF (no tag 322); "
                         "use geotiff_strip_spans")
    w, h = tags[256][0], tags[257][0]
    bands = tags.get(277, (1,))[0]
    bits = tags.get(258, (8,) * bands)[0]
    sfmt = tags.get(339, (1,) * bands)[0]
    comp = tags.get(259, (1,))[0]
    if comp not in (1, 5, 8, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if tags.get(284, (1,))[0] == 2:
        raise NotImplementedError(
            "tile spans for planar-separate (284=2) TIFFs")
    tw, th = tags[322][0], tags[323][0]
    offsets, counts = tags[324], tags[325]
    ntx = (w + tw - 1) // tw
    scale = tags.get(33550)
    tie = tags.get(33922)
    nodata = None
    if 42113 in tags:
        try:
            nodata = float(tags[42113])
        except ValueError:
            pass
    meta = {"w": w, "h": h, "bands": bands,
            "dtype": np.dtype(_DTYPES[(bits, sfmt)]).newbyteorder("<").str,
            "comp": comp, "predictor": tags.get(317, (1,))[0],
            "tile_w": tw, "tile_h": th,
            "left": tie[3] if tie else 0.0, "top": tie[4] if tie else 0.0,
            "res_x": scale[0] if scale else 1.0,
            "res_y": scale[1] if scale else 1.0,
            "nodata": nodata, "geokeys": geokeys_from_tags(tags)}
    spans = []
    for i, (o, c) in enumerate(zip(offsets, counts)):
        ty, tx = divmod(i, ntx)
        r0, c0 = ty * th, tx * tw
        spans.append({"tile": i, "offset": int(o), "count": int(c),
                      "row0": r0, "col0": c0,
                      "rows": min(th, h - r0), "cols": min(tw, w - c0)})
    return meta, spans


def decode_geotiff_tile(meta: dict, chunk: bytes) -> np.ndarray:
    """One tile's bytes -> (bands, tile_h, tile_w) array (edge padding
    INCLUDED — slice with the span's rows/cols)."""
    tile = _decode_tiff_unit(chunk, meta["comp"], np.dtype(meta["dtype"]),
                             meta["tile_h"], meta["tile_w"], meta["bands"],
                             meta["predictor"] == 2)
    return np.ascontiguousarray(np.moveaxis(tile, 2, 0))


def epsg_from_geokeys(geokeys: dict) -> str | None:
    """Engine CRS name from GeoTIFF GeoKeys (ProjectedCSTypeGeoKey 3072 /
    GeographicTypeGeoKey 2048), for the families this engine projects:
    EPSG:4326 geographic, 326xx/327xx UTM, 3857 Web Mercator."""
    code = geokeys.get(3072) or geokeys.get(2048)
    if code in (4326, 4258):            # WGS84 / ETRS89 geographic
        return "geographic"
    if code is not None and 32601 <= code <= 32660:
        return f"utm:{code - 32600}N"
    if code is not None and 32701 <= code <= 32760:
        return f"utm:{code - 32700}S"
    if code is not None and 25828 <= code <= 25838:  # ETRS89 / UTM zone NNN
        return f"utm:{code - 25800}N"
    if code == 3857:
        return "webmerc"
    if code in (3413, 3031):
        return f"epsg:{code}"
    return None


def write_geotiff(path: str, g: GeoTiff, compress: bool | str = True,
                  rows_per_strip: int | None = None,
                  tile_size: int | None = None,
                  predictor: bool = False, bigtiff: bool = False):
    """compress: True/"deflate" -> DEFLATE(8), "lzw" -> LZW(5),
    "packbits"-style RLE is read-only; False -> uncompressed.
    rows_per_strip splits the image into independently decodable strips
    (each compressed on its own) so geotiff_strip_spans can fan the read
    out over Ray tasks; default = one strip (the historical layout).
    tile_size instead writes the TILED layout (GDAL TILED=YES: tags
    322-325, edge tiles padded, multiple of 16 per TIFF 6.0) — the
    two-dimensional parallel unit geotiff_tile_spans fans out over.
    predictor=True writes horizontal differencing (tag 317=2, integer
    dtypes only — what GDAL pairs with DEFLATE/LZW by default).
    bigtiff=True writes the BigTIFF layout (version 43, 8-byte offsets,
    LONG8 strip/tile offset arrays) — auto-enabled when payloads exceed
    classic TIFF's 32-bit addressability, so >4 GB scenes just work."""
    bands, h, w = g.data.shape
    dt = g.data.dtype
    if predictor and not np.issubdtype(dt, np.integer):
        raise ValueError("predictor=2 requires an integer dtype")
    pix = np.ascontiguousarray(
        np.moveaxis(g.data, 0, 2).astype(dt, copy=False))  # interleaved

    def _pred(block: np.ndarray) -> np.ndarray:
        # per-row horizontal differencing (modular int wraparound is the
        # TIFF contract; cumsum on read inverts it exactly)
        out = block.copy()
        out[:, 1:, :] = block[:, 1:, :] - block[:, :-1, :]
        return out
    tiled = tile_size is not None
    if tiled:
        if rows_per_strip is not None:
            raise ValueError("tile_size and rows_per_strip are exclusive")
        if tile_size % 16 != 0 or tile_size <= 0:
            raise ValueError("TIFF tile size must be a positive multiple "
                             f"of 16, got {tile_size}")
        tw = th = tile_size
        payloads = []
        for r0 in range(0, h, th):
            for c0 in range(0, w, tw):
                tile = np.zeros((th, tw, bands), dtype=dt)
                rr, cc = min(th, h - r0), min(tw, w - c0)
                tile[:rr, :cc] = pix[r0:r0 + rr, c0:c0 + cc]
                if predictor:
                    tile = _pred(tile)
                seg = tile.tobytes()
                if compress == "lzw":
                    seg = _lzw_encode(seg)
                elif compress:
                    seg = zlib.compress(seg, 6)
                payloads.append(seg)
    else:
        rps = h if rows_per_strip is None else max(1, min(rows_per_strip, h))
        payloads = []
        for r0 in range(0, h, rps):
            blk = pix[r0:r0 + rps]
            if predictor:
                blk = _pred(blk)
            seg = blk.tobytes()
            if compress == "lzw":
                seg = _lzw_encode(seg)
            elif compress:
                seg = zlib.compress(seg, 6)
            payloads.append(seg)
    comp_tag = 5 if compress == "lzw" else 8 if compress else 1
    n_strips = len(payloads)
    off_tag = 324 if tiled else 273
    # BigTIFF (version 43, 8-byte offsets) when requested or when the file
    # cannot fit in classic TIFF's 32-bit offsets
    total_payload = sum(len(p) for p in payloads)
    big = bool(bigtiff) or total_payload >= 0xFFFF0000
    off_typ, off_fmt = (16, "Q") if big else (4, "I")

    entries = []
    extra = bytearray()
    # layout: header | IFD | extra values | strip data
    def add(tag, typ, vals, fmt):
        nonlocal extra
        size = {3: 2, 4: 4, 12: 8, 2: 1, 16: 8}[typ] * len(vals)
        if typ == 2:
            packed = vals[0].encode("latin1") + b"\x00"
            size = len(packed)
        else:
            packed = struct.pack("<" + fmt * len(vals), *vals)
        entries.append((tag, typ, len(packed) if typ == 2 else len(vals), packed))

    sf = _INV_SF[dt]
    bits = dt.itemsize * 8

    def dim(tag, v):
        # SHORT when it fits, LONG beyond 65535 (TIFF 6.0 allows both for
        # 256/257/278; warp outputs can exceed 16-bit dimensions)
        if v <= 0xFFFF:
            add(tag, 3, [v], "H")
        else:
            add(tag, 4, [v], "I")

    dim(256, w)
    dim(257, h)
    add(258, 3, [bits] * bands, "H")
    add(259, 3, [comp_tag], "H")
    add(262, 3, [1], "H")
    if predictor:
        add(317, 3, [2], "H")
    add(off_tag, off_typ, [0] * n_strips, off_fmt)   # patched below
    add(277, 3, [bands], "H")
    if tiled:
        add(322, 3, [tw], "H")
        add(323, 3, [th], "H")
        add(325, off_typ, [len(p) for p in payloads], off_fmt)
    else:
        dim(278, rps)
        add(279, off_typ, [len(p) for p in payloads], off_fmt)
    add(339, 3, [sf] * bands, "H")
    add(33550, 12, [g.res_x, g.res_y, 0.0], "d")
    add(33922, 12, [0.0, 0.0, 0.0, g.left, g.top, 0.0], "d")
    for name, text in sorted(g.tags.items()):
        if name == "GDAL_METADATA":
            add(42112, 2, [text], "c")
        elif name == "geokeys" and text:
            keys = sorted(text.items())
            gk = [1, 1, 0, len(keys)]
            for kid, val in keys:
                gk += [int(kid), 0, 1, int(val)]
            add(34735, 3, gk, "H")
    if g.nodata is not None:
        nd = int(g.nodata) if float(g.nodata).is_integer() else g.nodata
        add(42113, 2, [str(nd)], "c")

    entries.sort(key=lambda e: e[0])
    esz, inline = (20, 8) if big else (12, 4)
    header_size = 16 if big else 8
    ifd_off = header_size
    ifd_size = (8 if big else 2) + len(entries) * esz + (8 if big else 4)
    extra_off = ifd_off + ifd_size
    ptr_fmt = "<Q" if big else "<I"
    cnt_fmt = "<HHQ" if big else "<HHI"
    body = bytearray()
    body_pos = {}
    out_entries = []
    for tag, typ, cnt, packed in entries:
        if len(packed) <= inline:
            val = packed + b"\x00" * (inline - len(packed))
        else:
            val = struct.pack(ptr_fmt, extra_off + len(body))
            body_pos[tag] = len(body)
            body += packed
        out_entries.append(struct.pack(cnt_fmt, tag, typ, cnt) + val)
    data_off = extra_off + len(body)
    # patch Strip/TileOffsets now that the data start is known
    strip_offs = []
    at = data_off
    for p in payloads:
        strip_offs.append(at)
        at += len(p)
    osz = 8 if big else 4
    packed_offs = struct.pack(f"<{n_strips}{off_fmt}", *strip_offs)
    if len(packed_offs) <= inline:
        for i, (tag, typ, cnt, packed) in enumerate(entries):
            if tag == off_tag:
                out_entries[i] = struct.pack(cnt_fmt, off_tag, off_typ,
                                             n_strips) \
                    + packed_offs + b"\x00" * (inline - len(packed_offs))
    else:
        o = body_pos[off_tag]
        body[o:o + osz * n_strips] = packed_offs
    with open(path, "wb") as f:
        if big:
            f.write(b"II+\x00" + struct.pack("<HH", 8, 0)
                    + struct.pack("<Q", ifd_off))
            f.write(struct.pack("<Q", len(entries)))
        else:
            f.write(b"II*\x00" + struct.pack("<I", ifd_off))
            f.write(struct.pack("<H", len(entries)))
        f.write(b"".join(out_entries))
        f.write(struct.pack(ptr_fmt, 0))
        f.write(bytes(body))
        for p in payloads:
            f.write(p)
