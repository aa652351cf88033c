"""Pure-numpy reader for ERDAS Imagine (.img, HFA) rasters — the format of the
reference's NAIP_30.img fixture (converted through GDAL at
/root/reference/tests/data_tests/tests_data.py:150,183).  GDAL is absent here,
so the HFA container (public spec: "EHFA_HEADER_TAG", an Ehfa_Entry tree whose
Eimg_Layer nodes carry 64x64-blocked band data via an Edms_State block table,
georeferencing in Eprj_MapInfo, projection in Eprj_ProParameters) is parsed
directly.  Covers the standard single-file layout: uncompressed or ESRI-RLE
blocks, u8/u16/s16/u32/s32/f32/f64 pixels, band-per-layer."""
from __future__ import annotations

import struct

import numpy as np

_PIXEL_DTYPES = {
    3: np.uint8, 4: np.int8, 5: np.uint16, 6: np.int16,
    7: np.uint32, 8: np.int32, 9: np.float32, 10: np.float64,
}


class _Entry:
    __slots__ = ("name", "type", "data", "dataSize", "children", "next_pos")

    def __init__(self, name, typ, data, dataSize):
        self.name, self.type = name, typ
        self.data, self.dataSize = data, dataSize
        self.children: list[_Entry] = []
        self.next_pos = 0


def _parse_tree(buf: bytes, pos: int) -> _Entry:
    nxt, _prev, _parent, child, data, size = struct.unpack_from("<6I", buf, pos)
    name = buf[pos + 24:pos + 88].split(b"\0")[0].decode("latin1")
    typ = buf[pos + 88:pos + 120].split(b"\0")[0].decode("latin1")
    e = _Entry(name, typ, data, size)
    e.next_pos = nxt
    c = child
    while c:
        sub = _parse_tree(buf, c)
        e.children.append(sub)
        c = sub.next_pos
    return e


def _esri_rle_decode(data: bytes, nbytes_out: int) -> bytes:
    """ESRI GRID run-length decode (HFA compression type 1): header
    {u32 min; u32 numruns; u32 databytes(unused); u8 numbitspervalue} then
    run counts + values.  Only the 8-bit value path is implemented (covers
    u8 imagery; other depths raise)."""
    minval, numruns = struct.unpack_from("<II", data, 0)
    nbits = data[12]
    if nbits != 8:
        raise NotImplementedError(f"HFA RLE with {nbits}-bit values")
    pos = 13
    counts = np.empty(numruns, dtype=np.int64)
    for r in range(numruns):
        b0 = data[pos]
        n = b0 & 0x3F
        for k in range((b0 >> 6)):
            pos += 1
            n = (n << 8) | data[pos]
        counts[r] = n
        pos += 1
    vals = np.frombuffer(data, dtype=np.uint8, count=numruns, offset=pos)
    out = np.repeat(vals + np.uint8(minval), counts)
    return out[:nbytes_out].tobytes()


class HFALayer:
    def __init__(self, buf: bytes, entry: _Entry):
        self._buf = buf
        self.name = entry.name
        (self.width, self.height, self.layer_type, self.pixel_type,
         self.block_w, self.block_h) = struct.unpack_from(
            "<IIHHII", buf, entry.data)
        self.dtype = np.dtype(_PIXEL_DTYPES[self.pixel_type])
        dms = next(c for c in entry.children if c.type == "Edms_State")
        nblocks, per_block = struct.unpack_from("<II", buf, dms.data)
        self.nblocks = nblocks
        # block-info records observed inline at data+24 (offset u32, size u32,
        # logvalid u32, compression u16 — 14-byte stride, validated by the
        # contiguous-offset progression in the fixture)
        self.blocks = []
        p = dms.data + 24
        for _ in range(nblocks):
            off, size, logvalid, comp = struct.unpack_from("<IIIH", buf, p)
            self.blocks.append((off, size, logvalid & 1, comp))
            p += 14
        self.mapinfo = None
        mi = next((c for c in entry.children if c.type == "Eprj_MapInfo"), None)
        if mi is not None:
            self.mapinfo = _parse_mapinfo(buf, mi.data)
        self.proname = self.mapinfo["proName"] if self.mapinfo else None
        self.nodata = None
        ni = next((c for c in entry.children
                   if c.type == "Eimg_NonInitializedValue"), None)
        if ni is not None:
            # BASEDATA ptr -> {u32 nrows; u32 ncols; u16 dtype; u16 objtype;
            # value} — the fill scalar rides as a trailing f64
            _c, o = _ptr(buf, ni.data)
            self.nodata = struct.unpack_from("<d", buf, o + 12)[0]
        self.projection = None
        pp = next((c for c in entry.children
                   if c.type == "Eprj_ProParameters"), None)
        if pp is not None:
            self.projection = _parse_proparams(buf, pp.data)

    def read(self) -> np.ndarray:
        bw, bh = self.block_w, self.block_h
        across = -(-self.width // bw)
        down = -(-self.height // bh)
        assert across * down == self.nblocks, "unexpected block grid"
        isz = self.dtype.itemsize
        out = np.zeros((down * bh, across * bw), dtype=self.dtype)
        for bi, (off, size, valid, comp) in enumerate(self.blocks):
            br, bc = divmod(bi, across)
            if not valid:
                continue
            raw = self._buf[off:off + size]
            if comp == 1:
                raw = _esri_rle_decode(raw, bw * bh * isz)
            elif comp != 0:
                raise NotImplementedError(f"HFA block compression {comp}")
            blk = np.frombuffer(raw, dtype=self.dtype,
                                count=bw * bh).reshape(bh, bw)
            out[br * bh:(br + 1) * bh, bc * bw:(bc + 1) * bw] = blk
        return out[:self.height, :self.width]


def _ptr(buf: bytes, pos: int):
    """HFA pointer field: {u32 count; u32 file offset} -> (count, offset)."""
    return struct.unpack_from("<II", buf, pos)


def _parse_mapinfo(buf: bytes, pos: int) -> dict:
    """Eprj_MapInfo: five pointer fields (proName, upperLeftCenter,
    lowerRightCenter, pixelSize, units), each {count,offset} with the pointed
    data laid inline right after its pointer — so the next pointer field sits
    at the end of the previous field's data."""
    c0, o0 = _ptr(buf, pos)
    proname = buf[o0:o0 + c0].split(b"\0")[0].decode("latin1")
    p = o0 + c0                          # next ptr field after the name bytes
    c1, o1 = _ptr(buf, p)
    ulx, uly = struct.unpack_from("<2d", buf, o1)
    p = o1 + 16
    c2, o2 = _ptr(buf, p)
    lrx, lry = struct.unpack_from("<2d", buf, o2)
    p = o2 + 16
    c3, o3 = _ptr(buf, p)
    psx, psy = struct.unpack_from("<2d", buf, o3)
    p = o3 + 16
    c4, o4 = _ptr(buf, p)
    units = buf[o4:o4 + c4].split(b"\0")[0].decode("latin1")
    return {"proName": proname, "upperLeftCenter": (ulx, uly),
            "lowerRightCenter": (lrx, lry), "pixelSize": (psx, psy),
            "units": units}


def _parse_proparams(buf: bytes, pos: int) -> dict:
    """Eprj_ProParameters: {proType e2; proNumber u32; proExeName p; proName p;
    proZone u32; proParams p:f64[15] (GCTP order); Eprj_Spheroid proSpheroid
    {sphereName p; a f64; b f64; eSquared f64; radius f64}}."""
    pro_number = struct.unpack_from("<I", buf, pos + 2)[0]
    c_exe, o_exe = _ptr(buf, pos + 6)
    p = o_exe + c_exe if c_exe else pos + 14
    c_name, o_name = _ptr(buf, p)
    name = buf[o_name:o_name + c_name].split(b"\0")[0].decode("latin1")
    p = o_name + c_name
    zone = struct.unpack_from("<I", buf, p)[0]
    p += 4
    c_par, o_par = _ptr(buf, p)
    params = list(struct.unpack_from(f"<{c_par}d", buf, o_par))
    p = o_par + 8 * c_par
    _c_obj, o_obj = _ptr(buf, p)         # proSpheroid object pointer
    c_nm, o_nm = _ptr(buf, o_obj)        # its sphereName pointer
    sph_name = buf[o_nm:o_nm + c_nm].split(b"\0")[0].decode("latin1")
    a, b, e2, _radius = struct.unpack_from("<4d", buf, o_nm + c_nm)
    return {"number": pro_number, "name": name, "zone": zone,
            "params": params, "spheroid": (a, b, e2),
            "spheroid_name": sph_name}


def read_img(path: str):
    """(GeoTiff-like, meta) view of an ERDAS Imagine file: bands stacked from
    the Eimg_Layer nodes, affine from Eprj_MapInfo (upperLeftCenter is a
    pixel CENTER -> half-pixel shift to the edge, GDAL convention)."""
    from .tiffio import GeoTiff

    buf = open(path, "rb").read()
    if buf[:16] != b"EHFA_HEADER_TAG\0":
        raise ValueError(f"{path}: not an ERDAS Imagine (HFA) file")
    hdr_pos = struct.unpack_from("<I", buf, 16)[0]
    _ver, _free, root_pos, _ehl, _dict = struct.unpack_from("<IIIHI", buf,
                                                            hdr_pos)
    root = _parse_tree(buf, root_pos)
    layers = [HFALayer(buf, c) for c in root.children if c.type == "Eimg_Layer"]
    if not layers:
        raise ValueError(f"{path}: no Eimg_Layer nodes")
    data = np.stack([la.read() for la in layers])
    mi = layers[0].mapinfo
    if mi is not None:
        psx, psy = mi["pixelSize"]
        left = mi["upperLeftCenter"][0] - psx / 2.0
        top = mi["upperLeftCenter"][1] + abs(psy) / 2.0
    else:
        psx = psy = 1.0
        left, top = 0.0, float(data.shape[1])
    tags = {"source": path}
    if layers[0].projection is not None:
        tags["proj"] = layers[0].projection
    g = GeoTiff(data, left=left, top=top, res_x=psx, res_y=abs(psy),
                nodata=layers[0].nodata, tags=tags)
    meta = {"projection": (mi or {}).get("proName"),
            "units": (mi or {}).get("units"), "mapinfo": mi,
            "proj_params": layers[0].projection, "n_layers": len(layers)}
    return g, meta
