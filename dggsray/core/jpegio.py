"""Pure-python/numpy baseline JPEG (SOF0) decoder + GDAL PAM sidecar georef —
the reference's "aerial ortho as JPEG + world info" input
(pnoa_2015_25830_0354_4_4.jpg, converted through rasterio at
/root/reference/tests/data_tests/tests_data.py:149,182).  No image libraries
exist in this environment, so the baseline JPEG bitstream (public ITU T.81
spec: DQT/DHT/SOF0/SOS markers, Huffman-coded DCT blocks, YCbCr 4:2:0/4:2:2/
4:4:4) is decoded directly: a 16-bit Huffman LUT drives the per-block entropy
decode, and dequantization + IDCT + color conversion run vectorized over all
blocks at once."""
from __future__ import annotations

import re
import struct

import numpy as np

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# 8-point IDCT basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.array([[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])


def _build_lut(bits, vals):
    """(65536,) int32 LUT: high 8 bits symbol, low 8 bits code length."""
    lut = np.zeros(65536, dtype=np.int32)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            sym = vals[k]
            k += 1
            lo = code << (16 - ln)
            hi = lo + (1 << (16 - ln))
            lut[lo:hi] = (int(sym) << 8) | ln
            code += 1
        code <<= 1
    return lut


class _BitReader:
    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 48:
            if self.pos >= len(self.data):
                self.buf = (self.buf << 8) & ((1 << 56) - 1)
                self.nbits += 8          # zero-pad past the end
                continue
            self.buf = ((self.buf << 8) | self.data[self.pos]) & ((1 << 56) - 1)
            self.pos += 1
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int):
        self.nbits -= n

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) RGB uint8 (or (h, w) for grayscale)."""
    assert data[:2] == b"\xff\xd8", "not a JPEG"
    qt = {}
    huff_dc = {}
    huff_ac = {}
    comps = None
    w = h = 0
    restart = 0
    i = 2
    while i < len(data):
        assert data[i] == 0xFF, "marker expected"
        m = data[i + 1]
        if m == 0xD9:
            break
        ln = struct.unpack(">H", data[i + 2:i + 4])[0]
        seg = data[i + 4:i + 2 + ln]
        if m == 0xDB:                     # DQT (possibly several per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.int32)
                    p += 65
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, p + 1).astype(np.int32)
                    p += 129
                qt[tq] = tbl
        elif m == 0xC0:                   # SOF0 baseline
            h = struct.unpack(">H", seg[1:3])[0]
            w = struct.unpack(">H", seg[3:5])[0]
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + c * 3:9 + c * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 15,
                              "tq": tq})
        elif m in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError(
                f"JPEG SOF{m - 0xC0}: only baseline sequential (SOF0) here")
        elif m == 0xC4:                   # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nsym = sum(bits)
                vals = list(seg[p + 17:p + 17 + nsym])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_lut(bits, vals)
                p += 17 + nsym
        elif m == 0xDD:                   # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:                   # SOS: entropy-coded data follows
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + c * 2], seg[2 + c * 2]
                scan_sel[cid] = (tabs >> 4, tabs & 15)
            scan_start = i + 2 + ln
            return _decode_scan(data, scan_start, w, h, comps, scan_sel,
                                qt, huff_dc, huff_ac, restart)
        i += 2 + ln
    raise ValueError("no SOS marker found")


def _decode_scan(data, start, w, h, comps, scan_sel, qt, huff_dc, huff_ac,
                 restart):
    # un-stuff: 0xFF00 -> 0xFF; stop before any other marker (incl. RSTn,
    # which we strip — component DC predictors reset there)
    raw = bytearray()
    rst_positions = []
    p = start
    while p < len(data):
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1]
            if nxt == 0x00:
                raw.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:       # restart marker
                rst_positions.append(len(raw))
                p += 2
                continue
            break
        raw.append(b)
        p += 1
    br = _BitReader(bytes(raw))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    for c in comps:
        c["bw"] = mcux * c["h"]           # blocks across
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["dc_tab"], c["ac_tab"] = scan_sel[c["id"]]
        c["pred"] = 0

    zz = _ZIGZAG
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and (my * mcux + mx) % restart == 0 \
                    and (my or mx):
                # predictors reset at restart intervals; bits re-align at the
                # stripped marker boundary
                br.nbits -= br.nbits % 8
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                dct = huff_dc[c["dc_tab"]]
                act = huff_ac[c["ac_tab"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk_row = my * c["v"] + by
                        blk_col = mx * c["h"] + bx
                        coef = c["coef"][blk_row * c["bw"] + blk_col]
                        e = dct[br.peek16()]
                        s = e >> 8
                        br.skip(e & 0xFF)
                        if s:
                            c["pred"] += _extend(br.get(s), s)
                        coef[0] = c["pred"]
                        k = 1
                        while k < 64:
                            e = act[br.peek16()]
                            rs = e >> 8
                            br.skip(e & 0xFF)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break      # EOB
                            k += r
                            if k > 63:
                                break
                            coef[zz[k]] = _extend(br.get(s), s)
                            k += 1

    planes = []
    for c in comps:
        q = qt[c["tq"]][np.argsort(zz)]    # natural-order quant table
        blocks = (c["coef"] * q[None, :]).reshape(-1, 8, 8).astype(np.float64)
        # IDCT over every block at once: X = A.T @ C @ A
        pix = np.einsum("ux,nuv,vy->nxy", _A, blocks, _A) + 128.0
        pix = np.clip(np.rint(pix), 0, 255).astype(np.uint8)
        plane = pix.reshape(c["bh"], c["bw"], 8, 8).transpose(0, 2, 1, 3) \
            .reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample subsampled chroma to full MCU resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return planes[0]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255) \
        .astype(np.uint8)


def read_pam_georef(path: str):
    """GDAL PAM sidecar (.aux.xml) -> (GeoTransform tuple, srs_wkt|None)."""
    xml = open(path + ".aux.xml", encoding="utf-8").read()
    m = re.search(r"<GeoTransform>([^<]+)</GeoTransform>", xml)
    gt = tuple(float(x) for x in m.group(1).split(",")) if m else None
    s = re.search(r"<SRS[^>]*>([^<]+)</SRS>", xml)
    return gt, (s.group(1) if s else None)


def read_jpeg_raster(path: str):
    """(GeoTiff-like, srs_wkt) from a JPEG + GDAL PAM sidecar (or world
    file).  GeoTransform (gt0..gt5) = (left, res_x, 0, top, 0, -res_y)."""
    import os

    from .tiffio import GeoTiff

    img = decode_jpeg(open(path, "rb").read())
    if img.ndim == 2:
        img = img[None, ...]
    else:
        img = np.moveaxis(img, 2, 0)
    gt = srs = None
    if os.path.exists(path + ".aux.xml"):
        gt, srs = read_pam_georef(path)
    else:
        base = os.path.splitext(path)[0]
        for ext in (".jgw", ".wld", ".jpw"):
            if os.path.exists(base + ext):
                a, d, b, e, cx, fy = (float(x) for x in
                                      open(base + ext).read().split()[:6])
                gt = (cx - a / 2.0, a, b, fy - e / 2.0, d, e)
                break
    if gt is None:
        gt = (0.0, 1.0, 0.0, float(img.shape[1]), 0.0, -1.0)
    g = GeoTiff(img, left=gt[0], top=gt[3], res_x=gt[1], res_y=-gt[5],
                nodata=None, tags={"source": path})
    if srs:
        from ..io.shapefile import parse_prj_text
        crs = parse_prj_text(srs)
        if crs[0] == "utm":
            g.tags["utm"] = crs[1]
    return g, srs
