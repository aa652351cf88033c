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

import functools
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
    """65536-entry LUT: high 8 bits symbol, low 8 bits code length.  A plain
    Python list — the entropy decode indexes it per symbol in a CPython loop,
    where list access beats numpy scalar indexing ~10x."""
    lut = [0] * 65536
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            sym = vals[k]
            k += 1
            lo = code << (16 - ln)
            hi = lo + (1 << (16 - ln))
            lut[lo:hi] = [(int(sym) << 8) | ln] * (hi - lo)
            code += 1
        code <<= 1
    return lut


@functools.lru_cache(maxsize=32)
def _cached_lut(bits: bytes, vals: bytes):
    """Per-process LUT cache: a corpus encoded with one table set (e.g. the
    Annex-K defaults) pays the 65536-entry expansion once, not per image."""
    return _build_lut(list(bits), list(vals))


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
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _cached_lut(bytes(bits), bytes(seg[p + 17:p + 17 + nsym]))
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
    # which we strip — component DC predictors reset there).  Vectorized:
    # in an entropy stream every data 0xFF is followed by a stuffed 0x00, so
    # any 0xFF followed by anything else is a marker — the scan ends at the
    # first one that is not RSTn, RST markers are byte-substring-removable
    # (no false positives), and stuffed zeros collapse with bytes.replace.
    arr = np.frombuffer(data, np.uint8, len(data) - start, start)
    ff = np.flatnonzero(arr[:-1] == 0xFF)
    nxt = arr[ff + 1]
    stop = ff[(nxt != 0x00) & ((nxt < 0xD0) | (nxt > 0xD7))]
    end = int(stop[0]) if stop.size else len(arr)
    seg = data[start:start + end]
    for r in range(8):                     # strip restart markers first
        seg = seg.replace(bytes([0xFF, 0xD0 + r]), b"")
    raw_b = seg.replace(b"\xff\x00", b"\xff")
    L = len(raw_b)

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

    # The entropy decode is the one inherently serial part of the codec, so
    # it runs as a tight CPython loop: bit-reader state in local ints (no
    # method calls) and Huffman LUTs as Python lists (numpy scalar indexing
    # costs ~10x a list index here).
    dc_list = huff_dc
    ac_list = huff_ac
    zz = _ZIGZAG.tolist()
    MASK56 = (1 << 56) - 1
    buf = 0
    nbits = 0
    pos = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and (my * mcux + mx) % restart == 0 \
                    and (my or mx):
                # predictors reset at restart intervals; bits re-align at the
                # stripped marker boundary
                nbits -= nbits % 8
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                dct = dc_list[c["dc_tab"]]
                act = ac_list[c["ac_tab"]]
                cv = c["v"]
                ch = c["h"]
                cbw = c["bw"]
                pred = c["pred"]
                coefs = c["coef"]
                for by in range(cv):
                    for bx in range(ch):
                        coef = coefs[(my * cv + by) * cbw + mx * ch + bx]
                        if nbits < 16:
                            while nbits <= 48:
                                if pos >= L:
                                    buf = (buf << 8) & MASK56
                                else:
                                    buf = ((buf << 8) | raw_b[pos]) & MASK56
                                    pos += 1
                                nbits += 8
                        e = dct[(buf >> (nbits - 16)) & 0xFFFF]
                        s = e >> 8
                        nbits -= e & 0xFF
                        if s:
                            if nbits < s:
                                while nbits <= 48:
                                    if pos >= L:
                                        buf = (buf << 8) & MASK56
                                    else:
                                        buf = ((buf << 8) | raw_b[pos]) \
                                            & MASK56
                                        pos += 1
                                    nbits += 8
                            nbits -= s
                            v = (buf >> nbits) & ((1 << s) - 1)
                            pred += v - (1 << s) + 1 \
                                if v < (1 << (s - 1)) else v
                        coef[0] = pred
                        k = 1
                        while k < 64:
                            if nbits < 16:
                                while nbits <= 48:
                                    if pos >= L:
                                        buf = (buf << 8) & MASK56
                                    else:
                                        buf = ((buf << 8) | raw_b[pos]) \
                                            & MASK56
                                        pos += 1
                                    nbits += 8
                            e = act[(buf >> (nbits - 16)) & 0xFFFF]
                            rs = e >> 8
                            nbits -= e & 0xFF
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break      # EOB
                            k += r
                            if k > 63:
                                break
                            if nbits < s:
                                while nbits <= 48:
                                    if pos >= L:
                                        buf = (buf << 8) & MASK56
                                    else:
                                        buf = ((buf << 8) | raw_b[pos]) \
                                            & MASK56
                                        pos += 1
                                    nbits += 8
                            nbits -= s
                            v = (buf >> nbits) & ((1 << s) - 1)
                            coef[zz[k]] = v - (1 << s) + 1 \
                                if v < (1 << (s - 1)) else v
                            k += 1
                c["pred"] = pred

    planes = []
    for c in comps:
        q = qt[c["tq"]][np.argsort(zz)]    # natural-order quant table
        blocks = (c["coef"] * q[None, :]).reshape(-1, 8, 8).astype(np.float64)
        # IDCT over every block at once: X = A.T @ C @ A
        pix = _A.T @ blocks @ _A + 128.0
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


# --- baseline encoder (Annex K tables) --------------------------------------

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99])
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99])

# standard Huffman tables (T.81 Annex K.3)
_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _enc_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def put(self, code: int, n: int):
        self.buf = (self.buf << n) | code
        self.nbits += n
        while self.nbits >= 8:
            b = (self.buf >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)     # byte stuffing
            self.nbits -= 8
        self.buf &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _scale_q(tbl: np.ndarray, quality: int) -> np.ndarray:
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) RGB (or (h, w) gray) uint8 -> baseline JPEG, 4:4:4, standard
    Annex K quant (quality-scaled) + Huffman tables.  The decode partner is
    decode_jpeg; roundtrip PSNR >= 40 dB at quality >= 85 on natural images."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    qtabs = [_scale_q(_Q_LUMA, quality), _scale_q(_Q_CHROMA, quality)]
    zz = _ZIGZAG
    inv_zz = np.argsort(zz)

    out = bytearray(b"\xff\xd8")
    for tq, tbl in enumerate(qtabs[: 1 if gray else 2]):
        seg = bytes([tq]) + bytes(int(x) for x in tbl[zz])   # zigzag-stored
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(seg)) + seg
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, _DC_L_BITS, _DC_L_VALS), (0x10, _AC_L_BITS, _AC_L_VALS)]
    if not gray:
        tables += [(0x01, _DC_C_BITS, _DC_C_VALS),
                   (0x11, _AC_C_BITS, _AC_C_VALS)]
    for tc, bits, vals in tables:
        seg = bytes([tc] + bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_codes = [_enc_codes(_DC_L_BITS, _DC_L_VALS),
                _enc_codes(_DC_C_BITS, _DC_C_VALS)]
    ac_codes = [_enc_codes(_AC_L_BITS, _AC_L_VALS),
                _enc_codes(_AC_C_BITS, _AC_C_VALS)]

    bw8 = -(-w // 8)
    bh8 = -(-h // 8)
    # pad to 8-multiples by edge replication, block-split, FDCT all at once
    comp_q = []
    for ci, plane in enumerate(planes):
        pad = np.pad(plane, ((0, bh8 * 8 - h), (0, bw8 * 8 - w)), mode="edge")
        blocks = pad.reshape(bh8, 8, bw8, 8).transpose(0, 2, 1, 3) \
            .reshape(-1, 8, 8) - 128.0
        # _A is orthonormal, so the forward transform of the decoder's
        # X = A^T C A inverse is exactly C = A X A^T
        coef = _A @ blocks @ _A.T
        q = qtabs[0 if ci == 0 else 1].reshape(8, 8)      # natural order
        comp_q.append(np.rint(coef / q).astype(np.int64).reshape(-1, 64))

    wbits = _BitWriter()
    pred = [0] * nc
    for bi in range(bh8 * bw8):
        for ci in range(nc):
            ti = 0 if ci == 0 else 1
            blk = comp_q[ci][bi]
            natural = blk.reshape(8, 8).ravel()
            zzblk = natural[zz]
            diff = int(zzblk[0]) - pred[ci]
            pred[ci] = int(zzblk[0])
            s = int(diff).bit_length() if diff != 0 else 0
            mag = diff if diff >= 0 else diff + (1 << s) - 1
            code, ln = dc_codes[ti][s]
            wbits.put(code, ln)
            if s:
                wbits.put(mag & ((1 << s) - 1), s)
            run = 0
            last = 0
            for k in range(1, 64):
                if zzblk[k]:
                    last = k
            for k in range(1, last + 1):
                v = int(zzblk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[ti][0xF0]
                    wbits.put(code, ln)
                    run -= 16
                s = abs(v).bit_length()
                mag = v if v >= 0 else v + (1 << s) - 1
                code, ln = ac_codes[ti][(run << 4) | s]
                wbits.put(code, ln)
                wbits.put(mag & ((1 << s) - 1), s)
                run = 0
            if last < 63:
                code, ln = ac_codes[ti][0x00]
                wbits.put(code, ln)
    wbits.flush()
    out += wbits.out + b"\xff\xd9"
    return bytes(out)
