"""Pure-binary ESRI Shapefile reader (.shp geometry + .dbf attributes + .prj
CRS) — the reference's canonical vector input format (its vector tests and
AUID benchmarks read Aragón/Comunidades/Pop_AgricRegion shapefiles through
fiona/pyogrio: /root/reference/tests/data_tests/tests_data.py:195-198,437-500).
fiona/GDAL are absent here, so the (public, frozen) shapefile spec is parsed
directly: big-endian file header, per-record {number, length} + little-endian
shape, dBASE III attribute table.

Shape types: Point(1), PolyLine(3), Polygon(5), MultiPoint(8) and their Z/M
variants (the Z/M payloads trail the XY block and are skipped).  UTM .prj
files are recognized so geometries can be returned in lon/lat for the
cellification pipelines (core.tmerc handles the inverse)."""
from __future__ import annotations

import os
import re
import struct

import numpy as np

_XY_TYPES = {1: "point", 3: "polyline", 5: "polygon", 8: "multipoint",
             11: "point", 13: "polyline", 15: "polygon", 18: "multipoint",
             21: "point", 23: "polyline", 25: "polygon", 28: "multipoint"}


def read_dbf(path: str) -> list[dict]:
    """dBASE III/IV attribute records (C/N/F/L/D field types)."""
    d = open(path, "rb").read()
    nrec, hdrlen, reclen = struct.unpack("<IHH", d[4:12])
    fields = []
    p = 32
    while d[p] != 0x0D:
        name = d[p:p + 11].split(b"\0")[0].decode("latin1")
        ftype = chr(d[p + 11])
        flen = d[p + 16]
        fdec = d[p + 17]
        fields.append((name, ftype, flen, fdec))
        p += 32
    out = []
    p = hdrlen
    for _ in range(nrec):
        deleted = d[p] == 0x2A
        p += 1
        rec = {}
        for name, ftype, flen, fdec in fields:
            raw = d[p:p + flen]
            p += flen
            try:                     # fixtures carry UTF-8 despite dBASE age
                txt = raw.decode("utf-8").strip()
            except UnicodeDecodeError:
                txt = raw.decode("latin1").strip()
            if ftype in ("N", "F"):
                if not txt:
                    rec[name] = None
                elif fdec or "." in txt:
                    rec[name] = float(txt)
                else:
                    rec[name] = int(txt)
            elif ftype == "L":
                rec[name] = txt.upper() in ("T", "Y")
            else:
                rec[name] = txt
        # keep a placeholder for soft-deleted rows: .shp has no deletion
        # flag, so geometries and attributes pair strictly by position —
        # dropping the row here would shift every later feature's attributes
        # (read_shapefile omits the whole feature, GDAL semantics)
        out.append(None if deleted else rec)
    return out


def read_shp(path: str) -> list[dict]:
    """Geometry records: [{type, points|rings|parts, bbox}].  Polygon rings
    and polyline parts are (n, 2) float64 arrays in file coordinates."""
    d = open(path, "rb").read()
    assert struct.unpack(">i", d[:4])[0] == 9994, "not a shapefile"
    shptype = struct.unpack("<i", d[32:36])[0]
    out = []
    p = 100
    while p < len(d):
        _num, clen = struct.unpack(">ii", d[p:p + 8])
        p += 8
        rec_end = p + clen * 2
        st = struct.unpack("<i", d[p:p + 4])[0]
        if st == 0:                       # null shape
            out.append({"type": "null"})
            p = rec_end
            continue
        kind = _XY_TYPES.get(st)
        if kind is None:
            raise NotImplementedError(f"shape type {st}")
        q = p + 4
        if kind == "point":
            x, y = struct.unpack("<2d", d[q:q + 16])
            out.append({"type": "point", "points": np.array([[x, y]])})
        elif kind == "multipoint":
            bbox = struct.unpack("<4d", d[q:q + 32])
            n = struct.unpack("<i", d[q + 32:q + 36])[0]
            pts = np.frombuffer(d, dtype="<f8", count=2 * n,
                                offset=q + 36).reshape(n, 2)
            out.append({"type": "multipoint", "points": pts.copy(),
                        "bbox": bbox})
        else:                             # polyline / polygon
            bbox = struct.unpack("<4d", d[q:q + 32])
            nparts, npts = struct.unpack("<2i", d[q + 32:q + 40])
            parts = np.frombuffer(d, dtype="<i4", count=nparts,
                                  offset=q + 40)
            pts = np.frombuffer(d, dtype="<f8", count=2 * npts,
                                offset=q + 40 + 4 * nparts).reshape(npts, 2)
            bounds = np.append(parts, npts)
            rings = [pts[bounds[i]:bounds[i + 1]].copy()
                     for i in range(nparts)]
            key = "rings" if kind == "polygon" else "parts"
            out.append({"type": kind, key: rings, "bbox": bbox})
        p = rec_end
    return out


def parse_prj_text(wkt: str):
    """-> ("geographic", None) | ("utm", (zone, north)) | ("unknown", wkt).
    Recognizes the WKT1 shapes the reference fixtures use (ETRS89/WGS84 UTM
    zones and plain geographic CRSs)."""
    m = re.search(r"UTM[_ ]Zone[_ ](\d+)(N|S)?", wkt, re.IGNORECASE)
    if m:
        zone = int(m.group(1))
        north = (m.group(2) or "N").upper() == "N"
        return ("utm", (zone, north))
    if wkt.startswith("GEOGCS") or wkt.startswith("GEOGCRS"):
        return ("geographic", None)
    return ("unknown", wkt)


def parse_prj(path: str):
    if not os.path.exists(path):
        return ("geographic", None)
    return parse_prj_text(open(path, encoding="latin1").read())


def read_shapefile(path: str, to_lonlat: bool = True):
    """-> (features, attrs, crs_info).  features are engine dicts:
    polygons {feature_id, rings:[(n,2) lonlat]}, lines {feature_id, coords},
    points {feature_id, coords}.  With to_lonlat, UTM file coordinates are
    inverted through core.tmerc using the zone in the .prj."""
    base = os.path.splitext(path)[0]
    shapes = read_shp(base + ".shp")
    attrs = read_dbf(base + ".dbf") if os.path.exists(base + ".dbf") else \
        [{} for _ in shapes]
    # drop soft-deleted rows as whole features (geometry AND attributes),
    # preserving positional pairing for everything that remains
    if any(a is None for a in attrs):
        kept = [(s, a) for s, a in zip(shapes, attrs) if a is not None]
        shapes = [s for s, _ in kept]
        attrs = [a for _, a in kept]
    crs = parse_prj(base + ".prj")

    def tr(arr: np.ndarray) -> np.ndarray:
        if not to_lonlat or crs[0] == "geographic":
            return arr
        if crs[0] == "utm":
            from ..core.tmerc import utm_inv
            zone, north = crs[1]
            lon, lat = utm_inv(arr[:, 0], arr[:, 1], zone, south=not north)
            return np.column_stack([lon, lat])
        raise ValueError(f"unsupported shapefile CRS: {crs[1][:80]}...")

    feats = []
    for i, s in enumerate(shapes):
        if s["type"] == "polygon":
            feats.append({"feature_id": i,
                          "rings": [tr(r) for r in s["rings"]]})
        elif s["type"] == "polyline":
            feats.append({"feature_id": i,
                          "coords": tr(np.vstack(s["parts"]))})
        elif s["type"] in ("point", "multipoint"):
            feats.append({"feature_id": i, "coords": tr(s["points"])})
        else:
            feats.append({"feature_id": i})
    return feats, attrs, crs
