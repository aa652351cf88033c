"""REAL GeoPackage read/write on stdlib sqlite3 — no GDAL/fiona needed.

The reference stores cell tables as GPKG feature layers via GeoPandas and adds
its rhealpix metadata dict as JSON row id=1 of a gpkg_metadata table with
md_standard_uri http://www.iaaa.es/geo2dggs/spec/1
(/root/reference/dggstools/rhpx/utils/storage.py:32-113).  This module
reproduces that scheme directly: the GPKG core tables (gpkg_spatial_ref_sys,
gpkg_contents, gpkg_geometry_columns), the feature layer with GeoPackage
binary geometry (GP header + ISO WKB), and the identical metadata extension
rows — so a GeoPackage written here is readable by GDAL/QGIS and vice versa.

Scale note: SQLite is a single-writer driver-side SINK for final cell tables
(what the reference uses it for); the distributed interchange format stays
partitioned parquet (io.storage).  The write streams Dataset batches through
the driver without materializing the whole table."""
from __future__ import annotations

import json
import os
import sqlite3
import struct

import numpy as np
import pyarrow as pa

from .storage import META_SPEC_URI, _NpEncoder

_SRS_RHPX = 100000


def _wkb_polygon(xs: np.ndarray, ys: np.ndarray) -> bytes:
    """Little-endian ISO WKB polygon with one exterior ring (closed)."""
    n = len(xs)
    out = bytearray(struct.pack("<BII", 1, 3, 1))
    out += struct.pack("<I", n)
    for x, y in zip(xs, ys):
        out += struct.pack("<dd", x, y)
    return bytes(out)


def _wkb_polygon_rings(rings: list[np.ndarray]) -> bytes:
    """Little-endian ISO WKB POLYGON from (n,2) ring arrays (auto-closed)."""
    out = bytearray(struct.pack("<BII", 1, 3, len(rings)))
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        if len(r) and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        out += struct.pack("<I", len(r))
        out += r.astype("<f8").tobytes()
    return bytes(out)


def _wkb_linestring(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, dtype=np.float64)
    return struct.pack("<BII", 1, 2, len(coords)) + coords.astype("<f8").tobytes()


def _wkb_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, 1, x, y)


def _named_srs(crs: str, grid) -> tuple[int, list]:
    """-> (srs_id, extra gpkg_spatial_ref_sys rows to insert) for an engine
    CRS name.  UTM definitions carry a 'UTM_Zone_NNh' token so
    io.shapefile.parse_prj_text round-trips them."""
    if crs == "geographic":
        return 4326, []
    if crs == "rhealpix":
        return _SRS_RHPX, []
    if crs.lower().startswith(("utm:", "epsg:326", "epsg:327")):
        from ..core.tmerc import parse_utm_crs
        zone, south = parse_utm_crs(crs)
        srs_id = (32700 if south else 32600) + zone
        h = "S" if south else "N"
        wkt = (f'PROJCS["WGS 84 / UTM_Zone_{zone}{h}",GEOGCS["WGS 84",'
               f'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],'
               f'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
               f'PROJECTION["Transverse_Mercator"],'
               f'PARAMETER["latitude_of_origin",0],'
               f'PARAMETER["central_meridian",{zone * 6 - 183}],'
               f'PARAMETER["scale_factor",0.9996],'
               f'PARAMETER["false_easting",500000],'
               f'PARAMETER["false_northing",{10000000 if south else 0}],'
               f'UNIT["metre",1]]')
        return srs_id, [(f"WGS 84 / UTM zone {zone}{h}", srs_id, "EPSG",
                         srs_id, wkt, None)]
    raise ValueError(f"unsupported output CRS for GeoPackage: {crs!r}")


def write_feature_geopackage(feats: list[dict], attrs: list[dict], path: str,
                             crs: str = "geographic",
                             layer_name: str = "data", grid=None):
    """Generic vector feature layer -> GeoPackage.  feats are engine dicts
    ({rings} polygons, {coords} lines/points) with coordinates ALREADY in the
    target crs; attrs are per-feature attribute dicts (uniform keys).  The
    write side of the reference's geopandas to_file(driver='GPKG')
    (vectorutils.py:42-51)."""
    from ..core.rhpx import DEFAULT_GRID

    grid = grid or DEFAULT_GRID
    srs_id, extra_srs = _named_srs(crs, grid)
    con = _gpkg_create(path, grid)
    if extra_srs:
        con.executemany("INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
                        extra_srs)

    def geom_of(ft):
        if "rings" in ft:
            return "POLYGON", _wkb_polygon_rings(ft["rings"]), \
                np.vstack(ft["rings"])
        coords = np.atleast_2d(np.asarray(ft["coords"], dtype=np.float64))
        if len(coords) == 1:
            return "POINT", _wkb_point(coords[0, 0], coords[0, 1]), coords
        return "LINESTRING", _wkb_linestring(coords), coords

    gtypes = set()
    rows = []
    gmin = [np.inf, np.inf]
    gmax = [-np.inf, -np.inf]
    attr_cols = sorted({k for a in attrs for k in a}) if attrs else []
    for ft, at in zip(feats, attrs if attrs else [{}] * len(feats)):
        gt, wkb, pts = geom_of(ft)
        gtypes.add(gt)
        env = (float(pts[:, 0].min()), float(pts[:, 0].max()),
               float(pts[:, 1].min()), float(pts[:, 1].max()))
        gmin[0] = min(gmin[0], env[0]); gmax[0] = max(gmax[0], env[1])
        gmin[1] = min(gmin[1], env[2]); gmax[1] = max(gmax[1], env[3])
        rows.append((_gp_header(srs_id, *env) + wkb,
                     *[at.get(c) for c in attr_cols]))

    gtype = gtypes.pop() if len(gtypes) == 1 else "GEOMETRY"
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', ?, ?, 0, 0)",
        (layer_name, gtype, srs_id))

    def sql_type(c):
        for a in attrs:
            v = a.get(c)
            if v is not None:
                return {int: "INTEGER", float: "REAL", bool: "INTEGER",
                        bytes: "BLOB"}.get(type(v), "TEXT")
        return "TEXT"

    cols_sql = "".join(f', "{c}" {sql_type(c)}' for c in attr_cols)
    con.execute(f'CREATE TABLE "{layer_name}" (fid INTEGER PRIMARY KEY '
                f"AUTOINCREMENT, geom BLOB{cols_sql})")
    ph = ",".join("?" * (1 + len(attr_cols)))
    cols = "".join(f', "{c}"' for c in attr_cols)
    con.executemany(
        f'INSERT INTO "{layer_name}" (geom{cols}) VALUES ({ph})', rows)
    con.execute(
        "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
        "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
        (layer_name, "features", layer_name,
         gmin[0] if rows else None, gmin[1] if rows else None,
         gmax[0] if rows else None, gmax[1] if rows else None, srs_id))
    con.commit()
    con.close()
    return len(rows)


def _gp_header(srs_id: int, minx, maxx, miny, maxy) -> bytes:
    """GeoPackage binary header: magic GP, version 0, flags=envelope[xy]+LE."""
    return b"GP" + bytes([0, 0b00000011]) + struct.pack(
        "<i4d", srs_id, minx, maxx, miny, maxy)


def _cell_geom_blob(cellid: str, grid) -> tuple[bytes, tuple]:
    from ..core.rhpx import cell_vertices
    verts = cell_vertices(cellid, grid)          # [(ul),(ur),(dr),(dl)]
    xs = np.array([v[0] for v in verts] + [verts[0][0]])
    ys = np.array([v[1] for v in verts] + [verts[0][1]])
    env = (float(xs.min()), float(xs.max()), float(ys.min()), float(ys.max()))
    return _gp_header(_SRS_RHPX, *env) + _wkb_polygon(xs, ys), env


def _gpkg_create(path: str, grid) -> sqlite3.Connection:
    """Fresh GPKG file with the core tables and the standard srs rows
    (delete-before-write contract, reference storage.py:38-40)."""
    try:
        os.remove(path)
    except OSError:
        pass
    con = sqlite3.connect(path)
    con.execute("PRAGMA application_id = 1196444487")     # 'GPKG'
    con.execute("PRAGMA user_version = 10200")            # GeoPackage 1.2
    con.execute(
        "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, "
        "srs_id INTEGER PRIMARY KEY, organization TEXT NOT NULL, "
        "organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, "
        "description TEXT)")
    con.executemany(
        "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        [("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
         ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
         ("WGS 84", 4326, "EPSG", 4326,
          'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
          '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",'
          '0.0174532925199433]]', None),
         ("rHEALPix", _SRS_RHPX, "IAAA", _SRS_RHPX, grid.to_wkt(), None)])
    con.execute(
        "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, "
        "data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT "
        "DEFAULT '', last_change DATETIME NOT NULL DEFAULT "
        "(strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE, min_y DOUBLE, "
        "max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)")
    con.execute(
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, "
        "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, "
        "srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, "
        "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))")
    return con


_SQL_TYPES = {pa.int64(): "INTEGER", pa.int32(): "INTEGER",
              pa.int16(): "INTEGER", pa.uint8(): "INTEGER",
              pa.float64(): "REAL", pa.float32(): "REAL",
              pa.string(): "TEXT", pa.bool_(): "INTEGER"}


def write_geopackage(ds, path: str, meta: dict, layer_name: str = "data",
                     geo_id_column_name: str = "cellid", grid=None):
    """Dataset/Table of cell rows -> GeoPackage with cell-boundary POLYGON
    geometries in the rhealpix planar CRS and the reference's metadata rows.
    Mirrors geodataframe_to_geopackage (reference storage.py:32-69) including
    the delete-before-write contract."""
    from ..core.rhpx import DEFAULT_GRID

    grid = grid or DEFAULT_GRID
    con = _gpkg_create(path, grid)
    con.execute(
        "INSERT INTO gpkg_geometry_columns VALUES (?, 'geom', 'POLYGON', ?, 0, 0)",
        (layer_name, _SRS_RHPX))

    schema = ds.schema() if hasattr(ds, "schema") and not isinstance(ds, pa.Table) \
        else ds.schema
    names = list(schema.names)
    types = list(schema.types)
    attr_cols = [(n, _SQL_TYPES.get(t, "TEXT")) for n, t in zip(names, types)]
    cols_sql = ", ".join(f'"{n}" {t}' for n, t in attr_cols)
    con.execute(f'CREATE TABLE "{layer_name}" (fid INTEGER PRIMARY KEY '
                f"AUTOINCREMENT, geom BLOB, {cols_sql})")

    placeholders = ",".join("?" * (1 + len(attr_cols)))
    insert = (f'INSERT INTO "{layer_name}" (geom, '
              + ",".join(f'"{n}"' for n, _ in attr_cols)
              + f") VALUES ({placeholders})")
    gmin = [np.inf, np.inf]
    gmax = [-np.inf, -np.inf]

    def batches():
        if isinstance(ds, pa.Table):
            yield ds
        else:
            yield from ds.iter_batches(batch_format="pyarrow",
                                       batch_size=4096)

    nrows = 0
    for bt in batches():
        cells = bt.column(geo_id_column_name).to_pylist()
        cols = [bt.column(n).to_pylist() for n in names]
        rows = []
        for i, cid in enumerate(cells):
            blob, env = _cell_geom_blob(cid, grid)
            gmin[0] = min(gmin[0], env[0])
            gmax[0] = max(gmax[0], env[1])
            gmin[1] = min(gmin[1], env[2])
            gmax[1] = max(gmax[1], env[3])
            rows.append((blob, *[c[i] for c in cols]))
        con.executemany(insert, rows)
        nrows += len(rows)
    con.execute(
        "INSERT INTO gpkg_contents (table_name, data_type, identifier, "
        "min_x, min_y, max_x, max_y, srs_id) VALUES (?,?,?,?,?,?,?,?)",
        (layer_name, "features", layer_name,
         gmin[0] if nrows else None, gmin[1] if nrows else None,
         gmax[0] if nrows else None, gmax[1] if nrows else None, _SRS_RHPX))

    # the reference's metadata extension rows, byte-for-byte scheme
    # (storage.py:53-66)
    con.execute(
        "CREATE TABLE gpkg_extensions (table_name TEXT, column_name TEXT, "
        "extension_name TEXT NOT NULL, definition TEXT NOT NULL, "
        "scope TEXT NOT NULL)")
    con.execute(
        "INSERT INTO gpkg_extensions (table_name, extension_name, definition, "
        "scope) VALUES ('gpkg_metadata', 'gpkg_metadata', "
        "'http://www.geopackage.org/spec120/#extension_metadata', "
        "'read-write')")
    con.execute(
        "INSERT INTO gpkg_extensions (table_name, extension_name, definition, "
        "scope) VALUES ('gpkg_metadata_reference', 'gpkg_metadata', "
        "'http://www.geopackage.org/spec120/#extension_metadata', "
        "'read-write')")
    con.execute(
        "CREATE TABLE gpkg_metadata (id INTEGER PRIMARY KEY AUTOINCREMENT,"
        "md_scope TEXT NOT NULL DEFAULT 'dataset', md_standard_uri TEXT NOT "
        "NULL, mime_type TEXT NOT NULL DEFAULT 'text/xml', metadata TEXT NOT "
        "NULL DEFAULT '')")
    con.execute(
        "INSERT INTO gpkg_metadata (id, md_scope, md_standard_uri, mime_type, "
        "metadata) VALUES (1, 'dataset', ?, 'application/json', ?)",
        (META_SPEC_URI, json.dumps(meta, cls=_NpEncoder)))
    con.commit()
    con.close()
    return nrows


def _parse_gp_blob(blob: bytes):
    """GeoPackage binary -> (wkb bytes, srs_id).  Envelope skipped by flag."""
    assert blob[:2] == b"GP", "not GeoPackage binary"
    flags = blob[3]
    env_ind = (flags >> 1) & 0x07
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env_ind]
    srs_id = struct.unpack_from("<i", blob, 4)[0]
    return blob[8 + env_len:], srs_id


def _wkb_type(typ: int):
    """(base_type, coord_dim, srid_bytes) for a WKB type word: ISO offsets
    (1000 Z / 2000 M / 3000 ZM) and EWKB flag bits (0x80000000 Z,
    0x40000000 M, 0x20000000 embedded SRID -> 4 extra header bytes) — the
    flags must be masked BEFORE the % 1000, or a flagged type word computes
    a nonsense base."""
    t = typ & 0x0FFFFFFF
    base = t % 1000
    iso = t // 1000
    has_z = iso in (1, 3) or bool(typ & 0x80000000)
    has_m = iso in (2, 3) or bool(typ & 0x40000000)
    return base, 2 + int(has_z) + int(has_m), 4 if typ & 0x20000000 else 0


def _wkb_envelope(wkb: bytes):
    """min/max x/y of any 2D/Z WKB geometry (vertices scanned)."""
    le = wkb[0] == 1
    order = "<" if le else ">"
    typ = struct.unpack_from(order + "I", wkb, 1)[0]
    base, dim, skip = _wkb_type(typ)
    pos = 5 + skip

    def rings(pos, nrings):
        pts = []
        for _ in range(nrings):
            n = struct.unpack_from(order + "I", wkb, pos)[0]
            pos += 4
            arr = np.frombuffer(wkb, dtype=np.dtype(order + "f8"),
                                count=n * dim, offset=pos)
            pts.append(arr.reshape(n, dim)[:, :2])
            pos += n * dim * 8
        return np.concatenate(pts), pos

    if base == 1:        # point
        xy = struct.unpack_from(order + "dd", wkb, pos)
        return xy[0], xy[0], xy[1], xy[1]
    if base == 2:        # linestring
        n = struct.unpack_from(order + "I", wkb, pos)[0]
        arr = np.frombuffer(wkb, dtype=np.dtype(order + "f8"),
                            count=n * dim, offset=pos + 4).reshape(n, dim)
        return (float(arr[:, 0].min()), float(arr[:, 0].max()),
                float(arr[:, 1].min()), float(arr[:, 1].max()))
    if base == 3:        # polygon
        nrings = struct.unpack_from(order + "I", wkb, pos)[0]
        pts, _ = rings(pos + 4, nrings)
        return (float(pts[:, 0].min()), float(pts[:, 0].max()),
                float(pts[:, 1].min()), float(pts[:, 1].max()))
    if base in (4, 5, 6, 7):     # multi*/collection: recurse members
        n = struct.unpack_from(order + "I", wkb, pos)[0]
        pos += 4
        envs = []
        for _ in range(n):
            sub = wkb[pos:]
            e = _wkb_envelope(sub)
            envs.append(e)
            pos += _wkb_length(sub)
        envs = np.array(envs)
        return (float(envs[:, 0].min()), float(envs[:, 1].max()),
                float(envs[:, 2].min()), float(envs[:, 3].max()))
    raise NotImplementedError(f"WKB type {typ}")


def _wkb_length(wkb: bytes) -> int:
    order = "<" if wkb[0] == 1 else ">"
    typ = struct.unpack_from(order + "I", wkb, 1)[0]
    base, dim, skip = _wkb_type(typ)
    pos = 5 + skip
    if base == 1:
        return pos + dim * 8
    if base == 2:
        n = struct.unpack_from(order + "I", wkb, pos)[0]
        return pos + 4 + n * dim * 8
    if base == 3:
        nrings = struct.unpack_from(order + "I", wkb, pos)[0]
        pos += 4
        for _ in range(nrings):
            n = struct.unpack_from(order + "I", wkb, pos)[0]
            pos += 4 + n * dim * 8
        return pos
    n = struct.unpack_from(order + "I", wkb, pos)[0]
    pos += 4
    for _ in range(n):
        pos += _wkb_length(wkb[pos:])
    return pos


def read_geopackage(path: str, layer: str | None = None):
    """-> (ray.data.Dataset of attributes + geometry envelope columns, meta).
    The sqlite read happens on the driver (SQLite files aren't splittable);
    the result is immediately a Dataset for distributed processing."""
    import ray.data as rd

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    cur = con.cursor()
    if layer is None:
        layer = cur.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type='features'"
        ).fetchone()[0]
    geom_col = cur.execute(
        "SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?",
        (layer,)).fetchone()
    geom_col = geom_col[0] if geom_col else None
    cols = [r[1] for r in cur.execute(f'PRAGMA table_info("{layer}")')]
    attr_cols = [c for c in cols if c not in ("fid", geom_col)]
    sel = ", ".join([f'"{c}"' for c in attr_cols]
                    + ([f'"{geom_col}"'] if geom_col else []))
    rows = cur.execute(f'SELECT {sel} FROM "{layer}"').fetchall()
    data = {c: [r[i] for r in rows] for i, c in enumerate(attr_cols)}
    if geom_col:
        envs = []
        for r in rows:
            blob = r[-1]
            if blob is None:
                envs.append((np.nan,) * 4)
                continue
            wkb, _srs = _parse_gp_blob(blob)
            envs.append(_wkb_envelope(wkb))
        ea = np.array(envs, dtype=np.float64).reshape(-1, 4)
        for i, name in enumerate(("geom_min_x", "geom_max_x",
                                  "geom_min_y", "geom_max_y")):
            data[name] = ea[:, i]
    meta = {}
    try:
        row = cur.execute(
            "SELECT metadata FROM gpkg_metadata WHERE id=1").fetchone()
        if row:
            meta = json.loads(row[0])
    except sqlite3.OperationalError:
        pass
    con.close()
    tbl = pa.table({k: pa.array(v) for k, v in data.items()})
    return rd.from_arrow(tbl), meta


def get_gpkg_rhpx_metadata(path: str) -> dict:
    """Reference get_gpkg_rhpx_metadata (storage.py:100-113)."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    row = con.execute("SELECT metadata FROM gpkg_metadata WHERE id=1").fetchone()
    con.close()
    return json.loads(row[0])


def rhealpix_to_geopackage(input_tif: str, output_gpkg: str, n_side: int = 3,
                           geo_id_column_name: str = "cellid",
                           layer_name: str = "data", add_uid: bool = False,
                           values_in_json: bool = False,
                           store_nodata: bool = False, grid=None):
    """Composite: rHPX raster -> GPKG cell layer (reference storage.py:71-83).
    `grid` carries the FULL GridConfig (cap squares included)."""
    from ..core.rhpx import GridConfig
    from ..ops.raster2dggs import geotiff_to_tiles, tiles_to_cells

    grid = grid or GridConfig(n_side, 1, 0)
    tiles, meta = geotiff_to_tiles(input_tif, grid)
    cells = tiles_to_cells(tiles, meta, grid, store_nodata=store_nodata,
                           values_in_json=values_in_json, add_uid=add_uid)
    if geo_id_column_name != "cellid":
        cells = cells.rename_columns({"cellid": geo_id_column_name})
        # record the rename so the metadata-driven read side resolves it
        meta = dict(meta, geo_id_column_name=geo_id_column_name)
    write_geopackage(cells, output_gpkg, meta, layer_name=layer_name,
                     geo_id_column_name=geo_id_column_name, grid=grid)
    return meta


def geopackage_to_rhealpix(input_gpkg: str, output_tif: str, nodata=0,
                           n_side: int = 3,
                           geo_id_column_name: str | None = None, grid=None):
    """Composite inverse (reference storage.py:86-97).  The cell column name
    defaults to the one recorded in the GPKG metadata at write time."""
    import json as _json

    from ..core.rhpx import GridConfig
    from ..core.tiffio import GeoTiff, write_geotiff
    from ..ops.cells2raster import cells_to_raster_array

    ds, meta = read_geopackage(input_gpkg)
    drop = [c for c in ds.schema().names if c.startswith("geom_")]
    if drop:
        ds = ds.drop_columns(drop)
    if meta.get("rhealpixdggs"):
        grid = GridConfig.from_meta(meta["rhealpixdggs"])
    elif grid is None:
        grid = GridConfig(n_side, 1, 0)
    if geo_id_column_name is None:
        geo_id_column_name = meta.get("geo_id_column_name", "cellid")
    if meta.get("nodata") is None:
        meta = dict(meta, nodata=nodata, nodatavals=[nodata] * meta["nbands"])
    arr, _ = cells_to_raster_array(ds, meta=meta, grid=grid,
                                   cell_col=geo_id_column_name)
    write_geotiff(output_tif, GeoTiff(
        arr, meta["left"], meta["top"], meta["res"], meta["res"],
        nodata=meta["nodata"],
        tags={"GDAL_METADATA":
              f'<GDALMetadata><Item name="n_side">{grid.n_side}</Item>'
              f'<Item name="user_metadata">'
              f'{_json.dumps(meta, cls=_NpEncoder)}</Item></GDALMetadata>'}))
    return meta


def _wkb_rings(wkb: bytes) -> list[np.ndarray]:
    """POLYGON/MULTIPOLYGON WKB -> list of (n, 2) XY ring arrays (Z dropped)."""
    order = "<" if wkb[0] == 1 else ">"
    typ = struct.unpack_from(order + "I", wkb, 1)[0]
    base, dim, skip = _wkb_type(typ)
    if base == 3:
        nrings = struct.unpack_from(order + "I", wkb, 5 + skip)[0]
        pos = 9 + skip
        rings = []
        for _ in range(nrings):
            n = struct.unpack_from(order + "I", wkb, pos)[0]
            pos += 4
            arr = np.frombuffer(wkb, dtype=np.dtype(order + "f8"),
                                count=n * dim, offset=pos).reshape(n, dim)
            rings.append(arr[:, :2].copy())
            pos += n * dim * 8
        return rings
    if base == 6:        # multipolygon: concatenate member rings
        n = struct.unpack_from(order + "I", wkb, 5 + skip)[0]
        pos = 9 + skip
        rings = []
        for _ in range(n):
            sub = wkb[pos:]
            rings.extend(_wkb_rings(sub))
            pos += _wkb_length(sub)
        return rings
    raise ValueError(f"not a polygon WKB (type {typ})")


def read_gpkg_polygons(path: str, layer: str | None = None):
    """GPKG polygon layer -> (feats, attrs, crs) like io.shapefile's reader:
    feats = [{feature_id, rings:[(n,2) lonlat]}], attrs = per-feature dicts of
    the layer's non-geometry columns, crs = parse_prj_text of the srs WKT.
    UTM layer coordinates are inverted through core.tmerc."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    cur = con.cursor()
    if layer is None:
        layer = cur.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type='features'"
        ).fetchone()[0]
    geom_col, srs_id = cur.execute(
        "SELECT column_name, srs_id FROM gpkg_geometry_columns "
        "WHERE table_name=?", (layer,)).fetchone()
    srs_wkt = cur.execute(
        "SELECT definition FROM gpkg_spatial_ref_sys WHERE srs_id=?",
        (srs_id,)).fetchone()[0]
    from .shapefile import parse_prj_text
    crs = parse_prj_text(srs_wkt)
    cols = [r[1] for r in cur.execute(f'PRAGMA table_info("{layer}")')]
    attr_cols = [c for c in cols if c not in ("fid", geom_col)]
    sel = ", ".join([f'"{geom_col}"'] + [f'"{c}"' for c in attr_cols])
    rows = cur.execute(f'SELECT {sel} FROM "{layer}"').fetchall()
    con.close()

    def tr(arr: np.ndarray) -> np.ndarray:
        if crs[0] == "utm":
            from ..core.tmerc import utm_inv
            zone, north = crs[1]
            lon, lat = utm_inv(arr[:, 0], arr[:, 1], zone, south=not north)
            return np.column_stack([lon, lat])
        if crs[0] != "geographic":
            raise ValueError(
                f"layer {layer}: unsupported srs for feature extraction "
                f"(geographic / UTM only): {srs_wkt[:60]}...")
        return arr

    feats, attrs = [], []
    for i, r in enumerate(rows):
        if r[0] is None:
            continue
        wkb, _srs = _parse_gp_blob(r[0])
        feats.append({"feature_id": i,
                      "rings": [tr(ring) for ring in _wkb_rings(wkb)]})
        attrs.append(dict(zip(attr_cols, r[1:])))
    return feats, attrs, crs


def read_geopackage_features(path: str, layer: str | None = None,
                             property_for_class: str | None = None,
                             fixed_value: int = 1):
    """GPKG polygon layer -> engine feature dicts [{feature_id, rings, value}]
    in lon/lat.  The vector-side twin of the shapefile loader, matching the
    reference's read of gpkg vector layers (storage.py:86-97 via
    geopandas.read_file)."""
    from ..ops.vector2dggs import feature_class_values

    feats, attrs, _crs = read_gpkg_polygons(path, layer)
    if property_for_class is not None:
        classes = [a[property_for_class] for a in attrs]
    else:
        classes = [int(fixed_value)] * len(feats)
    values = feature_class_values(classes)
    for ft, v in zip(feats, values):
        ft["value"] = int(v)
    return feats
