"""Conformal projected input CRSes, pure numpy: Web Mercator and Lambert
Conformal Conic (2SP).

Fills more of the reference's "any projected input CRS" warp surface
(/root/reference/dggstools/rhpx/raster_to_rhpx.py:58-77, which delegates to
rasterio/PROJ) in an environment with no PROJ database:

- Web Mercator / EPSG:3857 ("Popular Visualisation Pseudo-Mercator") — the
  de-facto CRS of every web tile pyramid.  Spherical Mercator evaluated on
  the WGS84 semi-major axis with geodetic latitude taken unmodified (the
  EPSG:3857 definition, method code 1024).
- Lambert Conformal Conic, 2 standard parallels (EPSG method 9802, Snyder
  1987 eqs 15-1..15-11 ellipsoidal) — the backbone of national grids and
  NAD83 state-plane zones.  Parameters come in through the CRS string
  (`lcc:lat1,lat2,lat0,lon0[,fe,fn]`, angles in degrees, offsets in meters,
  WGS84 ellipsoid) since there is no PROJ database to look them up.

Formulas and constants are from the public literature (Snyder, "Map
Projections — A Working Manual", USGS PP 1395; EPSG Guidance Note 7-2).
"""
from __future__ import annotations

import numpy as np

_R = 6378137.0      # WGS84 semi-major axis == EPSG:3857 sphere radius
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)

# EPSG:3857 official extent: |lat| <= atan(sinh(pi)) ~ 85.05112878 deg
WEBMERC_MAX_LAT = float(np.degrees(np.arctan(np.sinh(np.pi))))


def webmerc_fwd(lon_deg, lat_deg):
    """Geodetic degrees -> Web Mercator (x, y) meters.  Latitudes beyond the
    projection's ±85.051° extent map FAR outside any raster (±1e18) rather
    than clipping onto the edge — during an inverse warp a clipped edge
    value would sample the source's border row across the whole polar cap
    instead of falling out of bounds to nodata."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.clip(lat, -WEBMERC_MAX_LAT, WEBMERC_MAX_LAT))
    y = _R * np.log(np.tan(np.pi / 4.0 + phi / 2.0))
    oob = np.abs(lat) > WEBMERC_MAX_LAT
    if np.any(oob):
        y = np.where(oob, np.sign(lat) * 1e18, y)
    return _R * lam, y


def webmerc_inv(x, y):
    """Web Mercator (x, y) meters -> geodetic degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lat = np.pi / 2.0 - 2.0 * np.arctan(np.exp(-y / _R))
    return np.degrees(x / _R), np.degrees(lat)


class LCCParams:
    """Lambert Conformal Conic 2SP constants (Snyder 15-1..15-11 / EPSG
    9802).  Angles in radians; a/e2 default to WGS84 but stay
    parameterizable so published worked examples on other ellipsoids can be
    checked directly."""

    def __init__(self, lat1, lat2, lat0, lon0, fe=0.0, fn=0.0,
                 a=_A, e2=_E2):
        if np.isclose(lat1 + lat2, 0.0):
            raise ValueError("LCC standard parallels must not be "
                             "symmetric about the equator")
        self.lon0, self.fe, self.fn = lon0, fe, fn
        self.a, self.e2 = a, e2
        self.e = e = np.sqrt(e2)
        m1, m2 = _m(lat1, e2), _m(lat2, e2)
        t0, t1, t2 = _t(lat0, e), _t(lat1, e), _t(lat2, e)
        if np.isclose(lat1, lat2):
            self.n = float(np.sin(lat1))       # 1SP degenerate limit
        else:
            self.n = float((np.log(m1) - np.log(m2))
                           / (np.log(t1) - np.log(t2)))
        self.F = float(m1 / (self.n * t1 ** self.n))
        self.rho0 = float(a * self.F * t0 ** self.n)


def _m(lat, e2):
    s = np.sin(lat)
    return np.cos(lat) / np.sqrt(1.0 - e2 * s * s)


def _t(lat, e):
    s = np.sin(lat)
    return (np.tan(np.pi / 4.0 - lat / 2.0)
            / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))


def lcc_fwd(lon_deg, lat_deg, P: LCCParams):
    """Geodetic degrees -> LCC (x, y) meters (Snyder 15-1/15-2)."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    rho = P.a * P.F * _t(phi, P.e) ** P.n
    theta = P.n * (lam - P.lon0)
    return (P.fe + rho * np.sin(theta),
            P.fn + P.rho0 - rho * np.cos(theta))


def lcc_inv(x, y, P: LCCParams):
    """LCC (x, y) meters -> geodetic degrees (Snyder 15-9..15-11; fixed-point
    latitude iteration, converges linearly in e^2 — 8 rounds is double
    precision for any geodetic ellipsoid)."""
    x = np.asarray(x, dtype=np.float64) - P.fe
    ry = P.rho0 - (np.asarray(y, dtype=np.float64) - P.fn)
    sgn = 1.0 if P.n >= 0 else -1.0
    rho = sgn * np.hypot(x, ry)
    theta = np.arctan2(sgn * x, sgn * ry)
    tp = (rho / (P.a * P.F)) ** (1.0 / P.n)
    phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
    e = P.e
    for _ in range(8):
        s = e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            tp * ((1.0 - s) / (1.0 + s)) ** (e / 2.0))
    return np.degrees(P.lon0 + theta / P.n), np.degrees(phi)


def parse_lcc_crs(crs: str) -> LCCParams:
    """`lcc:lat1,lat2,lat0,lon0[,fe,fn]` (degrees / meters, WGS84) ->
    LCCParams.  Raises ValueError on anything else."""
    if not crs.lower().startswith("lcc:"):
        raise ValueError(f"not an LCC CRS: {crs!r}")
    parts = crs[4:].split(",")
    if len(parts) not in (4, 6):
        raise ValueError(f"LCC CRS needs 4 or 6 numbers "
                         f"(lat1,lat2,lat0,lon0[,fe,fn]): {crs!r}")
    try:
        v = [float(p) for p in parts]
    except ValueError:
        raise ValueError(f"bad LCC parameter in {crs!r}")
    fe, fn = (v[4], v[5]) if len(v) == 6 else (0.0, 0.0)
    return LCCParams(np.radians(v[0]), np.radians(v[1]),
                     np.radians(v[2]), np.radians(v[3]), fe, fn)


def is_webmerc(crs: str) -> bool:
    return crs.lower() in ("webmerc", "epsg:3857", "web_mercator")


# ---------------------------------------------------------------------------
# Polar Stereographic (Snyder 1987 ch. 21, ellipsoidal; EPSG method 9810/9829)
# and the spherical Sinusoidal projection on the authalic sphere (the MODIS
# grid).  Same public-formula approach as LCC above.
# ---------------------------------------------------------------------------

class PolarStereoParams:
    """north: aspect; lat_ts: standard parallel (variant B, e.g. EPSG:3413
    lat_ts=70) OR None with k0 given (variant A, e.g. UPS k0=0.994); lon0,
    fe, fn in radians/meters.  a/f default WGS84 (overridable for goldens)."""

    def __init__(self, north: bool, lon0: float, lat_ts: float | None = None,
                 k0: float | None = None, fe: float = 0.0, fn: float = 0.0,
                 a: float = _A, f: float = _F):
        self.north = north
        self.lon0 = lon0
        self.fe, self.fn = fe, fn
        self.a = a
        e2 = f * (2.0 - f)
        self.e = np.sqrt(e2)
        self.e2 = e2
        if lat_ts is not None:
            ts = abs(lat_ts)
            self.rho_scale = a * _m(ts, e2) / _t(ts, self.e)
        else:
            k0 = 0.994 if k0 is None else k0
            self.rho_scale = (2.0 * a * k0
                              / np.sqrt((1.0 + self.e) ** (1.0 + self.e)
                                        * (1.0 - self.e) ** (1.0 - self.e)))


def pstereo_fwd(lon_deg, lat_deg, P: PolarStereoParams):
    """Geodetic degrees -> polar stereographic meters (Snyder 21-33/34)."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    if not P.north:
        lam, phi = -lam, -phi
    rho = P.rho_scale * _t(phi, P.e)
    dl = lam - (P.lon0 if P.north else -P.lon0)
    x = rho * np.sin(dl)
    y = -rho * np.cos(dl)
    if not P.north:
        x, y = -x, -y
    return P.fe + x, P.fn + y


def pstereo_inv(x, y, P: PolarStereoParams):
    """Polar stereographic meters -> geodetic degrees (Snyder 21-39/40 with
    the standard fixed-point latitude iteration)."""
    xx = np.asarray(x, dtype=np.float64) - P.fe
    yy = np.asarray(y, dtype=np.float64) - P.fn
    if not P.north:
        xx, yy = -xx, -yy
    rho = np.hypot(xx, yy)
    t = rho / P.rho_scale
    phi = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(8):
        s = P.e * np.sin(phi)
        phi = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (P.e / 2.0))
    lam = (P.lon0 if P.north else -P.lon0) + np.arctan2(xx, -yy)
    if not P.north:
        lam, phi = -lam, -phi
    lam = np.mod(lam + np.pi, 2.0 * np.pi) - np.pi   # wrap to [-180, 180)
    return np.degrees(lam), np.degrees(phi)


def parse_pstereo_crs(crs: str) -> PolarStereoParams:
    """Accepted spellings: 'epsg:3413' (NSIDC Sea Ice North: lat_ts 70,
    lon0 -45), 'epsg:3031' (Antarctic PS: lat_ts -71, lon0 0), 'ups:N'/'ups:S'
    (k0 0.994, fe/fn 2,000,000), 'pstereo:lat_ts,lon0[,fe,fn]'."""
    c = crs.lower()
    if c == "epsg:3413":
        return PolarStereoParams(True, np.radians(-45.0),
                                 lat_ts=np.radians(70.0))
    if c == "epsg:3031":
        return PolarStereoParams(False, 0.0, lat_ts=np.radians(71.0))
    if c in ("ups:n", "ups:s"):
        return PolarStereoParams(c == "ups:n", 0.0, k0=0.994,
                                 fe=2_000_000.0, fn=2_000_000.0)
    if c.startswith("pstereo:"):
        parts = c[8:].split(",")
        if len(parts) not in (2, 4):
            raise ValueError(f"pstereo CRS needs lat_ts,lon0[,fe,fn]: {crs!r}")
        v = [float(p) for p in parts]
        fe, fn = (v[2], v[3]) if len(v) == 4 else (0.0, 0.0)
        return PolarStereoParams(v[0] >= 0, np.radians(v[1]),
                                 lat_ts=np.radians(v[0]), fe=fe, fn=fn)
    raise ValueError(f"not a polar stereographic CRS: {crs!r}")


def is_pstereo(crs: str) -> bool:
    try:
        parse_pstereo_crs(crs)
        return True
    except ValueError:
        return False


_R_AUTHALIC = 6371007.181       # MODIS sinusoidal sphere == rHEALPix authalic

def sinu_fwd(lon_deg, lat_deg):
    """Spherical sinusoidal on the authalic sphere (the MODIS grid):
    x = R*lon*cos(lat), y = R*lat."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    return _R_AUTHALIC * lam * np.cos(phi), _R_AUTHALIC * phi


def sinu_inv(x, y):
    phi = np.asarray(y, dtype=np.float64) / _R_AUTHALIC
    c = np.cos(phi)
    lam = np.where(np.abs(c) > 1e-12,
                   np.asarray(x, dtype=np.float64) / (_R_AUTHALIC * c), 0.0)
    return np.degrees(lam), np.degrees(phi)


def is_sinu(crs: str) -> bool:
    return crs.lower() in ("sinu", "sinusoidal", "modis")
