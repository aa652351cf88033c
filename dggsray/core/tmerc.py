"""Pure-numpy Transverse Mercator (UTM) forward/inverse on WGS84.

Implements the Krüger series in the third flattening n to 6th order, following
the public formulation of Karney, "Transverse Mercator with an accuracy of a
few nanometers", J. Geodesy 85 (2011) — the same series PROJ's `tmerc`
(poder/engsager) evaluates.  At 6th order the error inside a UTM zone is
sub-micrometer, far below the half-cell-width tolerances of any warp.

This fills the reference's "any projected input CRS" warp path
(/root/reference/dggstools/rhpx/raster_to_rhpx.py:58-77, which delegates to
rasterio/PROJ) for the dominant real-world case: UTM/EPSG:326xx/327xx scenes
(Landsat/Sentinel tiling grids), in an environment with no PROJ database.

No external data, no PROJ: constants are the WGS84 defining parameters and
series coefficients printed in the public literature.
"""
from __future__ import annotations

import re

import numpy as np

# WGS84 defining parameters
_A = 6378137.0
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)                 # third flattening
_E = np.sqrt(_F * (2.0 - _F))        # first eccentricity
_K0 = 0.9996                         # UTM scale on the central meridian
_FE = 500_000.0                      # false easting
_FN_SOUTH = 10_000_000.0             # false northing (southern hemisphere)

# rectifying radius A = a/(1+n) (1 + n^2/4 + n^4/64 + n^6/256)
_RECT_A = _A / (1.0 + _N) * (1.0 + _N**2 / 4 + _N**4 / 64 + _N**6 / 256)

_n = _N
# Krüger alpha (forward) / beta (inverse) coefficients, 6th order in n
_ALPHA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 5 * _n**3 / 16 + 41 * _n**4 / 180
    - 127 * _n**5 / 288 + 7891 * _n**6 / 37800,
    13 * _n**2 / 48 - 3 * _n**3 / 5 + 557 * _n**4 / 1440 + 281 * _n**5 / 630
    - 1983433 * _n**6 / 1935360,
    61 * _n**3 / 240 - 103 * _n**4 / 140 + 15061 * _n**5 / 26880
    + 167603 * _n**6 / 181440,
    49561 * _n**4 / 161280 - 179 * _n**5 / 168 + 6601661 * _n**6 / 7257600,
    34729 * _n**5 / 80640 - 3418889 * _n**6 / 1995840,
    212378941 * _n**6 / 319334400,
])
_BETA = np.array([
    _n / 2 - 2 * _n**2 / 3 + 37 * _n**3 / 96 - _n**4 / 360
    - 81 * _n**5 / 512 + 96199 * _n**6 / 604800,
    _n**2 / 48 + _n**3 / 15 - 437 * _n**4 / 1440 + 46 * _n**5 / 105
    - 1118711 * _n**6 / 3870720,
    17 * _n**3 / 480 - 37 * _n**4 / 840 - 209 * _n**5 / 4480
    + 5569 * _n**6 / 90720,
    4397 * _n**4 / 161280 - 11 * _n**5 / 504 - 830251 * _n**6 / 7257600,
    4583 * _n**5 / 161280 - 108847 * _n**6 / 3991680,
    20648693 * _n**6 / 638668800,
])


def _tm_fwd(lon_deg, lat_deg, lon0_deg: float):
    """Transverse Mercator forward: (lon, lat) degrees -> unscaled (x, y) in
    meters relative to the central meridian lon0 (no k0 / false offsets)."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    s = np.sin(phi)
    # conformal latitude tangent: tau' = tau*sqrt(1+sigma^2) - sigma*sqrt(1+tau^2)
    tau = np.tan(phi)
    sigma = np.sinh(_E * np.arctanh(_E * s))
    taup = tau * np.sqrt(1 + sigma**2) - sigma * np.sqrt(1 + tau**2)
    xi = np.arctan2(taup, np.cos(lam))
    eta = np.arcsinh(np.sin(lam) / np.hypot(taup, np.cos(lam)))
    xs, ys = xi.copy(), eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xs = xs + _ALPHA[j] * np.sin(k * xi) * np.cosh(k * eta)
        ys = ys + _ALPHA[j] * np.cos(k * xi) * np.sinh(k * eta)
    return _RECT_A * ys, _RECT_A * xs            # (x=easting, y=northing)


def _tm_inv(x_m, y_m, lon0_deg: float):
    """Transverse Mercator inverse of _tm_fwd."""
    eta = np.asarray(x_m, dtype=np.float64) / _RECT_A
    xi = np.asarray(y_m, dtype=np.float64) / _RECT_A
    xip, etap = xi.copy(), eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xip = xip - _BETA[j] * np.sin(k * xi) * np.cosh(k * eta)
        etap = etap - _BETA[j] * np.cos(k * xi) * np.sinh(k * eta)
    lam = np.arctan2(np.sinh(etap), np.cos(xip))
    taup = np.sin(xip) / np.hypot(np.sinh(etap), np.cos(xip))
    # Newton-solve tau from tau' (Karney eq. 19-21); converges quadratically
    e2m = 1.0 - _E * _E
    tau = taup / np.sqrt(e2m)        # spherical first guess
    for _ in range(5):
        sig = np.sinh(_E * np.arctanh(_E * tau / np.sqrt(1 + tau**2)))
        f = tau * np.sqrt(1 + sig**2) - sig * np.sqrt(1 + tau**2) - taup
        df = (np.sqrt((1 + sig**2) * (1 + tau**2)) - sig * tau) \
            * e2m * np.sqrt(1 + tau**2) / (1 + e2m * tau**2)
        tau = tau - f / df
    return np.degrees(lam) + lon0_deg, np.degrees(np.arctan(tau))


def utm_zone_lon0(zone: int) -> float:
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone {zone} out of range 1..60")
    return -183.0 + 6.0 * zone


def parse_utm_crs(crs: str) -> tuple[int, bool]:
    """'utm:30N' / 'utm:33s' / 'epsg:32630' / 'epsg:32733' -> (zone, south)."""
    m = re.fullmatch(r"utm:(\d{1,2})([NnSs])", crs)
    if m:
        return int(m.group(1)), m.group(2).lower() == "s"
    m = re.fullmatch(r"epsg:32([67])(\d{2})", crs.lower())
    if m:
        return int(m.group(2)), m.group(1) == "7"
    raise ValueError(f"not a UTM CRS: {crs!r} (use utm:NNh or epsg:326NN/327NN)")


def utm_fwd(lon_deg, lat_deg, zone: int, south: bool = False):
    """(lon, lat) degrees -> UTM (easting, northing) meters."""
    x, y = _tm_fwd(lon_deg, lat_deg, utm_zone_lon0(zone))
    e = _FE + _K0 * x
    n = _K0 * y + (_FN_SOUTH if south else 0.0)
    return e, n


def utm_inv(easting, northing, zone: int, south: bool = False):
    """UTM (easting, northing) meters -> (lon, lat) degrees."""
    x = (np.asarray(easting, dtype=np.float64) - _FE) / _K0
    y = (np.asarray(northing, dtype=np.float64)
         - (_FN_SOUTH if south else 0.0)) / _K0
    return _tm_inv(x, y, utm_zone_lon0(zone))
