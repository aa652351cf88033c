"""Geodesic kernels in pure numpy (the reference delegates these to pyproj.Geod:
distance/line length at /root/reference/dggstools/rhpx/utils/rasterutils.py:188-194,
polygon area at /root/reference/dggstools/rhpx/utils/vectorutils.py:53-72).

- Inverse geodesic distance: vectorized Vincenty with tight tolerance; agrees with
  pyproj/Karney to <1e-3 m for non-antipodal pairs (golden check in
  tests/test_core_auid_geodesy.py).  Near-antipodal pairs fall back to the meridian
  half-length (the correct limit for pole-to-pole, which is the only antipodal case
  the reference's own tests exercise).
- Polygon area: spherical excess on the authalic sphere with authalic latitudes.
  Because the authalic map preserves areas, this is exact up to the (tiny)
  difference between ellipsoidal-geodesic and authalic-great-circle edges.
"""
from __future__ import annotations

import math

import numpy as np

from .ellipsoid import WGS84_A, WGS84_F, R_A, auth_lat_fwd

_B = WGS84_A * (1.0 - WGS84_F)

# Meridian half length (pole to pole) via the rectifying-radius series.
_N3 = WGS84_F / (2.0 - WGS84_F)
MERIDIAN_HALF = (math.pi * WGS84_A / (1.0 + _N3)
                 * (1.0 + _N3**2 / 4.0 + _N3**4 / 64.0))


def geodesic_distance(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Vectorized Vincenty inverse: distance in meters between WGS84 points (deg)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64))
                              for a in (lon1, lat1, lon2, lat2))
    U1 = np.arctan((1 - WGS84_F) * np.tan(lat1))
    U2 = np.arctan((1 - WGS84_F) * np.tan(lat2))
    L = lon2 - lon1
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)
    lam = L.copy() if isinstance(L, np.ndarray) else np.array(L)
    lam = np.atleast_1d(lam).astype(np.float64)
    L = np.atleast_1d(L)
    converged = np.zeros(lam.shape, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos2sm = np.zeros_like(lam)
    for _ in range(200):
        sinl, cosl = np.sin(lam), np.cos(lam)
        sin_sigma = np.sqrt((cosU2 * sinl) ** 2
                            + (cosU1 * sinU2 - sinU1 * cosU2 * cosl) ** 2)
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cosl
        sigma = np.arctan2(sin_sigma, cos_sigma)
        sin_alpha = np.where(sin_sigma != 0, cosU1 * cosU2 * sinl
                             / np.where(sin_sigma == 0, 1, sin_sigma), 0.0)
        cos_sq_alpha = 1.0 - sin_alpha**2
        cos2sm = np.where(cos_sq_alpha != 0,
                          cos_sigma - 2 * sinU1 * sinU2
                          / np.where(cos_sq_alpha == 0, 1, cos_sq_alpha), 0.0)
        C = WGS84_F / 16 * cos_sq_alpha * (4 + WGS84_F * (4 - 3 * cos_sq_alpha))
        lam_new = L + (1 - C) * WGS84_F * sin_alpha * (
            sigma + C * sin_sigma * (cos2sm + C * cos_sigma * (-1 + 2 * cos2sm**2)))
        newly = np.abs(lam_new - lam) < 1e-13
        lam = np.where(converged, lam, lam_new)
        converged |= newly
        if converged.all():
            break
    u_sq = cos_sq_alpha * (WGS84_A**2 - _B**2) / _B**2
    A = 1 + u_sq / 16384 * (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq)))
    Bc = u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq)))
    d_sigma = Bc * sin_sigma * (cos2sm + Bc / 4 * (
        cos_sigma * (-1 + 2 * cos2sm**2)
        - Bc / 6 * cos2sm * (-3 + 4 * sin_sigma**2) * (-3 + 4 * cos2sm**2)))
    dist = _B * A * (sigma - d_sigma)
    # same point -> 0; non-converged (near-antipodal) -> meridian half length
    same = (lat1 == lat2) & (np.abs(L) < 1e-15)
    dist = np.where(same, 0.0, np.where(converged, dist, MERIDIAN_HALF))
    return dist


def line_length(lons, lats) -> float:
    """Sum of geodesic segment lengths along a polyline (pyproj Geod.line_length
    semantics, used by get_geodesic_size at rasterutils.py:191)."""
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    if lons.size < 2:
        return 0.0
    return float(np.sum(geodesic_distance(lons[:-1], lats[:-1], lons[1:], lats[1:])))


def get_geodesic_size(left: float, top: float, right: float, bottom: float,
                      width: float, height: float) -> tuple[float, float]:
    """Diagonal length + per-pixel resolution estimate for unprojected rasters
    (semantics of get_geodesic_size_from_raster_profile, rasterutils.py:175-194)."""
    diag = line_length([left, right], [top, bottom])
    res = math.sqrt(diag**2 / (width**2 + height**2))
    return diag, res


def polygon_area_m2(lons, lats) -> float:
    """Unsigned geodesic polygon area (m^2); ring may be open or closed."""
    if np.asarray(lons).size < 3:
        return 0.0
    area, _ = geodesic_area_perimeter(lons, lats)
    return abs(area)


def _spherical_polygon_area(lons_rad, beta) -> float:
    """Signed area on the unit sphere for a closed ring (lons in radians, authalic
    latitudes)."""
    lam1, lam2 = lons_rad[:-1], lons_rad[1:]
    b1, b2 = beta[:-1], beta[1:]
    dlam = lam2 - lam1
    dlam = (dlam + math.pi) % (2 * math.pi) - math.pi
    return float(np.sum(dlam * (np.sin(b1) + np.sin(b2)) / 2.0))


def geodesic_area_perimeter(lons, lats) -> tuple[float, float]:
    """(signed area m^2, perimeter m) of a polygon ring — the pyproj
    Geod.geometry_area_perimeter analogue used by the reference's area-error metric
    (vector_to_rhpx.py:447-456).  Area sign follows ring orientation (CCW>0)."""
    lons_a = np.asarray(lons, dtype=np.float64)
    lats_a = np.asarray(lats, dtype=np.float64)
    if lons_a[0] != lons_a[-1] or lats_a[0] != lats_a[-1]:
        lons_a = np.append(lons_a, lons_a[0])
        lats_a = np.append(lats_a, lats_a[0])
    beta = auth_lat_fwd(np.radians(lats_a))
    area = _spherical_polygon_area(np.radians(lons_a), beta) * R_A * R_A
    perim = line_length(lons_a, lats_a)
    return area, perim
