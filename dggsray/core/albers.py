"""Ellipsoidal Albers Equal-Area Conic, pure numpy (Snyder 1987, eqs
14-1..14-21 / 3-16..3-18).  Lets projected-in-meters Albers rasters (the
reference's NAIP_30.img fixture, CONUS Albers on GRS 1980 — converted through
rasterio/PROJ at /root/reference/tests/data_tests/tests_data.py:150) enter the
same raster->rHEALPix warp every geographic/UTM input takes, with the
projection parameters read from the file itself (core.hfaio)."""
from __future__ import annotations

import numpy as np


class AlbersParams:
    """lat1/lat2 standard parallels, lon0/lat0 origin (radians), false
    easting/northing (meters), ellipsoid a (meters) and e2."""

    def __init__(self, lat1, lat2, lon0, lat0, fe=0.0, fn=0.0,
                 a=6378137.0, e2=0.00669438002290):
        self.lat1, self.lat2 = lat1, lat2
        self.lon0, self.lat0 = lon0, lat0
        self.fe, self.fn = fe, fn
        self.a, self.e2 = a, e2
        e = np.sqrt(e2)
        m1 = _m(lat1, e2)
        m2 = _m(lat2, e2)
        q1 = _q(lat1, e, e2)
        q2 = _q(lat2, e, e2)
        q0 = _q(lat0, e, e2)
        self.e = e
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = a * np.sqrt(self.C - self.n * q0) / self.n

    @classmethod
    def from_hfa(cls, proj: dict) -> "AlbersParams":
        """From the Eprj_ProParameters dict of core.hfaio (GCTP layout:
        params[2]=lat1, [3]=lat2, [4]=lon0, [5]=lat0, [6]=FE, [7]=FN, all
        angles in radians)."""
        p = proj["params"]
        a, _b, e2 = proj["spheroid"]
        return cls(lat1=p[2], lat2=p[3], lon0=p[4], lat0=p[5],
                   fe=p[6], fn=p[7], a=a, e2=e2)


def _m(lat, e2):
    s = np.sin(lat)
    return np.cos(lat) / np.sqrt(1.0 - e2 * s * s)


def _q(lat, e, e2):
    s = np.sin(lat)
    return (1.0 - e2) * (s / (1.0 - e2 * s * s)
                         - (1.0 / (2.0 * e))
                         * np.log((1.0 - e * s) / (1.0 + e * s)))


def albers_fwd(lon_deg, lat_deg, P: AlbersParams):
    """Geodetic degrees -> Albers (x, y) meters."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    q = _q(phi, P.e, P.e2)
    rho = P.a * np.sqrt(np.maximum(P.C - P.n * q, 0.0)) / P.n
    theta = P.n * (lam - P.lon0)
    x = P.fe + rho * np.sin(theta)
    y = P.fn + P.rho0 - rho * np.cos(theta)
    return x, y


def albers_inv(x, y, P: AlbersParams):
    """Albers (x, y) meters -> geodetic degrees (iterative latitude,
    converges quadratically; 6 rounds ≈ double precision)."""
    x = np.asarray(x, dtype=np.float64) - P.fe
    y = np.asarray(y, dtype=np.float64) - P.fn
    ry = P.rho0 - y
    rho = np.hypot(x, ry)
    if P.n >= 0:
        theta = np.arctan2(x, ry)
    else:
        theta = np.arctan2(-x, -ry)
    q = (P.C - (rho * P.n / P.a) ** 2) / P.n
    # Snyder 3-16: iterate phi from the spherical seed asin(q/2)
    phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
    e, e2 = P.e, P.e2
    for _ in range(6):
        s = np.sin(phi)
        one = 1.0 - e2 * s * s
        phi = phi + (one * one / (2.0 * np.cos(phi))) * (
            q / (1.0 - e2) - s / one
            + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s)))
    lam = P.lon0 + theta / P.n
    return np.degrees(lam), np.degrees(phi)
