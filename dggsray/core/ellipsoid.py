"""WGS84 ellipsoid constants and authalic-latitude conversion (pure numpy, vectorized).

The rHEALPix projection on an ellipsoid is the spherical projection applied to the
authalic sphere: geodetic latitude phi is converted to authalic latitude beta, the
spherical (r)HEALPix map is applied on the unit sphere, and the result is scaled by
the authalic radius R_A.  (Gibb/Raichev/Speth 2013, "The rHEALPix discrete global
grid system"; same model as the reference's rhealpixdggs dependency, see
/root/reference/dggstools/rhpx/rhpxutils.py:18.)

All functions are vectorized over numpy arrays; angles in radians unless noted.
"""
from __future__ import annotations

import numpy as np

# True WGS84 defining parameters.  The golden cell widths of the reference test suite
# (169.4788172157132 m at res 10, 56.49293907190441 m at res 11 for N_side=3;
# /root/reference/tests/unit_tests/tests_dggstools.py:15-21) are reproduced to <1e-13 m
# with this flattening (verified in tests/test_core_rhpx.py).
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

_E2 = WGS84_F * (2.0 - WGS84_F)          # first eccentricity squared
_E = np.sqrt(_E2)


def _q(sinphi: np.ndarray) -> np.ndarray:
    """Authalic function q(phi) of Snyder (3-12), in terms of sin(phi)."""
    es = _E * sinphi
    return (1.0 - _E2) * (sinphi / (1.0 - _E2 * sinphi * sinphi) + np.arctanh(es) / _E)


_QP = float(_q(np.float64(1.0)))          # q at the pole
R_A = WGS84_A * float(np.sqrt(_QP / 2.0))  # authalic radius, ~6371007.181 m


def auth_lat_fwd(phi: np.ndarray) -> np.ndarray:
    """Geodetic latitude -> authalic latitude (radians, vectorized)."""
    ratio = np.clip(_q(np.sin(phi)) / _QP, -1.0, 1.0)
    return np.arcsin(ratio)


def auth_lat_inv(beta: np.ndarray) -> np.ndarray:
    """Authalic latitude -> geodetic latitude via Newton iteration (radians)."""
    beta = np.asarray(beta, dtype=np.float64)
    target = _QP * np.sin(beta)
    phi = np.array(beta, copy=True)
    for _ in range(6):
        s = np.sin(phi)
        f = _q(s) - target
        # dq/dphi = 2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2
        df = 2.0 * (1.0 - _E2) * np.cos(phi) / (1.0 - _E2 * s * s) ** 2
        step = np.where(df != 0.0, f / np.where(df == 0.0, 1.0, df), 0.0)
        phi = phi - step
    return phi
