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


# Series coefficients for the inverse authalic expansion (Snyder 3-18):
# phi = beta + c2 sin(2 beta) + c4 sin(4 beta) + c6 sin(6 beta)
_C2 = _E2 / 3.0 + 31.0 * _E2**2 / 180.0 + 517.0 * _E2**3 / 5040.0
_C4 = 23.0 * _E2**2 / 360.0 + 251.0 * _E2**3 / 3780.0
_C6 = 761.0 * _E2**3 / 45360.0


def auth_lat_inv(beta: np.ndarray) -> np.ndarray:
    """Authalic -> geodetic latitude via the standard series (radians).

    Max error vs the exact Newton inverse is ~2e-11 rad (~0.1 mm on the
    ellipsoid; asserted in tests), at a third of the transcendental cost of the
    6-step Newton loop this replaced — this function sits on the per-pixel hot
    path of every inverse warp."""
    beta = np.asarray(beta, dtype=np.float64)
    return (beta + _C2 * np.sin(2.0 * beta) + _C4 * np.sin(4.0 * beta)
            + _C6 * np.sin(6.0 * beta))
