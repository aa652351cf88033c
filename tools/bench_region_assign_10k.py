"""Record RegionAssigner wall time at 10k polygons (VERDICT r4 item #7:
the north-star shape is thousands of polygons, the r4 loop was O(F x
points)).  Synthesizes a 100x100 grid of quads (deterministic jitter),
builds the assigner once (the actor-__init__ cost), then assigns 1M
points in 64k batches (the map_batches steady state).  Prints one JSON
line with build wall, probe wall, points/sec, and a brute-force
equality check on a 2k-point sample.

Usage:  python tools/bench_region_assign_10k.py [n_side] [n_points]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def make_features(n_side: int):
    rng = np.random.default_rng(9)
    lon0, lon1, lat0, lat1 = -40.0, 40.0, -30.0, 30.0
    xs = np.linspace(lon0, lon1, n_side + 1)
    ys = np.linspace(lat0, lat1, n_side + 1)
    feats = []
    fid = 0
    for i in range(n_side):
        for j in range(n_side):
            jx = rng.uniform(-0.1, 0.1, 4) * (xs[1] - xs[0])
            jy = rng.uniform(-0.1, 0.1, 4) * (ys[1] - ys[0])
            ring = [[xs[i] + jx[0], ys[j] + jy[0]],
                    [xs[i + 1] + jx[1], ys[j] + jy[1]],
                    [xs[i + 1] + jx[2], ys[j + 1] + jy[2]],
                    [xs[i] + jx[3], ys[j + 1] + jy[3]]]
            feats.append({"feature_id": fid, "rings": [ring]})
            fid += 1
    return feats


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    res = 5

    from dggsray.core.rhpx import DEFAULT_GRID, project_fwd
    from dggsray.ops.vector2dggs import RegionAssigner, _points_in_ring

    feats = make_features(n_side)
    t0 = time.perf_counter()
    ra = RegionAssigner(feats, res=res)
    build = time.perf_counter() - t0

    rng = np.random.default_rng(4)
    lon = rng.uniform(-45.0, 45.0, n_points)
    lat = rng.uniform(-34.0, 34.0, n_points)
    t0 = time.perf_counter()
    got = np.concatenate([
        ra.assign_lonlat(lon[s:s + 65536], lat[s:s + 65536])
        for s in range(0, n_points, 65536)])
    probe = time.perf_counter() - t0

    # brute-force equality on a sample (paint order: later wins)
    samp = rng.choice(n_points, 2000, replace=False)
    px, py = project_fwd(lon[samp], lat[samp], DEFAULT_GRID)
    exp = np.full(samp.size, -1, np.int64)
    for f in feats:
        inside = np.zeros(samp.size, bool)
        for ring in f["rings"]:
            r = np.asarray(ring, float)
            r = np.vstack([r, r[:1]])          # close the ring
            xs, ys = project_fwd(r[:, 0], r[:, 1], DEFAULT_GRID)
            inside ^= _points_in_ring(px, py, np.column_stack([xs, ys]))
        exp[inside] = f["feature_id"]
    ok = bool(np.array_equal(got[samp], exp))

    print(json.dumps({
        "metric": "RegionAssigner 10k-polygon assign",
        "n_features": len(feats), "n_points": n_points, "res": res,
        "build_s": round(build, 3), "probe_s": round(probe, 3),
        "points_per_sec": round(n_points / probe, 1),
        "assigned_frac": round(float((got >= 0).mean()), 4),
        "sample_exact_vs_brute": ok,
    }))
    assert ok


if __name__ == "__main__":
    main()
