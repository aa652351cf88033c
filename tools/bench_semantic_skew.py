"""Record the skewed-cluster wall time for ops.dedup.semantic_dedup.

Synthesizes a deliberately pathological input — ONE top-level cluster
holding 500k vectors (the shape VERDICT r4 named as the scale-killer:
uncapped, this is a 1.25e11-pair GEMM) — and runs the capped operator.
The cap + in-task k-means split turns the hot cluster into ~cap-sized
leaves, so pair work drops from O(k^2) to O(k * cap) and the stage
finishes in seconds.  Prints one JSON line for BENCH/SCALE records.

Usage:  python tools/bench_semantic_skew.py [n_vectors] [cap]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    d = 32
    rng = np.random.default_rng(17)
    # 64 directions, members spread along each ray with noise: realistic
    # near-dup structure, but ALL rows share cluster label 0 (max skew)
    centers = rng.normal(0, 1, (64, d))
    lab = rng.integers(0, 64, n)
    emb = (centers[lab] * rng.uniform(0.9, 1.1, (n, 1))
           + rng.normal(0, 0.02, (n, d))).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "label": pa.array(np.zeros(n, dtype=np.int32)),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    })

    import ray
    import ray.data as rd
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False)
    from dggsray.ops.dedup import semantic_dedup

    ds = rd.from_arrow(t).repartition(32)
    t0 = time.perf_counter()
    out = semantic_dedup(ds, tau_permille=980,
                         max_cluster_rows=cap)
    n_dup = out.sum("is_dup")
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": "semantic_dedup skewed one-cluster wall",
        "n_vectors": n, "dim": d, "max_cluster_rows": cap,
        "n_dup": int(n_dup), "value": round(wall, 3), "unit": "sec",
        "vectors_per_sec": round(n / wall, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
