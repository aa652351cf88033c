#!/usr/bin/env python3
"""Benchmark runner.  Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": .., "num_cpus": N,
   "images_per_sec": ...}

Headline = flagship raster+vector->DGGS cell-join over the synthetic image table at
the sf of $GRAFT_SF_DIR (default /root/testdata/sf0.1), plus the oracle query suite
over the testdata parquet tables.

--scaling: run the flagship at two parallelism levels (8 and 32 CPUs) in fresh
processes on the same input and report both throughputs + scaling efficiency (the
sandbox stand-in for the N vs 4N node criterion; results recorded in BENCH/ and
BASELINE.md).
"""
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def sf_of(sf_dir: str) -> float:
    return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])


def run_suite(num_cpus: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sf = sf_of(SF_DIR)
    from dggsray.io.imagetable import ensure_image_table, n_images_for_sf
    ensure_image_table(sf)              # cache outside the timed section
    n_images = n_images_for_sf(sf)

    from dggsray.pipelines.flagship import flagship_pipeline
    t0 = time.time()
    n = flagship_pipeline(sf=sf, concurrency=(2, max(2, num_cpus - 2)),
                          batch_size=128).count()
    flagship_s = time.time() - t0
    assert n >= n_images * 0.99, f"flagship produced {n} rows for {n_images} images"

    import __ray_entry__ as E
    queries = {"flagship_cell_join": round(flagship_s, 3)}
    for name, fn in E.queries().items():
        if name == "flagship_cell_join":
            continue
        t0 = time.time()
        res = fn(SF_DIR)
        try:
            import ray.data as rd
            if isinstance(res, rd.Dataset):
                res.count()
        except Exception:
            pass
        queries[name] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "end-to-end raster+vector->DGGS cell-join (flagship) wall time",
        "value": round(flagship_s, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "n_images": n_images,
        "images_per_sec": round(n_images / flagship_s, 1),
    }


def run_scaling():
    """Same flagship job at 8 and 32 CPUs in fresh processes."""
    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--one-flagship"],
            env={**os.environ, "RAY_GRAFT_CPUS": str(cpus)},
            capture_output=True, text=True, timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8, t32 = results[8]["value"], results[32]["value"]
    eff = (t8 / t32) / (32 / 8)
    print(json.dumps({
        "metric": "flagship N->4N scaling (8 vs 32 cpus, fresh processes)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_of(SF_DIR),
        "throughput_8cpus_img_s": results[8]["images_per_sec"],
        "throughput_32cpus_img_s": results[32]["images_per_sec"],
        "sec_8cpus": t8, "sec_32cpus": t32,
    }))


def run_one_flagship():
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sf = sf_of(SF_DIR)
    from dggsray.io.imagetable import ensure_image_table, n_images_for_sf
    ensure_image_table(sf)
    n_images = n_images_for_sf(sf)
    from dggsray.pipelines.flagship import flagship_pipeline
    t0 = time.time()
    flagship_pipeline(sf=sf, concurrency=(2, max(2, NUM_CPUS - 2)),
                      batch_size=128).count()
    dt = time.time() - t0
    ray.shutdown()
    print(json.dumps({"value": round(dt, 3), "unit": "sec", "num_cpus": NUM_CPUS,
                      "images_per_sec": round(n_images / dt, 1)}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--one-flagship" in sys.argv:
        run_one_flagship()
    else:
        print(json.dumps(run_suite(NUM_CPUS)))
