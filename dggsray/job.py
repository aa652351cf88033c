"""Cluster job entrypoint — north_rule: "run via ray job submit on a
fixed-size multi-node Ray cluster".

On a real cluster the SAME code runs at any size; submit it with:

    ray job submit --working-dir . -- \
        python -m dggsray.job --pipeline flagship_cell_join \
        --sf-dir /mnt/data/sf100 --out /mnt/out/flagship

`ray job submit` starts the driver inside the cluster with RAY_ADDRESS set,
so the entrypoint just attaches (`ray.init(address="auto")`) and the Ray Data
streaming executor spreads the pipeline over every node.  Single-node
smoke-testing runs the identical path (`address="auto"` starts a local
cluster when none is reachable):

    python -m dggsray.job --pipeline cell_agg_customer \
        --sf-dir /root/testdata/sf0.001 --out /tmp/job_out

Two modes:

- `--pipeline NAME`: any `queries()` entry from `__ray_entry__` / the
  pipelines package, streamed to partitioned parquet under --out with
  `Dataset.write_parquet` (never materialized on the driver).
- `--resumable`: the flagship raster×vector cell join with per-partition
  lineage + metrics (io.lineage) — a resubmitted job (same --out) skips every
  partition whose lineage record verifies, which is how a 100 TB run survives
  preemption: `ray job submit` the same command again.

Prints ONE JSON line with rows / wall seconds / per-partition metrics.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def _attach():
    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="dggsray.job")
    ap.add_argument("--pipeline", default="flagship_cell_join",
                    help="queries() entry to run (see __ray_entry__.queries)")
    ap.add_argument("--sf-dir", required=True,
                    help="input table directory (TESTDATA layout)")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--resumable", action="store_true",
                    help="flagship with per-partition lineage; resubmit with "
                         "the same --out to resume after preemption")
    ap.add_argument("--n-parts", type=int, default=None,
                    help="partition count for --resumable (default: one per "
                         "input file)")
    args = ap.parse_args(argv)

    _attach()
    t0 = time.time()
    if args.resumable:
        from .io.lineage import LineageLog, read_resumable
        from .pipelines.flagship import flagship_resumable
        sf = float(args.sf_dir.rstrip("/").rsplit("sf", 1)[-1])
        computed, skipped = flagship_resumable(sf, args.out,
                                               n_parts=args.n_parts)
        summary = LineageLog(args.out).summary()
        rows = read_resumable(args.out).count()
        print(json.dumps({"mode": "resumable-flagship", "rows": rows,
                          "computed_parts": computed,
                          "skipped_parts": skipped,
                          "lineage": summary,
                          "wall_s": round(time.time() - t0, 3),
                          "out": args.out}))
        return 0

    import pandas as pd
    import pyarrow as pa

    from . import __name__ as _pkg  # noqa: F401  (package import sanity)
    import __ray_entry__ as entrymod

    fn = entrymod.queries().get(args.pipeline)
    if fn is None:
        raise SystemExit(f"unknown pipeline {args.pipeline!r}; one of: "
                         + ", ".join(sorted(entrymod.queries())))
    res = fn(args.sf_dir)
    os.makedirs(args.out, exist_ok=True)
    if hasattr(res, "write_parquet"):          # ray.data.Dataset: stream out
        res.write_parquet(args.out)
        import ray.data as rd
        rows = rd.read_parquet(args.out).count()
    else:                                      # small pandas/arrow result
        import pyarrow.parquet as pq
        tbl = (pa.Table.from_pandas(res) if isinstance(res, pd.DataFrame)
               else res)
        pq.write_table(tbl, os.path.join(args.out, "part-0.parquet"))
        rows = tbl.num_rows
    print(json.dumps({"mode": "pipeline", "pipeline": args.pipeline,
                      "rows": rows, "wall_s": round(time.time() - t0, 3),
                      "out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
