"""Per-partition lineage records + resumable pipeline runs.

north_rule requirement: "resumable from checkpoint with per-partition lineage +
metrics".  Layout of a resumable output directory:

    out_dir/
      part-00000/ ... parquet files of partition 0 ...
      _lineage/part-00000.json   {"part", "inputs", "rows", "digest", "wall_s"}
      _lineage/_done             written when every partition is verified

A partition is the unit of restart: it maps to a fixed slice of the input file
list, so a re-run recomputes exactly the partitions whose lineage records are
missing or fail verification (file exists + row count matches), never the whole
input.  Records are written atomically (tmp + rename).  Digests are order-
insensitive blake2b over the partition's rows, so a resumed run can be verified
equal to a single-shot run.
"""
from __future__ import annotations

import hashlib
import json
import os
import time


def _digest_table(tbl) -> str:
    """Order-insensitive digest: per-row blake2b of the CSV-ish row repr, xor-ed."""
    import numpy as np
    import pyarrow as pa  # noqa: F401

    acc = np.zeros(20, dtype=np.uint8)
    cols = [tbl.column(n).to_pylist() for n in sorted(tbl.column_names)]
    for row in zip(*cols):
        h = hashlib.blake2b(repr(row).encode(), digest_size=20).digest()
        acc ^= np.frombuffer(h, dtype=np.uint8)
    return acc.tobytes().hex()


class LineageLog:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def record_path(self, part: int) -> str:
        return os.path.join(self.dir, f"part-{part:05d}.json")

    def part_dir(self, part: int) -> str:
        return os.path.join(self.out_dir, f"part-{part:05d}")

    def load(self, part: int) -> dict | None:
        p = self.record_path(part)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def verify(self, part: int) -> bool:
        """A partition is done iff its record exists and the written parquet
        still holds the recorded row count."""
        rec = self.load(part)
        if rec is None:
            return False
        pdir = self.part_dir(part)
        if not os.path.isdir(pdir):
            return False
        try:
            import pyarrow.parquet as pq
            import pyarrow.dataset as pads
            n = sum(pq.read_metadata(os.path.join(pdir, f)).num_rows
                    for f in os.listdir(pdir) if f.endswith(".parquet"))
        except Exception:
            return False
        return n == rec["rows"]

    def commit(self, part: int, inputs: list[str], table, wall_s: float):
        rec = {"part": part, "inputs": inputs, "rows": table.num_rows,
               "digest": _digest_table(table), "wall_s": round(wall_s, 3),
               "ts": time.time()}
        tmp = self.record_path(part) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self.record_path(part))

    def mark_done(self, n_parts: int):
        with open(os.path.join(self.dir, "_done"), "w") as f:
            json.dump({"n_parts": n_parts}, f)

    def summary(self) -> dict:
        recs = [json.load(open(os.path.join(self.dir, f)))
                for f in sorted(os.listdir(self.dir))
                if f.startswith("part-") and f.endswith(".json")]
        return {"parts": len(recs), "rows": sum(r["rows"] for r in recs),
                "wall_s": sum(r["wall_s"] for r in recs)}


def run_resumable(input_files: list[str], out_dir: str, make_pipeline,
                  n_parts: int | None = None, fail_after: int | None = None):
    """Run `make_pipeline(files) -> Dataset` over input_files split into n_parts
    partitions, writing each partition + its lineage record; partitions whose
    lineage verifies are SKIPPED on re-runs.  fail_after injects a crash after
    that many fresh partitions (test hook for kill-and-resume).

    Returns (n_computed, n_skipped)."""
    import pyarrow.parquet as pq

    files = sorted(input_files)
    if n_parts is None:
        n_parts = len(files)
    log = LineageLog(out_dir)
    computed = skipped = 0
    for part in range(n_parts):
        # file-level sharding when the input has enough files (the common case —
        # at scale every shard is many files and the read prunes to them);
        # otherwise every partition reads all files and make_pipeline must
        # row-filter by (part, n_parts)
        part_files = files[part::n_parts] if len(files) >= n_parts else files
        if not part_files:
            continue
        if log.verify(part):
            skipped += 1
            continue
        t0 = time.time()
        ds = make_pipeline(part_files, part, n_parts)
        tbl = ds.to_arrow_refs()
        import ray
        import pyarrow as pa
        tables = [t for t in ray.get(tbl)]
        table = pa.concat_tables([t for t in tables if t.num_rows],
                                 promote_options="default") \
            if any(t.num_rows for t in tables) else tables[0]
        pdir = log.part_dir(part)
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(table, os.path.join(pdir, "data.parquet"))
        log.commit(part, part_files, table, time.time() - t0)
        computed += 1
        if fail_after is not None and computed >= fail_after:
            raise RuntimeError(f"injected failure after {computed} partitions")
    log.mark_done(n_parts)
    return computed, skipped


def read_resumable(out_dir: str):
    """Read a resumable output directory back as a Dataset (part dirs only)."""
    import glob

    import ray.data as rd
    files = sorted(glob.glob(os.path.join(out_dir, "part-*", "*.parquet")))
    return rd.read_parquet(files)
