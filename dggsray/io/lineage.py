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

import json
import os
import time


_FNV = 1099511628211
_GOLD = 0x9E3779B97F4A7C15


def row_hashes(tbl) -> "object":
    """Per-row 64-bit polynomial hashes (wrapping uint64 numpy array) of each
    row's sorted-column joined string form — the _digest_table kernel without
    the xor-reduce, reusable for grouped equivalence fingerprints."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return np.zeros(0, np.uint64)
    cols = []
    for n in sorted(tbl.column_names):
        c = tbl.column(n)
        try:
            cols.append(pc.cast(c, pa.string()))
        except pa.ArrowInvalid:            # exotic types: slow fallback
            cols.append(pa.array([repr(v) for v in c.to_pylist()], pa.string()))
    joined = pc.binary_join_element_wise(*cols, "\x1f")
    arr = joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) \
        else joined
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], np.int32)[arr.offset:arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], np.uint8)[off[0]:off[-1]] if bufs[2] is not None \
        else np.zeros(0, np.uint8)
    off = (off - off[0]).astype(np.int64)
    lens = off[1:] - off[:-1]
    with np.errstate(over="ignore"):
        maxlen = int(lens.max()) if lens.size else 0
        pw = np.ones(maxlen + 1, dtype=np.uint64)
        if maxlen:
            pw[1:] = np.multiply.accumulate(
                np.full(maxlen, _FNV, dtype=np.uint64))
        pos = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], lens)
        terms = (data.astype(np.uint64) + np.uint64(1)) * pw[pos]
        cs = np.zeros(terms.size + 1, dtype=np.uint64)
        np.cumsum(terms, out=cs[1:])
        h = cs[off[1:]] - cs[off[:-1]]
        h ^= lens.astype(np.uint64) * np.uint64(_GOLD)
    return h


def _digest_table(tbl) -> str:
    """Order-insensitive digest, fully vectorized: every row's joined string
    form gets a 64-bit polynomial hash (position-weighted byte sum, wrapping
    uint64), xor-reduced.  Xor makes the digest independent of row order AND of
    batch/block boundaries, so a resumed run's digest equals a single-shot
    run's.  Not cryptographic — it guards lineage records against accidental
    corruption/drift, same as the reference row-repr scheme it replaces."""
    import numpy as np

    h = row_hashes(tbl)
    if h.size == 0:
        return "0" * 16
    return f"{int(np.bitwise_xor.reduce(h)):016x}"


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

    def verify(self, part: int, inputs: list[str] | None = None,
               n_parts: int | None = None) -> bool:
        """A partition is done iff its record exists, it was computed over
        the SAME input slice (a changed n_parts or file list re-buckets
        inputs — the old output would duplicate/omit files), and the written
        parquet still holds the recorded row count."""
        rec = self.load(part)
        if rec is None:
            return False
        if inputs is not None and rec.get("inputs") != list(inputs):
            return False
        if n_parts is not None and rec.get("n_parts") != n_parts:
            return False      # row-bucket mode shards by (part, n_parts)
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

    def commit(self, part: int, inputs: list[str], rows: int, digest: str,
               wall_s: float, n_parts: int | None = None,
               out_bytes: int | None = None):
        rec = {"part": part, "inputs": inputs, "n_parts": n_parts,
               "rows": rows, "digest": digest, "wall_s": round(wall_s, 3),
               "out_bytes": out_bytes,
               "rows_per_s": round(rows / wall_s, 1) if wall_s > 0 else None,
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
        out = {"parts": len(recs), "rows": sum(r["rows"] for r in recs),
               "wall_s": round(sum(r["wall_s"] for r in recs), 3),
               "out_bytes": sum(r.get("out_bytes") or 0 for r in recs)}
        if out["wall_s"] > 0:
            out["rows_per_s"] = round(out["rows"] / out["wall_s"], 1)
        return out


def run_resumable(input_files: list[str], out_dir: str, make_pipeline,
                  n_parts: int | None = None, fail_after: int | None = None):
    """Run `make_pipeline(files) -> Dataset` over input_files split into n_parts
    partitions, writing each partition + its lineage record; partitions whose
    lineage verifies are SKIPPED on re-runs.  fail_after injects a crash after
    that many fresh partitions (test hook for kill-and-resume).

    Returns (n_computed, n_skipped).

    Scale notes: each partition is written with a DISTRIBUTED
    `Dataset.write_parquet` (no driver materialization of the partition), and
    the lineage digest is computed by re-reading the WRITTEN parquet through a
    map_batches digest kernel — the driver only ever sees one tiny
    (rows, digest) row per block, and the digest attests to the durable bytes,
    not the in-flight ones."""
    import shutil

    import pyarrow as pa

    files = sorted(input_files)
    if n_parts is None:
        n_parts = len(files)
    log = LineageLog(out_dir)
    # prune partitions beyond the CURRENT sharding (a previous run with more
    # parts leaves part dirs that read_resumable would read as duplicates)
    part = n_parts
    while os.path.isdir(log.part_dir(part)) \
            or os.path.exists(log.record_path(part)):
        if os.path.isdir(log.part_dir(part)):
            shutil.rmtree(log.part_dir(part))
        if os.path.exists(log.record_path(part)):
            os.remove(log.record_path(part))
        part += 1
    computed = skipped = 0
    for part in range(n_parts):
        # file-level sharding when the input has enough files (the common case —
        # at scale every shard is many files and the read prunes to them);
        # otherwise every partition reads all files and make_pipeline must
        # row-filter by (part, n_parts)
        part_files = files[part::n_parts] if len(files) >= n_parts else files
        if not part_files:
            continue
        if log.verify(part, inputs=part_files, n_parts=n_parts):
            skipped += 1
            continue
        t0 = time.time()
        ds = make_pipeline(part_files, part, n_parts)
        pdir = log.part_dir(part)
        if os.path.isdir(pdir):          # partial output from a crashed attempt
            shutil.rmtree(pdir)
        ds.write_parquet(pdir)

        import glob

        import ray.data as rd

        def digest_kernel(b: pa.Table) -> pa.Table:
            return pa.table({"_rows": pa.array([b.num_rows], pa.int64()),
                             "_dig": pa.array([_digest_table(b)], pa.string())})

        part_out = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
        stats = rd.read_parquet(part_out) \
            .map_batches(digest_kernel, batch_format="pyarrow").take_all() \
            if part_out else []
        rows = sum(r["_rows"] for r in stats)
        acc = 0
        for r in stats:
            acc ^= int(r["_dig"], 16)
        out_bytes = sum(os.path.getsize(f) for f in part_out)
        log.commit(part, part_files, rows, f"{acc:016x}", time.time() - t0,
                   n_parts=n_parts, out_bytes=out_bytes)
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
