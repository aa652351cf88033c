"""Global position assignment — zip_with_index over a (sorted) Dataset.

Ray Data has no zip_with_index; this is the documented drop-to-raw-Ray
case (a per-block GLOBAL offset depends on the ordered sizes of every
other block, which no per-batch map can see).  The implementation touches
only block METADATA on the driver — per-block row counts ride the ref
bundles, so offsets cost nothing — and one tiny Ray task per block appends
the position column; `ray.data.from_arrow_refs` re-wraps the result
without moving any data.

`deterministic_shuffle` builds on it: sort by the Knuth multiplicative
hash of an int64 id (SQL-reproducible: (id * 2654435761) % 2^32 — the
same keep-rule family as ops/sampling) and assign global positions — the
reproducible pre-epoch corpus shuffle of a training pipeline.  Same seed
-> same order on every run, resume, and machine.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["zip_with_index", "deterministic_shuffle"]

_KNUTH = np.uint64(2654435761)


def zip_with_index(ds, col_name: str = "position"):
    """Append a global 0-based position column following the Dataset's
    current (sorted) block order.  Metadata-only on the driver; one remote
    task per block."""
    import ray
    import ray.data as rd

    m = ds.materialize()
    counts = []
    block_refs = []
    try:
        # fast path: per-block row counts ride the ref-bundle METADATA, so
        # offsets are free.  iter_internal_ref_bundles is a Ray developer
        # API (present across 2.x but not stability-guaranteed), hence the
        # guarded fallback below.
        for b in m.iter_internal_ref_bundles():
            for ref, meta in b.blocks:
                counts.append(meta.num_rows)
                block_refs.append(ref)
    except AttributeError:
        # fallback on PUBLIC APIs only (to_arrow_refs shares the same
        # private plumbing, so it can't be the guard): split the
        # materialized dataset into order-preserving pieces, offsets from
        # metadata-fast count(), per-piece local positions + offset, union
        # back.  Rows never reach the driver.
        parts = m.split(max(m.num_blocks(), 1), equal=False)
        # one block per piece makes the per-piece kernel stateless (a
        # map_batches closure is re-created per task, so cross-block
        # counters can't work); with n = num_blocks pieces this is a no-op
        parts = [p if p.num_blocks() <= 1 else p.repartition(1)
                 for p in parts]
        sizes = [p.count() for p in parts]
        offs = np.concatenate([[0], np.cumsum(sizes)])[:-1]

        def shifted(start):
            def add(tbl: pa.Table) -> pa.Table:
                return tbl.append_column(col_name, pa.array(
                    np.arange(start, start + tbl.num_rows,
                              dtype=np.int64)))
            return add

        out = [p.map_batches(shifted(int(o)), batch_format="pyarrow",
                             batch_size=None)
               for p, o in zip(parts, offs)]
        res = out[0]
        for p in out[1:]:
            res = res.union(p)
        return res
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]

    @ray.remote
    def add_pos(tbl: pa.Table, start: int) -> pa.Table:
        return tbl.append_column(
            col_name, pa.array(np.arange(start, start + tbl.num_rows,
                                         dtype=np.int64)))

    out_refs = [add_pos.remote(r, int(o))
                for r, o in zip(block_refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def deterministic_shuffle(ds, id_col: str, col_name: str = "position"):
    """Assign every row a reproducible global shuffle position: sort by the
    Knuth multiplicative hash of `id_col` (id tie-break), then
    zip_with_index.  The ONE global sort is the inherent cost of
    materializing a total order; everything else is metadata."""
    def key(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy().astype(np.uint64)
        k = (ids * _KNUTH) % np.uint64(1 << 32)
        return b.append_column("_shuffle_key",
                               pa.array(k.astype(np.int64)))

    keyed = ds.map_batches(key, batch_format="pyarrow") \
        .sort(["_shuffle_key", id_col])
    return zip_with_index(keyed, col_name).drop_columns(["_shuffle_key"])
