"""Cell-keyed joins and lookups (the reference has no relational join operator; its
join-like computations are positional lookups — SURVEY.md section 2.5.  Here they
become first-class, cellid-keyed joins):

- broadcast_semi_join / broadcast_lookup_join: small side collected once, shipped
  via ray.put, probed inside map_batches (no shuffle of the big side).
- hash_join: both sides large -> native Ray Data hash join.
- knn_cells: k nearest cell rows to a query cell via packed-cellid prefix ranges
  (the index-prefix range scan of BASELINE.json north_star).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.cells import truncate_to_resolution
from ..core.rhpx import DEFAULT_GRID, GridConfig, cell_centroid


def broadcast_semi_join(ds, keys, key_col: str = "cellid", res: int | None = None,
                        anti: bool = False):
    """Keep rows whose (optionally prefix-truncated) key is in `keys`.
    `keys` is an iterable of strings, ray.put once; each task reads the ref."""
    import ray

    key_ref = ray.put(pa.array(sorted(set(keys)), pa.string()))

    def probe(batch: pa.Table) -> pa.Table:
        kset = ray.get(key_ref)
        col = batch.column(key_col)
        if res is not None:
            vals = truncate_to_resolution(col.to_numpy(zero_copy_only=False), res)
            col = pa.array(vals, pa.string())
        mask = pc.is_in(col, value_set=kset)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(probe, batch_format="pyarrow")


def broadcast_lookup_join(ds, lookup: pa.Table, key_col: str = "cellid",
                          res: int | None = None, how: str = "inner"):
    """Inner/left join of a streaming dataset with a small broadcast table keyed by
    key_col (the lookup's key column must be unique)."""
    import ray

    lk_ref = ray.put(lookup)

    def probe(batch: pa.Table) -> pa.Table:
        lk = ray.get(lk_ref)
        b = batch
        join_key = key_col
        if res is not None:
            vals = truncate_to_resolution(
                b.column(key_col).to_numpy(zero_copy_only=False), res)
            b = b.append_column("_jk", pa.array(vals, pa.string()))
            join_key = "_jk"
        out = b.join(lk, keys=join_key, right_keys=lookup.column_names[0],
                     join_type="inner" if how == "inner" else "left outer")
        if join_key == "_jk":
            out = out.drop_columns(["_jk"])
        return out

    return ds.map_batches(probe, batch_format="pyarrow")


def hash_join(left, right, on: str = "cellid", join_type: str = "inner",
              num_partitions: int = 16):
    """Large-large hash join on a key column (native Ray Data shuffle join)."""
    return left.join(right, join_type=join_type, on=(on,),
                     num_partitions=num_partitions)


def knn_cells(ds, query_cellid: str, k: int, key_col: str = "cellid",
              grid: GridConfig = DEFAULT_GRID):
    """k rows nearest to query cell: widen the cellid prefix until >=k candidate
    rows match (prefix range scan — cheap filter pushed into map_batches), then
    exact planar distance + global top-k.  Assumes uniform-resolution cell rows."""
    qx, qy = cell_centroid([query_cellid], grid)
    qx, qy = float(qx[0]), float(qy[0])

    for plen in range(len(query_cellid), 0, -1):
        prefix = query_cellid[:plen]

        def scan(batch: pa.Table, prefix=prefix) -> pa.Table:
            mask = pc.starts_with(batch.column(key_col), pattern=prefix)
            return batch.filter(mask)

        cand = ds.map_batches(scan, batch_format="pyarrow")
        n = cand.count()
        if n >= k or plen == 1:
            def dist(batch: pa.Table) -> pa.Table:
                cells = batch.column(key_col).to_numpy(zero_copy_only=False)
                cx, cy = cell_centroid(cells, grid)
                d = np.hypot(cx - qx, cy - qy)
                return batch.append_column("dist_m", pa.array(d))
            return cand.map_batches(dist, batch_format="pyarrow") \
                       .sort("dist_m").limit(k)
    raise RuntimeError("unreachable")
