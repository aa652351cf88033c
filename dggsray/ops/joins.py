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


def join_partitions() -> int:
    """Hash-join partition count sized to the cluster: ~1 partition per CPU
    (floor 8).  A fixed 8 would serialize the probe side on a 256-node
    cluster; per-CPU keeps partitions ~constant-sized as the cluster grows."""
    import ray
    return max(8, int(ray.cluster_resources().get("CPU", 8)))


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
              grid: GridConfig = DEFAULT_GRID,
              tiebreak_cols: list[str] | None = None):
    """k rows nearest to query cell via index-prefix pruning, in TWO dataset
    passes total (not one per prefix length):

      1. one scan computes every row's longest-common-prefix length with the
         query cell and aggregates the (tiny, <= res+1 row) LCP histogram;
      2. the deepest prefix length with >= k cumulative rows selects the
         candidate region; one filtered scan computes exact planar distances
         and a partial top-k (ops.topk — no global sort).

    Distances use sqrt(dx^2+dy^2) (not np.hypot) so a SQL oracle computing the
    same expression agrees to the last ulp.  Ties are broken on tiebreak_cols
    (default: the cell column) for deterministic output."""
    qx, qy = cell_centroid([query_cellid], grid)
    qx, qy = float(qx[0]), float(qy[0])
    qlen = len(query_cellid)

    def lcp_hist(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        m = np.zeros(batch.num_rows, dtype=np.int32)
        for p in range(1, qlen + 1):
            hit = pc.equal(pc.utf8_slice_codeunits(col, 0, p),
                           query_cellid[:p]).to_numpy(zero_copy_only=False)
            m = np.where(hit, p, m)
            if not hit.any():
                break
        lv, cnt = np.unique(m, return_counts=True)
        return pa.table({"lcp": pa.array(lv.astype(np.int64), pa.int64()),
                         "_c": pa.array(cnt.astype(np.int64))})

    from ray.data.aggregate import Sum
    hist = ds.map_batches(lcp_hist, batch_format="pyarrow") \
        .groupby("lcp").aggregate(Sum("_c", alias_name="n")).to_pandas()
    counts = dict(zip(hist["lcp"], hist["n"]))
    plen = 1
    cum = 0
    for p in range(qlen, 0, -1):
        cum += int(counts.get(p, 0))
        if cum >= k:
            plen = p
            break
    prefix = query_cellid[:plen]

    def dist(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.starts_with(batch.column(key_col),
                                            pattern=prefix))
        cells = batch.column(key_col).to_numpy(zero_copy_only=False)
        cx, cy = cell_centroid(cells, grid)
        d = np.sqrt((cx - qx) ** 2 + (cy - qy) ** 2)
        return batch.append_column("dist_m", pa.array(d))

    from .topk import partial_topk
    ties = tiebreak_cols if tiebreak_cols is not None else [key_col]
    cand = ds.map_batches(dist, batch_format="pyarrow")
    return partial_topk(cand, ["dist_m"] + ties,
                        [False] * (1 + len(ties)), k)
