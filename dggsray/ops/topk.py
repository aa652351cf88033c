"""Distributed top-k without a global sort.

A `ds.sort(...).limit(k)` range-shuffles EVERY row to produce k of them — at
100 TB that is an all-to-all exchange for a handful of output rows.  The scale
pattern (same as ops.similarity.brute_topk): take the top-k inside every batch
with a vectorized Arrow partial sort, so the final sort only ever sees
(num_blocks x k) rows — a tiny exchange independent of the input size.

Reference parity: the reference's sort/limit semantics (SURVEY.md section 2.7).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def partial_topk(ds, keys: list[str], descending: list[bool], k: int):
    """Top-k rows of `ds` by `keys` (per-column descending flags), ties broken
    by the later keys.  Returns a Dataset of exactly min(k, n) rows, globally
    sorted on the same keys."""
    sort_keys = [(c, "descending" if d else "ascending")
                 for c, d in zip(keys, descending)]

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        idx = pc.sort_indices(b, sort_keys=sort_keys)
        return b.take(idx[:k])

    reduced = ds.map_batches(partial, batch_format="pyarrow")
    # final exchange over <= num_blocks*k rows — negligible at any input size
    return reduced.sort(keys, descending=descending).limit(k)
