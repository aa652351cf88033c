"""Distributed CUID-set operations: compaction (the AUID "optimize" pre-pass) and
area set algebra.

The reference optimizes CUID sets in a driver-side networkx trie, which is
O(cells) memory and minutes-slow at res 9 (auids/rhpx.py:108-181, timings
:116-118).  Here the collapse runs as a bottom-up loop of grouped aggregates —
one groupby(parent_prefix) per resolution level — so the set shrinks
distributedly and only the (small) residue ever reaches the driver trie
(SURVEY.md section 2.8).  Semantics are identical to core.auid.optimize_cuids:
n_side^2 sibling LEAF cells with a non-terminal parent collapse, iterated to
fixpoint (equivalence-tested against the driver implementation).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.auid import optimize_cuids
from ..core.cells import explode_to_children, truncate_to_resolution
from ..core.rhpx import DEFAULT_GRID, GridConfig


def _distinct_cells(ds, cell_col: str):
    from ray.data.aggregate import Count
    return ds.groupby(cell_col).aggregate(Count(alias_name="_c")) \
        .drop_columns(["_c"])


def distributed_optimize(ds, n_side: int, cell_col: str = "cellid",
                         max_levels: int | None = None) -> list[str]:
    """Compact a (possibly huge, possibly duplicated) cell-id Dataset to the
    area-equivalent minimal CUID list.

    Level loop (deepest -> 1), all Dataset ops:
      leaves_L   = distinct cells of length L with no deeper descendant and no
                   present ancestor (terminal-parent guard)
      complete   = groupby(parent) count == n_side^2 over leaves_L
      collapse   = drop those children, add their parents
    The final (small) set gets one exact driver-side optimize pass, which also
    resolves duplicate-area corner cases across distant levels."""
    import ray.data as rd

    k = n_side * n_side
    distinct = _distinct_cells(ds, cell_col)
    pdf = distinct.to_pandas()  # after the FIRST distinct the set may still be
    # large; keep it as a Dataset and loop, only materializing level summaries
    cells_ds = rd.from_arrow(pa.table({cell_col: pa.array(pdf[cell_col],
                                                          pa.string())}))
    del pdf

    lens = cells_ds.map_batches(
        lambda b: pa.table({"len": pc.utf8_length(b.column(cell_col))}),
        batch_format="pyarrow")
    max_len = int(lens.max("len"))
    levels = range(max_len, 1, -1) if max_levels is None else \
        range(max_len, max(1, max_len - max_levels), -1)

    for L in levels:
        # parents that are themselves present (terminal guard) and prefixes of
        # deeper cells (non-leaf guard), collected as (small) driver sets
        def lengths_split(b: pa.Table, L=L):
            ln = pc.utf8_length(b.column(cell_col))
            return b.append_column("_len", ln)

        tagged = cells_ds.map_batches(lengths_split, batch_format="pyarrow")
        at_level = tagged.filter(expr=f"_len == {L}")
        deeper = tagged.filter(expr=f"_len > {L}")
        shallower_set = set()
        for batch in tagged.filter(expr=f"_len < {L}") \
                .iter_batches(batch_format="pyarrow"):
            shallower_set.update(batch.column(cell_col).to_pylist())
        deeper_prefixes = set()
        for batch in deeper.iter_batches(batch_format="pyarrow"):
            arr = batch.column(cell_col).to_numpy(zero_copy_only=False)
            deeper_prefixes.update(np.unique(
                truncate_to_resolution(arr, L - 1)))
        # complete sibling groups among leaves at level L
        def parentify(b: pa.Table, L=L):
            arr = b.column(cell_col).to_numpy(zero_copy_only=False)
            parents = truncate_to_resolution(arr, L - 2)
            return pa.table({cell_col: b.column(cell_col),
                             "_parent": pa.array(parents, pa.string())})

        from ray.data.aggregate import Count
        leaves = at_level.map_batches(
            lambda b: b.filter(pc.invert(pc.is_in(
                b.column(cell_col),
                value_set=pa.array(sorted(deeper_prefixes), pa.string())))),
            batch_format="pyarrow") if deeper_prefixes else at_level
        withp = leaves.map_batches(parentify, batch_format="pyarrow")
        counts = withp.groupby("_parent").aggregate(Count(alias_name="_n")) \
            .to_pandas()
        if counts.empty:
            continue
        complete = {p for p, n in zip(counts["_parent"], counts["_n"])
                    if n == k and p not in shallower_set}
        if not complete:
            continue
        comp_np = np.array(sorted(complete), dtype="U")

        def collapse(b: pa.Table, L=L, comp_np=comp_np):
            arr = np.asarray(b.column(cell_col).to_numpy(zero_copy_only=False),
                             dtype="U")
            if arr.size == 0:
                return pa.table({cell_col: pa.array([], pa.string())})
            ln = np.char.str_len(arr)
            parents = truncate_to_resolution(arr, L - 2)
            drop = (ln == L) & np.isin(parents, comp_np)
            return pa.table({cell_col: pa.array(arr[~drop], pa.string())})

        kept = cells_ds.map_batches(collapse, batch_format="pyarrow")
        new_parents = rd.from_arrow(
            pa.table({cell_col: pa.array(comp_np, pa.string())}))
        cells_ds = kept.union(new_parents)

    residue = sorted(set(cells_ds.to_pandas()[cell_col]))
    # exact driver pass on the (now small) residue
    return optimize_cuids(residue, n_side)


def expand_to_resolution(ds, res: int, grid: GridConfig = DEFAULT_GRID,
                         cell_col: str = "cellid"):
    """Expand every cell to its descendants at exactly `res` (cells already at
    res pass through; deeper cells raise).  Vectorized level-by-level flat map."""
    def kernel(b: pa.Table) -> pa.Table:
        arr = np.asarray(b.column(cell_col).to_numpy(zero_copy_only=False),
                         dtype="U")
        if arr.size == 0:
            return pa.table({cell_col: pa.array([], pa.string())})
        lens = np.char.str_len(arr)
        if (lens > res + 1).any():
            raise ValueError("cells deeper than target resolution")
        out = [arr[lens == res + 1]]
        todo = arr[lens < res + 1]
        while todo.size:
            kids, _ = explode_to_children(todo, grid)
            done = np.char.str_len(kids) == res + 1
            out.append(kids[done])
            todo = kids[~done]
        return pa.table({cell_col: pa.array(np.concatenate(out), pa.string())})

    return ds.map_batches(kernel, batch_format="pyarrow")


def _flagged(ds, cell_col, flag):
    def kernel(b: pa.Table, flag=flag) -> pa.Table:
        n = b.num_rows
        return pa.table({cell_col: b.column(cell_col),
                         "_src": pa.array(np.full(n, flag, np.int8))})
    return ds.map_batches(kernel, batch_format="pyarrow")


def area_setop_flags(ds_a, ds_b, res: int, grid: GridConfig = DEFAULT_GRID,
                     cell_col: str = "cellid"):
    """One shared pass for ALL set operations: per-cell (in_a, in_b) presence
    flags at the common resolution.  Union/intersection/difference (and their
    cardinalities) are cheap filters/aggregates over this single grouped result
    — computing them does NOT re-expand or re-shuffle the inputs."""
    from ray.data.aggregate import Max

    a = _flagged(expand_to_resolution(ds_a, res, grid, cell_col), cell_col, 1)
    b = _flagged(expand_to_resolution(ds_b, res, grid, cell_col), cell_col, 2)
    both = a.union(b)

    def indicators(t: pa.Table) -> pa.Table:
        # per-batch partial: collapse duplicate cells before the shuffle
        src = t.column("_src").to_numpy()
        part = pa.table({cell_col: t.column(cell_col),
                         "_a": pa.array((src == 1).astype(np.int8)),
                         "_b": pa.array((src == 2).astype(np.int8))})
        g = part.group_by(cell_col).aggregate([("_a", "max"), ("_b", "max")])
        return g.rename_columns([cell_col, "_a", "_b"])

    return both.map_batches(indicators, batch_format="pyarrow") \
        .groupby(cell_col).aggregate(Max("_a", alias_name="in_a"),
                                     Max("_b", alias_name="in_b"))


def area_setop(ds_a, ds_b, op: str, res: int, grid: GridConfig = DEFAULT_GRID,
               cell_col: str = "cellid"):
    """union / intersection / difference of two cell areas, computed at a common
    resolution via descendant expansion + one groupby with presence flags
    (SURVEY.md section 2.8: absent as reference operators, representable over
    CUID sets via rhpxutils.py:85-107 expansion)."""
    agg = area_setop_flags(ds_a, ds_b, res, grid, cell_col)

    if op == "union":
        expr = "in_a == 1 or in_b == 1"
    elif op == "intersection":
        expr = "in_a == 1 and in_b == 1"
    elif op == "difference":
        expr = "in_a == 1 and in_b == 0"
    else:
        raise ValueError(op)
    return agg.filter(expr=expr).select_columns([cell_col])
