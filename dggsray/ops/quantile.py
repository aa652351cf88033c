"""Exact distributed order statistics (median / arbitrary rank) per group.

The classic two-pass histogram-narrowing algorithm, which is how exact
quantiles are computed over data too large to sort globally:

  pass 0  per-group (count, min, max)           — tiny lowcard aggregate
  pass 1  per-group fixed-width histogram       — one streaming pass; each
          batch contributes a bincount blob, groups are few so the final
          reduction is one small grouped sum
  driver  locate the bucket(s) holding the target ranks from the cumulative
          histogram — P*B integers, no data rows
  pass 2  stream-filter ONLY the rows inside those buckets (expected
          n/n_buckets per group) and take the exact order statistics

No global sort, no shuffle of data rows; the only driver-side collections are
histograms and the final narrow bucket (caveat: a group whose values are all
identical concentrates in one bucket — the filter then collects that group's
full value list; detect via min==max and short-circuit, handled below).

Returned ranks follow the exact-order-statistic convention (lo = value at
rank floor((n-1)q), hi = at ceil((n-1)q)) so a SQL mirror via
row_number() picks bit-identical doubles — no interpolation arithmetic to
match across engines.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def exact_group_median(ds, value_col: str, group_col: str,
                       n_buckets: int = 1 << 14):
    """-> pa.Table (group, med_lo, med_hi, n): exact lower/upper middle order
    statistics per group (equal when n is odd)."""
    return exact_group_quantile(ds, value_col, group_col, 1, 2, n_buckets)


def exact_group_quantile(ds, value_col: str, group_col: str,
                         num: int, den: int, n_buckets: int = 1 << 14):
    """Exact q = num/den order statistics per group: the ranks picked are
    r0 = floor((n-1)*q) and r1 = ceil((n-1)*q) — integer rational arithmetic,
    so a SQL row_number mirror selects bit-identical doubles."""
    from ray.data.aggregate import Max, Min, Sum

    from .joins import lowcard_groupby

    # pass 0: per-group count/min/max
    def stat_partial(b: pa.Table) -> pa.Table:
        g = b.select([group_col, value_col]).group_by(group_col).aggregate(
            [(value_col, "count"), (value_col, "min"), (value_col, "max")])
        return g.rename_columns([group_col, "_c", "_lo", "_hi"])

    stats = lowcard_groupby(ds.map_batches(stat_partial, batch_format="pyarrow"),
                            group_col, Sum("_c", alias_name="n"),
                            Min("_lo", alias_name="lo"),
                            Max("_hi", alias_name="hi")).to_pandas()
    groups = stats[group_col].tolist()
    n_of = dict(zip(groups, stats["n"].astype(np.int64)))
    lo_of = dict(zip(groups, stats["lo"].astype(np.float64)))
    hi_of = dict(zip(groups, stats["hi"].astype(np.float64)))

    # degenerate groups (all-equal values) resolve without passes 1-2
    todo = [g for g in groups if hi_of[g] > lo_of[g]]
    results = {g: (lo_of[g], lo_of[g]) for g in groups if g not in todo}

    if todo:
        gidx = {g: i for i, g in enumerate(todo)}
        glo = np.array([lo_of[g] for g in todo])
        gspan = np.array([hi_of[g] - lo_of[g] for g in todo])

        # pass 1: per-group histograms, one bincount blob per (batch, group)
        def hist_partial(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            vv = b.column(value_col).to_numpy()
            out_g, out_h = [], []
            gv_arr = pc.fill_null(
                pc.index_in(b.column(group_col),
                            value_set=pa.array(todo, pa.string())), -1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            for gi in np.unique(gv_arr):
                if gi < 0:
                    continue
                v = vv[gv_arr == gi]
                idx = np.clip(((v - glo[gi]) / gspan[gi] * n_buckets)
                              .astype(np.int64), 0, n_buckets - 1)
                out_g.append(todo[gi])
                out_h.append(np.bincount(idx, minlength=n_buckets)
                             .astype(np.int64).tobytes())
            return pa.table({group_col: pa.array(out_g, pa.string()),
                             "_h": pa.array(out_h, pa.large_binary())})

        def hist_sum(t: pa.Table) -> pa.Table:
            acc = np.zeros(n_buckets, dtype=np.int64)
            for blob in t.column("_h").to_pylist():
                acc += np.frombuffer(blob, dtype=np.int64)
            return pa.table({group_col: t.column(group_col).slice(0, 1),
                             "_h": pa.array([acc.tobytes()],
                                            pa.large_binary())})

        hists = ds.map_batches(hist_partial, batch_format="pyarrow") \
            .groupby(group_col).map_groups(hist_sum, batch_format="pyarrow") \
            .to_pandas()

        # driver: locate the buckets holding ranks r0/r1 per group
        want = {}
        for _, row in hists.iterrows():
            g = row[group_col]
            h = np.frombuffer(row["_h"], dtype=np.int64)
            cum = np.cumsum(h)
            n = n_of[g]
            r0 = ((n - 1) * num) // den
            r1 = -((-(n - 1) * num) // den)        # ceil
            b0 = int(np.searchsorted(cum, r0 + 1))
            b1 = int(np.searchsorted(cum, r1 + 1))
            below = int(cum[b0 - 1]) if b0 > 0 else 0
            want[g] = (b0, b1, below, r0, r1)

        # pass 2: collect only the narrow bucket range per group (tiny);
        # vectorized per group present in the batch, not per row
        def in_bucket(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            vv = b.column(value_col).to_numpy()
            gv_arr = pc.fill_null(
                pc.index_in(b.column(group_col),
                            value_set=pa.array(todo, pa.string())), -1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.zeros(len(vv), dtype=bool)
            for g, w in want.items():
                gi = gidx[g]
                m = gv_arr == gi
                if not m.any():
                    continue
                idx = np.clip(((vv[m] - glo[gi]) / gspan[gi] * n_buckets)
                              .astype(np.int64), 0, n_buckets - 1)
                keep[m] = (idx >= w[0]) & (idx <= w[1])
            return b.filter(pa.array(keep)).select([group_col, value_col])

        narrow = ds.map_batches(in_bucket, batch_format="pyarrow").to_pandas()
        for g, (b0, b1, below, r0, r1) in want.items():
            vals = np.sort(narrow.loc[narrow[group_col] == g,
                                      value_col].to_numpy())
            results[g] = (float(vals[r0 - below]), float(vals[r1 - below]))

    return pa.table({
        group_col: pa.array(groups, pa.string()),
        "med_lo": pa.array([results[g][0] for g in groups], pa.float64()),
        "med_hi": pa.array([results[g][1] for g in groups], pa.float64()),
        "n": pa.array([int(n_of[g]) for g in groups], pa.int64())})
