"""Windowed / ordered operators Ray Data lacks natively: sessionization
(gap-based windowed aggregate) and as-of join.

Both follow the engine's coarse-partition pattern (same as
`ops/dedup.lsh_candidate_pairs`): rows are hash-partitioned on the entity key
into n_parts COARSE groups — whole entities never split — and each of the
<= n_parts Python calls processes ALL its entities vectorized (sort once,
run-length boundaries, numpy reduceat/searchsorted).  One shuffle total, no
per-entity Python calls.

Partitioning assumption (documented per the custom-operator contract): every
row of one entity (user) lands in one partition — guaranteed by key-hash
partitioning; skew is bounded because per-entity work is O(rows log rows)
within a vectorized kernel.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    """Timestamp column -> int64 MICROSECONDS regardless of the stored unit
    (parquet writers commonly emit ns; a bare int64 cast would return raw
    ticks in whatever the native unit is)."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64()).to_numpy()


def _with_part(ds, key_col: str, n_parts: int):
    def part(b: pa.Table) -> pa.Table:
        u = b.column(key_col).to_numpy()
        # splitmix-style mix so sequential ids spread over partitions
        h = (u.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return b.append_column(
            "_part", pa.array((h % np.uint64(n_parts)).astype(np.int32)))
    return ds.map_batches(part, batch_format="pyarrow")


def sessionize(ds, user_col: str = "user_id", ts_col: str = "ts",
               gap_s: float = 1800.0, n_parts: int = 64):
    """Gap-based sessionization: consecutive events of one user belong to one
    session while the gap is <= gap_s; returns one row per user with
    (user, n_events, n_sessions).  Equivalent to the SQL lag-window idiom
    SUM(CASE WHEN ts - lag(ts) OVER (PARTITION BY user ORDER BY ts) > gap
    THEN 1 ELSE 0 END) + 1 — tie order within equal timestamps does not
    affect the result (consecutive sorted-ts diffs are tie-invariant)."""
    gap_us = int(round(gap_s * 1e6))

    def kernel(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[(user_col, "ascending"),
                                              (ts_col, "ascending")])
        g = g.take(order)
        u = g.column(user_col).to_numpy()
        ts = _ts_us(g.column(ts_col))
        if u.size == 0:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64())})
        new_user = np.r_[True, u[1:] != u[:-1]]
        new_sess = new_user | np.r_[True, (ts[1:] - ts[:-1]) > gap_us]
        starts = np.flatnonzero(new_user)
        n_events = np.diff(np.append(starts, u.size))
        n_sessions = np.add.reduceat(new_sess.astype(np.int64), starts)
        return pa.table({user_col: pa.array(u[starts].astype(np.int64)),
                         "n_events": pa.array(n_events.astype(np.int64)),
                         "n_sessions": pa.array(n_sessions)})

    return _with_part(ds, user_col, n_parts) \
        .groupby("_part").map_groups(kernel, batch_format="pyarrow")


def asof_join_self(ds, left_type: str, right_type: str,
                   user_col: str = "user_id", ts_col: str = "ts",
                   type_col: str = "event_type", id_col: str = "event_id",
                   n_parts: int = 64):
    """As-of self join: for every `left_type` event, the most recent
    `right_type` event of the SAME user at or before its timestamp
    (DuckDB: ASOF LEFT JOIN ... ON user = user AND l.ts >= r.ts).

    Per partition: one sort of the user's right events, then a vectorized
    searchsorted of all left timestamps against them — no row loops.  Ties
    (right event exactly at the left ts) match, like SQL's >=; among equal
    right timestamps the one with the largest (ts, event_id) sort position
    wins, matching DuckDB's last-peer semantics with a deterministic
    event_id tiebreak.  Left events with no prior right event emit the -1
    SENTINEL in match_event_id / match_ts_us (matching the SQL oracle's
    COALESCE(..., -1)) — a sentinel, not NULL, unambiguous because event
    ids are non-negative in the events-table contract.

    The kernel is fully vectorized across ALL users of a partition, with no
    per-user Python loop: after the global (user, ts, id) sort, every left
    row's match is "the last right row at a global position <= the end of
    the left row's (user, ts) tie group" — one searchsorted of those target
    positions against the right rows' positions, then a per-user-offset
    check rejects matches that fell into an earlier user's run."""
    def kernel(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[(user_col, "ascending"),
                                              (ts_col, "ascending"),
                                              (id_col, "ascending")])
        g = g.take(order)
        u = g.column(user_col).to_numpy()
        ts = _ts_us(g.column(ts_col))
        et = g.column(type_col).to_numpy(zero_copy_only=False)
        ev = g.column(id_col).to_numpy()
        is_l = et == left_type
        is_r = et == right_type
        li = np.flatnonzero(is_l)
        if li.size == 0 or u.size == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                user_col: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "match_event_id": pa.array([], pa.int64()),
                "match_ts_us": pa.array([], pa.int64())})
        run_id = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        ri = np.flatnonzero(is_r)
        if ri.size == 0:
            neg = np.full(li.size, -1, np.int64)
            return pa.table({
                "event_id": pa.array(ev[li].astype(np.int64)),
                user_col: pa.array(u[li].astype(np.int64)),
                "ts_us": pa.array(ts[li]),
                "match_event_id": pa.array(neg),
                "match_ts_us": pa.array(neg)})
        # per-run offset of the first right row (for same-user validation)
        n_runs = int(run_id[-1]) + 1
        r_counts = np.bincount(run_id[ri], minlength=n_runs)
        r_off = np.concatenate([[0], np.cumsum(r_counts)])
        # (user, ts) tie groups: a left row may match right rows anywhere in
        # its own tie group (equal ts counts regardless of id interleave —
        # the SQL >= contract), so its target is the group's LAST position
        new_grp = np.r_[True, (u[1:] != u[:-1]) | (ts[1:] != ts[:-1])]
        grp = np.cumsum(new_grp) - 1
        grp_last = np.flatnonzero(np.r_[new_grp[1:], True])
        target = grp_last[grp[li]]
        # rightmost right event at global position <= target
        pos = np.searchsorted(ri, target, side="right") - 1
        ok = pos >= r_off[run_id[li]]     # match lies in the SAME user run
        safe = np.maximum(pos, 0)
        rid = np.where(ok, ev[ri[safe]], -1).astype(np.int64)
        rts = np.where(ok, ts[ri[safe]], -1).astype(np.int64)
        return pa.table({
            "event_id": pa.array(ev[li].astype(np.int64)),
            user_col: pa.array(u[li].astype(np.int64)),
            "ts_us": pa.array(ts[li]),
            "match_event_id": pa.array(rid),
            "match_ts_us": pa.array(rts)})

    return _with_part(ds, user_col, n_parts) \
        .groupby("_part").map_groups(kernel, batch_format="pyarrow")


def range_join_count(ds, left_type: str, right_type: str, window_us: int,
                     user_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type", id_col: str = "event_id",
                     n_parts: int = 64):
    """Range self join (attribution window): for every `left_type` event,
    COUNT the same user's `right_type` events with ts in
    [l.ts - window_us, l.ts] — SQL `r.ts BETWEEN l.ts - w AND l.ts`,
    inclusive both ends.

    Same partition-by-user-hash shape as asof_join_self; inside a partition
    the kernel is fully vectorized with no per-user loop: after one global
    (user, ts, id) sort, each user run gets a run index, (run, ts-offset)
    packs into ONE monotone int64 key, and the window count is a pair of
    np.searchsorted calls over the right rows' keys.  The pack is safe while
    runs_per_partition x timespan_us < 2^62 — raise n_parts for corpora that
    ever approach it (guarded with an explicit error, not silent wraparound)."""
    def kernel(g: pa.Table) -> pa.Table:
        empty = pa.table({"event_id": pa.array([], pa.int64()),
                          user_col: pa.array([], pa.int64()),
                          "ts_us": pa.array([], pa.int64()),
                          "n_matches": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        order = pc.sort_indices(g, sort_keys=[(user_col, "ascending"),
                                              (ts_col, "ascending"),
                                              (id_col, "ascending")])
        g = g.take(order)
        u = g.column(user_col).to_numpy()
        ts = _ts_us(g.column(ts_col))
        et = g.column(type_col).to_numpy(zero_copy_only=False)
        ev = g.column(id_col).to_numpy()
        li = np.flatnonzero(et == left_type)
        ri = np.flatnonzero(et == right_type)
        if li.size == 0:
            return empty
        run_id = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        t0 = int(ts.min())
        span = int(ts.max()) - t0 + window_us + 2
        n_runs = int(run_id[-1]) + 1
        if n_runs * span >= (1 << 62):
            raise ValueError(
                f"range_join_count key pack overflow ({n_runs} user runs x "
                f"{span} us span) — raise n_parts")
        off = ts - t0
        key_r = run_id[ri] * span + off[ri]
        lo = run_id[li] * span + np.maximum(off[li] - window_us, 0)
        hi = run_id[li] * span + off[li]
        cnt = (np.searchsorted(key_r, hi, side="right")
               - np.searchsorted(key_r, lo, side="left"))
        return pa.table({"event_id": pa.array(ev[li].astype(np.int64)),
                         user_col: pa.array(u[li].astype(np.int64)),
                         "ts_us": pa.array(ts[li].astype(np.int64)),
                         "n_matches": pa.array(cnt.astype(np.int64))})

    return _with_part(ds, user_col, n_parts) \
        .groupby("_part").map_groups(kernel, batch_format="pyarrow")


def running_total(ds, user_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value", id_col: str = "event_id",
                  n_parts: int = 64):
    """Per-user running cumulative sum ordered by (ts, id) — the
    unbounded-preceding window frame (SQL: SUM() OVER (PARTITION BY user
    ORDER BY ts, id)).  Same one-shuffle shape as sessionize: user-hash
    partitions, one sort per partition, then a vectorized grouped cumsum
    (global cumsum minus each user run's preceding total).  Values
    accumulate as exact integer cents.  Emits
    (event_id, user_id, ts_us, running_cents)."""
    def kernel(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[(user_col, "ascending"),
                                              (ts_col, "ascending"),
                                              (id_col, "ascending")])
        g = g.take(order)
        users = g.column(user_col).to_numpy()
        cents = np.rint(g.column(value_col).to_numpy() * 100) \
            .astype(np.int64)
        cum = np.cumsum(cents)
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        # subtract the cumulative total BEFORE each user's first row
        base = np.where(starts > 0, cum[starts - 1], 0)
        run = cum - np.repeat(base, np.diff(np.r_[starts, len(users)]))
        return pa.table({
            "event_id": pc.cast(g.column(id_col), pa.int64()),
            "user_id": pc.cast(g.column(user_col), pa.int64()),
            "ts_us": pa.array(_ts_us(g.column(ts_col))),
            "running_cents": pa.array(run)})

    return _with_part(ds, user_col, n_parts) \
        .groupby("_part").map_groups(kernel, batch_format="pyarrow")


def transition_counts(ds, col: str = "cell", user_col: str = "user_id",
                      ts_col: str = "ts", id_col: str = "event_id",
                      n_parts: int = 64):
    """Origin-destination transition counts: for every pair of CONSECUTIVE
    events of one user (ordered by ts, id), count (col_from, col_to)
    occurrences over all users — the LAG-window idiom
    `LAG(col) OVER (PARTITION BY user ORDER BY ts, id)` followed by a
    pair groupby.  Same one-shuffle shape as sessionize: user-hash
    partitions keep every user's rows together; per partition ONE sort,
    a vectorized shift masked at user-run boundaries, and an in-kernel
    Arrow group_by so only (from, to, partial_count) rows — bounded by
    the value-pair cardinality, not event count — leave each task.
    Emits (col_from, col_to, _n) partials; callers finish with one tiny
    keyed aggregate."""
    def kernel(g: pa.Table) -> pa.Table:
        empty = pa.table({f"{col}_from": pa.array([], pa.string()),
                          f"{col}_to": pa.array([], pa.string()),
                          "_n": pa.array([], pa.int64())})
        if g.num_rows < 2:
            return empty
        order = pc.sort_indices(g, sort_keys=[(user_col, "ascending"),
                                              (ts_col, "ascending"),
                                              (id_col, "ascending")])
        g = g.take(order)
        u = g.column(user_col).to_numpy()
        same = u[1:] == u[:-1]
        if not same.any():
            return empty
        c = g.column(col)
        idx_to = np.flatnonzero(same) + 1
        t = pa.table({f"{col}_from": c.take(pa.array(idx_to - 1)),
                      f"{col}_to": c.take(pa.array(idx_to))})
        out = t.group_by([f"{col}_from", f"{col}_to"]).aggregate(
            [([], "count_all")])
        return out.rename_columns([f"{col}_from", f"{col}_to", "_n"])

    return _with_part(ds, user_col, n_parts) \
        .groupby("_part").map_groups(kernel, batch_format="pyarrow")


def run_dwell_aggregate(ds, col: str = "cell", user_col: str = "user_id",
                        ts_col: str = "ts", id_col: str = "event_id",
                        n_parts: int = 64):
    """Gaps-and-islands dwell aggregation: each maximal run of CONSECUTIVE
    equal `col` values in one user's (ts, id)-ordered stream is a visit;
    per visit the dwell is last_ts - first_ts (microseconds).  The SQL
    equivalent is the LAG-change flag + running-sum island id + two
    nested GROUP BYs; here it is the same one-shuffle shape as
    sessionize: user-hash partitions, per partition ONE sort, vectorized
    run-boundary detection (user change OR value change), reduceat
    min/max/count per run, then an in-kernel fold by `col` so only
    (col, n_visits, dwell_us, n_events) partials — bounded by value
    cardinality — leave each task.  Callers finish with one tiny keyed
    aggregate over the partials."""
    def kernel(g: pa.Table) -> pa.Table:
        empty = pa.table({col: pa.array([], pa.string()),
                          "_v": pa.array([], pa.int64()),
                          "_d": pa.array([], pa.int64()),
                          "_n": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        order = pc.sort_indices(g, sort_keys=[(user_col, "ascending"),
                                              (ts_col, "ascending"),
                                              (id_col, "ascending")])
        g = g.take(order)
        u = g.column(user_col).to_numpy()
        c = np.asarray(g.column(col).to_pylist())
        ts = g.column(ts_col).to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        new_run = np.r_[True, (u[1:] != u[:-1]) | (c[1:] != c[:-1])]
        starts = np.flatnonzero(new_run)
        ends = np.r_[starts[1:], c.size] - 1
        dwell = ts[ends] - ts[starts]
        n_ev = ends - starts + 1
        t = pa.table({col: pa.array(c[starts], pa.string()),
                      "_v": pa.array(np.ones(starts.size, dtype=np.int64)),
                      "_d": pa.array(dwell),
                      "_n": pa.array(n_ev.astype(np.int64))})
        out = t.group_by(col).aggregate([("_v", "sum"), ("_d", "sum"),
                                         ("_n", "sum")])
        return out.rename_columns([col, "_v", "_d", "_n"])

    return _with_part(ds, user_col, n_parts) \
        .groupby("_part").map_groups(kernel, batch_format="pyarrow")


def running_anomaly_counts(ds, value_col: str = "v",
                           user_col: str = "user_id", ts_col: str = "ts",
                           id_col: str = "event_id", k: int = 2,
                           min_prior: int = 5, n_parts: int = 64):
    """Per-user ONLINE anomaly scoring with exact integer arithmetic: event
    i is anomalous iff its value deviates from the mean of the user's
    PRECEDING events by more than k standard deviations, evaluated without
    any float division via the cross-multiplied form
        (v*n - s)^2 > k^2 * (n*ss - s^2)
    over integer value units (n/s/ss = count/sum/sum-of-squares of the
    preceding prefix), so the Ray result and a SQL window oracle agree
    bit-for-bit.  Same one-shuffle sessionize shape: user-hash partitions,
    one sort per partition, prefix sums reset at user boundaries by the
    cumsum-minus-run-start trick.  Emits (user, n_scored, n_anomalies)
    rows — already final, one row per user.  Raises loudly when
    max|value| * max-events-per-user approaches int64 overflow."""
    k2 = k * k

    def kernel(g: pa.Table) -> pa.Table:
        empty = pa.table({user_col: pa.array([], pa.int64()),
                          "n_scored": pa.array([], pa.int64()),
                          "n_anomalies": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        order = pc.sort_indices(g, sort_keys=[(user_col, "ascending"),
                                              (ts_col, "ascending"),
                                              (id_col, "ascending")])
        g = g.take(order)
        u = g.column(user_col).to_numpy()
        v = g.column(value_col).to_numpy().astype(np.int64)
        N = v.size
        pos = np.arange(N, dtype=np.int64)
        new_run = np.r_[True, u[1:] != u[:-1]]
        run_start = pos[new_run][np.cumsum(new_run) - 1]
        n = pos - run_start
        vmax = np.abs(v).max() if N else 0
        nmax = n.max() + 1 if N else 0
        if vmax * nmax > 1_500_000_000:
            raise OverflowError(
                f"running_anomaly_counts: max|value|*max_run "
                f"({vmax}*{nmax}) too large for exact int64 "
                "cross-multiplied variance; rescale the value units")
        cs = np.r_[0, np.cumsum(v)]
        css = np.r_[0, np.cumsum(v * v)]
        s = cs[pos] - cs[run_start]
        ss = css[pos] - css[run_start]
        scored = n >= min_prior
        lhs = (v * n - s)
        anom = scored & (lhs * lhs > k2 * (n * ss - s * s))
        t = pa.table({user_col: pa.array(u.astype(np.int64)),
                      "_sc": pa.array(scored.astype(np.int64)),
                      "_an": pa.array(anom.astype(np.int64))})
        out = t.group_by(user_col).aggregate([("_sc", "sum"),
                                              ("_an", "sum")])
        return out.rename_columns([user_col, "n_scored", "n_anomalies"])

    return _with_part(ds, user_col, n_parts) \
        .groupby("_part").map_groups(kernel, batch_format="pyarrow")
