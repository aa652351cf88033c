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
        ts = g.column(ts_col).cast(pa.int64()).to_numpy()   # microseconds
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
    event_id tiebreak.  Left events with no prior right event emit null
    match columns (LEFT join)."""
    def kernel(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[(user_col, "ascending"),
                                              (ts_col, "ascending"),
                                              (id_col, "ascending")])
        g = g.take(order)
        u = g.column(user_col).to_numpy()
        ts = g.column(ts_col).cast(pa.int64()).to_numpy()
        et = g.column(type_col).to_numpy(zero_copy_only=False)
        ev = g.column(id_col).to_numpy()
        is_l = et == left_type
        is_r = et == right_type
        out_l, out_r_id, out_r_ts = [], [], []
        # per-user runs (users are few per partition; the inner work is
        # vectorized searchsorted over that user's rows)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.append(starts[1:], u.size)
        for s, e in zip(starts, ends):
            li = np.flatnonzero(is_l[s:e]) + s
            if li.size == 0:
                continue
            ri = np.flatnonzero(is_r[s:e]) + s
            if ri.size == 0:
                out_l.append(li)
                out_r_id.append(np.full(li.size, -1, np.int64))
                out_r_ts.append(np.full(li.size, -1, np.int64))
                continue
            # rightmost right-event with ts <= left ts
            pos = np.searchsorted(ts[ri], ts[li], side="right") - 1
            ok = pos >= 0
            rid = np.where(ok, ev[ri[np.maximum(pos, 0)]], -1)
            rts = np.where(ok, ts[ri[np.maximum(pos, 0)]], -1)
            out_l.append(li)
            out_r_id.append(rid.astype(np.int64))
            out_r_ts.append(rts.astype(np.int64))
        if not out_l:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                user_col: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "match_event_id": pa.array([], pa.int64()),
                "match_ts_us": pa.array([], pa.int64())})
        li = np.concatenate(out_l)
        rid = np.concatenate(out_r_id)
        rts = np.concatenate(out_r_ts)
        return pa.table({
            "event_id": pa.array(ev[li].astype(np.int64)),
            user_col: pa.array(u[li].astype(np.int64)),
            "ts_us": pa.array(ts[li]),
            "match_event_id": pa.array(rid),
            "match_ts_us": pa.array(rts)})

    return _with_part(ds, user_col, n_parts) \
        .groupby("_part").map_groups(kernel, batch_format="pyarrow")
