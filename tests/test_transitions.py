"""events_cell_transitions: the OD (origin-destination) transition matrix
over each user's (ts, event_id)-ordered path of event-derived DGGS cells.
Pinned against a direct DuckDB LAG-window computation at sf0.001,
independent of the oracle_sql string, plus structural invariants (mass
conservation: total transitions = total events - number of users with
>=1 event ... precisely sum over users of max(n_events-1, 0))."""
import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _engine(res=1):
    from dggsray.pipelines.relational import events_cell_transitions
    out = events_cell_transitions(SF, res=res)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    return out.sort_values(["cell_from", "cell_to"]).reset_index(drop=True)


def _duck(res=1):
    from dggsray.oracle import cellid_sql, lonlat_sql
    lon, lat = lonlat_sql("event_id")
    cell = cellid_sql(lon, lat, res)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    return con.sql(
        f"WITH e AS (SELECT user_id, ts, event_id, {cell} AS cell "
        "FROM events), "
        "t AS (SELECT cell AS cell_to, LAG(cell) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS cell_from FROM e) "
        "SELECT cell_from, cell_to, COUNT(*) AS n FROM t "
        "WHERE cell_from IS NOT NULL GROUP BY 1, 2 "
        "ORDER BY 1, 2").df()


class TestEventsCellTransitions:
    def test_matches_duckdb_lag_window(self, ray_session):
        out = _engine()
        ref = _duck()
        assert out.cell_from.tolist() == ref.cell_from.tolist()
        assert out.cell_to.tolist() == ref.cell_to.tolist()
        assert out.n_transitions.tolist() == ref.n.tolist()

    def test_mass_conservation(self, ray_session):
        # Each user with k events contributes exactly k-1 transitions.
        out = _engine()
        con = duckdb.connect()
        expected = con.sql(
            f"SELECT SUM(GREATEST(k - 1, 0)) FROM (SELECT COUNT(*) k "
            f"FROM read_parquet('{SF}/events.parquet') "
            "GROUP BY user_id)").fetchone()[0]
        assert out.n_transitions.sum() == expected

    def test_finer_resolution_refines(self, ray_session):
        # At a finer resolution the transition mass is conserved and the
        # pair cardinality can only grow (each coarse pair splits).
        coarse, fine = _engine(res=1), _engine(res=2)
        assert coarse.n_transitions.sum() == fine.n_transitions.sum()
        assert len(fine) >= len(coarse)
        # every fine pair truncates onto a coarse pair that exists
        from dggsray.core.cells import truncate_to_resolution
        cf = truncate_to_resolution(fine.cell_from.tolist(), 1)
        ct = truncate_to_resolution(fine.cell_to.tolist(), 1)
        coarse_pairs = set(zip(coarse.cell_from, coarse.cell_to))
        assert set(zip(cf, ct)) <= coarse_pairs


class TestEventsCellDwell:
    def test_matches_duckdb_gaps_and_islands(self, ray_session):
        from dggsray.oracle import cellid_sql, lonlat_sql
        from dggsray.pipelines.relational import events_cell_dwell
        out = events_cell_dwell(SF, res=1)
        if not isinstance(out, pd.DataFrame):
            out = out.to_pandas()
        out = out.sort_values("cell").reset_index(drop=True)
        lon, lat = lonlat_sql("event_id")
        cell = cellid_sql(lon, lat, 1)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
        ref = con.sql(
            f"WITH e AS (SELECT user_id, ts, event_id, {cell} AS cell "
            "FROM events), "
            "t AS (SELECT *, CASE WHEN cell IS DISTINCT FROM LAG(cell) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "THEN 1 ELSE 0 END AS chg FROM e), "
            "r AS (SELECT user_id, cell, ts, SUM(chg) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS island FROM t), "
            "v AS (SELECT user_id, island, MIN(cell) AS cell, "
            "epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS d, COUNT(*) AS n "
            "FROM r GROUP BY 1, 2) "
            "SELECT cell, COUNT(*) v, SUM(d) d, SUM(n) n FROM v "
            "GROUP BY 1 ORDER BY 1").df()
        assert out.cell.tolist() == ref.cell.tolist()
        assert out.n_visits.tolist() == ref.v.tolist()
        assert out.total_dwell_us.tolist() == ref.d.tolist()
        assert out.n_events.tolist() == ref.n.tolist()

    def test_visits_consistent_with_transitions(self, ray_session):
        # each user's first event opens a visit; every cell-CHANGING
        # transition opens one more: total visits = users + changing
        # transitions.  Cross-checks two independent pipelines.
        import duckdb as dk
        from dggsray.pipelines.relational import (events_cell_dwell,
                                                  events_cell_transitions)
        dwell = events_cell_dwell(SF, res=1)
        if not isinstance(dwell, pd.DataFrame):
            dwell = dwell.to_pandas()
        trans = events_cell_transitions(SF, res=1)
        if not isinstance(trans, pd.DataFrame):
            trans = trans.to_pandas()
        changing = trans[trans.cell_from != trans.cell_to] \
            .n_transitions.sum()
        con = dk.connect()
        n_users = con.sql(
            f"SELECT COUNT(DISTINCT user_id) FROM "
            f"read_parquet('{SF}/events.parquet')").fetchone()[0]
        assert dwell.n_visits.sum() == n_users + changing
        assert (dwell.total_dwell_us >= 0).all()


class TestEventsUserAnomalies:
    def test_matches_bruteforce(self, ray_session):
        # sequential per-user replay with exact integer arithmetic
        import pyarrow.parquet as pq
        import numpy as np
        from dggsray.pipelines.relational import events_user_anomalies
        out = events_user_anomalies(SF, k=2, min_prior=5)
        t = pq.read_table(f"{SF}/events.parquet",
                          columns=["event_id", "user_id", "ts", "value"]) \
            .to_pandas().sort_values(["user_id", "ts", "event_id"])
        t["v"] = np.floor(t.value.to_numpy() * 100 + 0.5).astype(np.int64)
        ref = {}
        for uid, grp in t.groupby("user_id"):
            n = s = ss = 0
            scored = anom = 0
            for v in grp.v:
                if n >= 5:
                    scored += 1
                    if (v * n - s) ** 2 > 4 * (n * ss - s * s):
                        anom += 1
                n += 1
                s += v
                ss += v * v
            if scored:
                ref[uid] = (scored, anom)
        assert dict(zip(out.user_id,
                        zip(out.n_scored, out.n_anomalies))) == ref

    def test_anomalies_bounded_by_scored(self, ray_session):
        from dggsray.pipelines.relational import events_user_anomalies
        out = events_user_anomalies(SF, k=3)
        strict = events_user_anomalies(SF, k=2)
        assert (out.n_anomalies <= out.n_scored).all()
        # larger k can only flag fewer (or equal) events per user
        m = out.set_index("user_id").n_anomalies
        s = strict.set_index("user_id").n_anomalies
        common = m.index.intersection(s.index)
        assert (m[common] <= s[common]).all()
