"""Windowed operators: sessionize (gap windows) and as-of self join
(`dggsray/ops/window.py`)."""
import numpy as np
import pyarrow as pa
import pytest


def _events(rows):
    """rows: (event_id, user_id, ts_us, event_type)"""
    import ray.data as rd
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string())})
    return rd.from_arrow(t)


class TestSessionize:
    def test_gap_boundaries(self, ray_session):
        from dggsray.ops.window import sessionize
        S = 1_000_000  # 1 s in us
        rows = [
            # user 1: gaps exactly at, under and over 10 s (gap_s=10)
            (0, 1, 0 * S, "view"),
            (1, 1, 10 * S, "view"),     # ==gap -> same session
            (2, 1, 21 * S, "view"),     # 11 s  -> new session
            (3, 1, 21 * S, "view"),     # duplicate ts -> same session
            # user 2: single event
            (4, 2, 5 * S, "view"),
        ]
        df = sessionize(_events(rows), gap_s=10.0).to_pandas() \
            .set_index("user_id").sort_index()
        assert df.loc[1, "n_events"] == 4
        assert df.loc[1, "n_sessions"] == 2
        assert df.loc[2, "n_events"] == 1
        assert df.loc[2, "n_sessions"] == 1

    def test_matches_duckdb_window_sql(self, ray_session, tmp_path):
        import duckdb
        import ray.data as rd
        rng = np.random.default_rng(7)
        n = 2000
        t = pa.table({
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 37, n), pa.int64()),
            "ts": pa.array(np.sort(rng.integers(0, 3_600_000_000, n)),
                           pa.timestamp("us")),
            "event_type": pa.array(["view"] * n, pa.string())})
        from dggsray.ops.window import sessionize
        got = sessionize(rd.from_arrow(t), gap_s=60.0).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        p = str(tmp_path / "ev.parquet")
        import pyarrow.parquet as pq
        pq.write_table(t, p)
        exp = duckdb.sql(
            f"WITH o AS (SELECT user_id, ts, lag(ts) OVER "
            f"(PARTITION BY user_id ORDER BY ts) AS prev "
            f"FROM '{p}') "
            f"SELECT user_id, COUNT(*) AS n_events, "
            f"CAST(SUM(CASE WHEN prev IS NULL OR "
            f"epoch_us(ts) - epoch_us(prev) > 60000000 THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS n_sessions FROM o GROUP BY 1 ORDER BY 1").df()
        assert (got["user_id"].to_numpy() == exp["user_id"].to_numpy()).all()
        assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
        assert (got["n_sessions"].to_numpy()
                == exp["n_sessions"].to_numpy()).all()


class TestAsofJoinSelf:
    def test_semantics(self, ray_session):
        from dggsray.ops.window import asof_join_self
        S = 1_000_000
        rows = [
            (0, 1, 0 * S, "error"),
            (1, 1, 3 * S, "click"),    # matches error 0 (only one <= 3)
            (2, 1, 5 * S, "error"),    # exactly at click 3's ts
            (3, 1, 5 * S, "click"),    # tie: error at same ts matches (<=)
            (4, 1, 9 * S, "click"),    # matches error 2 (latest <= 9)
            (5, 2, 1 * S, "click"),    # user 2 has no error -> -1
        ]
        df = asof_join_self(_events(rows), "click", "error") \
            .to_pandas().set_index("event_id").sort_index()
        assert df.loc[1, "match_event_id"] == 0
        assert df.loc[3, "match_event_id"] == 2     # ts tie matches
        assert df.loc[4, "match_event_id"] == 2
        assert df.loc[5, "match_event_id"] == -1
        assert df.loc[5, "match_ts_us"] == -1
        assert len(df) == 4                          # only click rows emitted

    def test_tie_among_right_rows_takes_largest_id(self, ray_session):
        from dggsray.ops.window import asof_join_self
        rows = [
            (10, 3, 100, "error"),
            (11, 3, 100, "error"),     # same ts: largest event_id wins
            (12, 3, 200, "click"),
        ]
        df = asof_join_self(_events(rows), "click", "error").to_pandas()
        assert df.loc[0, "match_event_id"] == 11


class TestMovingWindow:
    def test_rows_window_resets_per_type(self, ray_session, tmp_path):
        """Trailing ROWS window restarts at each type; hour gaps do NOT pad
        (rows semantics, matching the SQL oracle)."""
        import duckdb
        import pyarrow.parquet as pq
        from dggsray.pipelines.relational import events_moving_window
        H = 3_600_000_000
        rows = []
        eid = 0
        # type a: hours 0,1,2,5 (gap between 2 and 5); type b: single hour
        for h, v in [(0, 1.0), (1, 2.0), (2, 4.0), (5, 8.0)]:
            rows.append((eid, 1, h * H, "a", v)); eid += 1
        rows.append((eid, 1, 0, "b", 16.0)); eid += 1
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64())})
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, str(d / "events.parquet"))
        out = events_moving_window(str(d)).take_all()
        got = {(r["event_type"], r["hour_ts"].hour if hasattr(r["hour_ts"], "hour")
                else r["hour_ts"]): (r["win_cents"], r["win_events"])
               for r in out}
        by = {(et, hts.hour): v for (et, hts), v in got.items()} \
            if not isinstance(next(iter(got))[1], int) else got
        # rows window: h5 of type a sums h1,h2,h5 (NOT h3,h4 padding)
        assert by[("a", 0)] == (100, 1)
        assert by[("a", 1)] == (300, 2)
        assert by[("a", 2)] == (700, 3)
        assert by[("a", 5)] == (1400, 3)
        assert by[("b", 0)] == (1600, 1)


class TestTimestampUnits:
    def test_ns_timestamps_measure_real_time(self, ray_session):
        """ts stored as timestamp[ns] must sessionize identically to the same
        instants stored as us (regression: raw-tick cast)."""
        import ray.data as rd
        from dggsray.ops.window import sessionize
        H = 3_600_000_000  # us
        rows = [(1, 0), (1, 100_000_000), (1, 2 * H)]   # gap splits at 2h
        for unit, mult in (("us", 1), ("ns", 1000)):
            t = pa.table({
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] * mult for r in rows],
                               pa.timestamp(unit))})
            out = sessionize(rd.from_arrow(t), gap_s=1800.0).take_all()
            assert len(out) == 1
            assert out[0]["n_sessions"] == 2, unit
            assert out[0]["n_events"] == 3


class TestRangeJoinCount:
    def test_window_boundaries_inclusive(self, ray_session):
        """BETWEEN semantics: a view exactly at l.ts or exactly at
        l.ts - window counts; one microsecond outside does not."""
        import pandas as pd
        import pyarrow as pa
        import ray.data as rd
        from dggsray.ops.window import range_join_count

        w = 1_000_000      # 1s window
        base = pd.Timestamp("2024-01-01 12:00:00")
        us = pd.Timedelta(microseconds=1)
        rows = [
            # (event_id, user, ts, type)
            (1, 7, base, "click"),
            (2, 7, base, "view"),                 # at l.ts -> counts
            (3, 7, base - pd.Timedelta(seconds=1), "view"),   # at l.ts-w -> counts
            (4, 7, base - pd.Timedelta(seconds=1) - us, "view"),  # outside
            (5, 7, base + us, "view"),            # after l.ts -> outside
            (6, 8, base, "view"),                 # other user
            (7, 9, base, "click"),                # click with zero views
        ]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows], pa.string())})
        out = range_join_count(rd.from_arrow(t), "click", "view", w) \
            .to_pandas().set_index("event_id")
        assert out.loc[1, "n_matches"] == 2
        assert out.loc[7, "n_matches"] == 0
        assert len(out) == 2


class TestRunningTotal:
    def test_per_user_cumsum_with_ts_ties(self, ray_session):
        from dggsray.ops.window import running_total
        S = 1_000_000
        rows = [
            # user 1: tie on ts resolved by event_id
            (0, 1, 5 * S, "view"),
            (1, 1, 5 * S, "view"),
            (2, 1, 9 * S, "view"),
            # user 2: single event
            (3, 2, 1 * S, "view"),
        ]
        import pyarrow as pa
        import ray.data as rd
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([1.25, 2.50, 0.25, 7.00], pa.float64())})
        df = running_total(rd.from_arrow(t)).to_pandas() \
            .set_index("event_id").sort_index()
        assert df.loc[0, "running_cents"] == 125
        assert df.loc[1, "running_cents"] == 375   # tie ordered by event_id
        assert df.loc[2, "running_cents"] == 400
        assert df.loc[3, "running_cents"] == 700   # new user resets
