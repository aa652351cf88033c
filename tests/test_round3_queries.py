"""Round-3 queries (Q6 / Q3 / Q4, bigrams, duplicate spans, cell rollup,
cohort retention) pinned to DuckDB at sf0.001."""
import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("lineitem", "documents"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


class TestQ6:
    def test_matches_oracle_and_filters_rows(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["lineitem_q6_revenue"](SF).to_pandas()
        con = _con()
        o = con.sql(E.oracle_sql()["lineitem_q6_revenue"]).df()
        assert len(df) == 1
        assert int(df.revenue_cents.iloc[0]) == int(o.revenue_cents.iloc[0])
        assert int(df.n_rows.iloc[0]) == int(o.n_rows.iloc[0])
        assert 0 < int(df.n_rows.iloc[0])           # predicate selects rows
        total = con.sql("SELECT COUNT(*) n FROM lineitem").df().n.iloc[0]
        assert int(df.n_rows.iloc[0]) < int(total)  # ...but not all of them


class TestCellRollup:
    def test_hierarchy_consistency_and_oracle(self, ray_session):
        """Every level carries the same grand totals, and each parent's
        total equals the sum of its children (prefix relation)."""
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["cell_rollup_customer"](SF).to_pandas()
        by = df.groupby("res")[["bal_cents", "n_customers"]].sum()
        assert (by.nunique() == 1).all()             # conserved per level
        for r in sorted(df.res.unique())[:-1]:
            child = df[df.res == r + 1].copy()
            child["parent"] = child.cell.str[: r + 1]
            agg = child.groupby("parent")[["bal_cents", "n_customers"]] \
                .sum().sort_index()
            parent = df[df.res == r].set_index("cell") \
                [["bal_cents", "n_customers"]].sort_index()
            assert agg.equals(parent), f"res {r+1} -> {r}"
        con = _con2()
        o = con.sql(E.oracle_sql()["cell_rollup_customer"]).df()
        cols = sorted(df.columns)
        a = df[cols].sort_values(cols).reset_index(drop=True)
        b = o[cols].sort_values(cols).reset_index(drop=True) \
            .astype(a.dtypes.to_dict())
        assert a.equals(b)


class TestShippingPriorityQ3:
    def test_matches_oracle_topk_semantics(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["shipping_priority_q3"](SF).to_pandas()
        con = duckdb.connect()
        for t in ("customer", "orders", "lineitem"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
        o = con.sql(E.oracle_sql()["shipping_priority_q3"]).df()
        cols = ["o_orderkey", "revenue_cents", "o_orderdate_us"]
        a = df[cols].reset_index(drop=True)
        b = o[cols].reset_index(drop=True).astype(a.dtypes.to_dict())
        assert a.equals(b)                        # ORDER matters: top-k
        assert len(a) == 10
        assert (a.revenue_cents.diff().dropna() <= 0).all()


class TestCohortRetention:
    def test_matches_oracle_and_retention_shape(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["events_cohort_retention"](SF).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
        o = con.sql(E.oracle_sql()["events_cohort_retention"]).df()
        cols = sorted(df.columns)
        a = df[cols].sort_values(cols).reset_index(drop=True)
        b = o[cols].sort_values(cols).reset_index(drop=True) \
            .astype(a.dtypes.to_dict())
        assert a.equals(b)
        # every cohort has an offset-0 row (first-week activity defines it)
        # and no later offset can exceed the cohort's own size
        for cw, g in df.groupby("cohort_week_us"):
            g = g.set_index("week_offset").n_users
            assert 0 in g.index
            assert (g <= g.loc[0]).all()


class TestOrdersDelayed:
    def test_matches_oracle_exists_semantics(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["orders_delayed_by_priority"](SF).to_pandas()
        con = duckdb.connect()
        for t in ("orders", "lineitem"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
        o = con.sql(E.oracle_sql()["orders_delayed_by_priority"]).df()
        cols = sorted(df.columns)
        a = df[cols].sort_values(cols).reset_index(drop=True)
        b = o[cols].sort_values(cols).reset_index(drop=True) \
            .astype(a.dtypes.to_dict())
        assert a.equals(b)
        assert a.order_count.sum() > 0


def _con2():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM "
            f"read_parquet('{SF}/customer.parquet')")
    return con


class TestDuplicateSpans:
    def test_planted_shared_span(self, ray_session, tmp_path):
        """Two docs share one 8-token run; a third is clean — only the
        sharers report dup windows, and exactly one distinct window each."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        from dggsray.pipelines.relational import docs_duplicate_spans
        span = "the quick brown fox jumps over the lazy"
        texts = [f"alpha beta {span} gamma delta",
                 f"one two three {span} four five",
                 "totally different words with no shared run at all here"]
        sf = tmp_path / "sf0.5"
        sf.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts)}), sf / "documents.parquet")
        df = docs_duplicate_spans(str(sf)).to_pandas() \
            .set_index("doc_id").sort_index()
        assert (df.loc[[0, 1], "n_dup_windows"] == 1).all()
        assert df.loc[2, "n_dup_windows"] == 0
        # windows per doc: n_tokens - 7 distinct windows (all unique here)
        n_tok = [len(t.split()) for t in texts]
        assert (df.n_windows.to_numpy() ==
                np.array(n_tok) - 7).all()

    def test_matches_oracle(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["docs_duplicate_spans"](SF).to_pandas()
        con = _con()
        o = con.sql(E.oracle_sql()["docs_duplicate_spans"]).df()
        cols = ["doc_id", "n_windows", "n_dup_windows"]
        a = df[cols].sort_values("doc_id").reset_index(drop=True)
        b = o[cols].sort_values("doc_id").reset_index(drop=True) \
            .astype(a.dtypes.to_dict())
        assert a.equals(b)
        assert (a.n_dup_windows > 0).any()          # corpus carries signal


class TestBigramTopk:
    def test_matches_oracle(self, ray_session):
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        df = E.queries()["docs_bigram_topk"](SF).to_pandas() \
            .reset_index(drop=True)
        con = _con()
        o = con.sql(E.oracle_sql()["docs_bigram_topk"]).df()
        assert df[["bigram", "n"]].values.tolist() == \
            o[["bigram", "n"]].values.tolist()
        assert len(df) == 30 and (df.n >= 2).all()
        assert df.bigram.str.contains(" ").all()
