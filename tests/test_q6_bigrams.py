"""lineitem_q6_revenue (scan-prune-aggregate) and docs_bigram_topk
(collocation counts) pinned to DuckDB at sf0.001."""
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
