"""Round-4 continuation queries: TPC-H Q13 (outer-join-free order-count
histogram), Q15 (top supplier argmax chain), Q17 (exact-integer
small-quantity threshold).  Each test pins semantics against a direct
DuckDB computation on the same parquet at sf0.001, independent of the
oracle_sql strings."""
import duckdb

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("lineitem", "part", "orders", "customer", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


class TestCustomerOrderCountsQ13:
    def test_matches_left_outer_join(self, ray_session):
        from dggsray.pipelines.relational import customer_order_counts_q13
        out = customer_order_counts_q13(SF)
        con = _con()
        ref = con.sql(
            "WITH pc AS (SELECT c.c_custkey, COUNT(o.o_orderkey) cc "
            "FROM customer c LEFT OUTER JOIN orders o "
            "ON c.c_custkey = o.o_custkey GROUP BY 1) "
            "SELECT CAST(cc AS BIGINT) cc, COUNT(*) d FROM pc GROUP BY 1 "
            "ORDER BY d DESC, cc DESC").df()
        assert out.c_count.tolist() == ref.cc.tolist()
        assert out.custdist.tolist() == ref.d.tolist()

    def test_histogram_mass_equals_customer_count(self, ray_session):
        from dggsray.pipelines.relational import customer_order_counts_q13
        out = customer_order_counts_q13(SF)
        con = _con()
        n = con.sql("SELECT COUNT(*) n FROM customer").df().n[0]
        assert out.custdist.sum() == n


class TestTopSupplierQ15:
    def test_matches_duckdb_argmax(self, ray_session):
        from dggsray.pipelines.relational import top_supplier_q15
        out = top_supplier_q15(SF)
        con = _con()
        ref = con.sql(
            "WITH rev AS (SELECT l_suppkey k, "
            "SUM(CAST(round(l_extendedprice*100) AS BIGINT) "
            "* CAST(round((1-l_discount)*100) AS BIGINT)) r FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) "
            "SELECT k, r FROM rev WHERE r = (SELECT MAX(r) FROM rev) "
            "ORDER BY k").df()
        assert out.s_suppkey.tolist() == ref.k.tolist()
        assert out.total_revenue_e4.tolist() == ref.r.tolist()
        assert (out.s_name.str.len() > 0).all()

    def test_window_shift_changes_winner_set_consistently(self, ray_session):
        from dggsray.pipelines.relational import top_supplier_q15
        out = top_supplier_q15(SF, start="1997-01-01", end="1997-04-01")
        con = _con()
        ref = con.sql(
            "WITH rev AS (SELECT l_suppkey k, "
            "SUM(CAST(round(l_extendedprice*100) AS BIGINT) "
            "* CAST(round((1-l_discount)*100) AS BIGINT)) r FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY 1) "
            "SELECT k FROM rev WHERE r = (SELECT MAX(r) FROM rev) "
            "ORDER BY k").df()
        assert out.s_suppkey.tolist() == ref.k.tolist()


class TestSmallQuantityRevenueQ17:
    def test_matches_duckdb_exact_threshold(self, ray_session):
        from dggsray.pipelines.relational import small_quantity_revenue_q17
        out = small_quantity_revenue_q17(SF).to_pandas()
        con = _con()
        ref = con.sql(
            "WITH bl AS (SELECT l.l_partkey pk, "
            "CAST(round(l.l_quantity) AS BIGINT) q, "
            "CAST(round(l.l_extendedprice*100) AS BIGINT) c "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE p.p_brand = 'Brand#1'), "
            "agg AS (SELECT pk, SUM(q) sq, COUNT(*) n FROM bl GROUP BY 1) "
            "SELECT CAST(COALESCE(SUM(bl.c),0) AS BIGINT) t FROM bl "
            "JOIN agg ON bl.pk = agg.pk "
            "WHERE 5 * bl.q * agg.n < agg.sq").df()
        assert out.total_cents[0] == ref.t[0]
        assert out.avg_yearly_cents[0] == ref.t[0] // 7

    def test_unknown_brand_yields_zero(self, ray_session):
        from dggsray.pipelines.relational import small_quantity_revenue_q17
        out = small_quantity_revenue_q17(SF, brand="Brand#999").to_pandas()
        assert out.total_cents[0] == 0
