"""TPC-H Q5 (local supplier volume, same-nation customer+supplier within a
region) and Q9 variant (product profit by supplier nation x order year —
no partsupp table in this schema, so profit = discounted revenue).  Each
test pins semantics against a direct DuckDB computation on the same
parquet at sf0.001, independent of the oracle_sql strings."""
import duckdb

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier",
              "nation", "region", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


REV = ("CAST(round(l_extendedprice * 100) AS BIGINT) "
       "* CAST(round((1 - l_discount) * 100) AS BIGINT)")


class TestLocalSupplierVolumeQ5:
    def test_matches_duckdb(self, ray_session):
        from dggsray.pipelines.relational import local_supplier_volume_q5
        out = local_supplier_volume_q5(SF, region=1, year=1996)
        con = _con()
        ref = con.sql(
            f"SELECT CAST(n_nationkey AS BIGINT) nk, n_name, "
            f"CAST(SUM({REV}) AS BIGINT) rev "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "AND c.c_nationkey = s.s_nationkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "WHERE n_regionkey = 1 AND year(o.o_orderdate) = 1996 "
            "GROUP BY 1, 2 ORDER BY rev DESC, nk ASC").df()
        assert out.n_nationkey.tolist() == ref.nk.tolist()
        assert out.n_name.tolist() == ref.n_name.tolist()
        assert out.revenue_e4.tolist() == ref.rev.tolist()

    def test_only_region_nations(self, ray_session):
        from dggsray.pipelines.relational import local_supplier_volume_q5
        out = local_supplier_volume_q5(SF, region=2, year=1997)
        con = _con()
        in_region = set(con.sql(
            "SELECT CAST(n_nationkey AS BIGINT) FROM nation "
            "WHERE n_regionkey = 2").df().iloc[:, 0])
        assert set(out.n_nationkey) <= in_region
        assert (out.revenue_e4 > 0).all()

    def test_local_is_subset_of_regional_revenue(self, ray_session):
        # Same-nation revenue can never exceed the region's revenue with
        # the nation constraint dropped (an independent upper bound).
        from dggsray.pipelines.relational import local_supplier_volume_q5
        out = local_supplier_volume_q5(SF, region=1, year=1996)
        con = _con()
        cap = con.sql(
            f"SELECT CAST(SUM({REV}) AS BIGINT) FROM customer c "
            "JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "WHERE n_regionkey = 1 AND year(o.o_orderdate) = 1996") \
            .fetchone()[0]
        assert out.revenue_e4.sum() <= cap


class TestProductProfitQ9:
    def test_matches_duckdb(self, ray_session):
        from dggsray.pipelines.relational import product_profit_q9
        out = product_profit_q9(SF, name_sub="widget")
        con = _con()
        ref = con.sql(
            f"SELECT n_name, CAST(year(o_orderdate) AS BIGINT) y, "
            f"CAST(SUM({REV}) AS BIGINT) p "
            "FROM lineitem l JOIN part pt ON l.l_partkey = pt.p_partkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "WHERE pt.p_name LIKE '%widget%' "
            "GROUP BY 1, 2 ORDER BY n_name ASC, y DESC").df()
        assert out.n_name.tolist() == ref.n_name.tolist()
        assert out.o_year.tolist() == ref.y.tolist()
        assert out.profit_e4.tolist() == ref.p.tolist()

    def test_substring_partition_covers_total(self, ray_session):
        # 'widget' profit + 'bolt' profit + ... over a disjoint name
        # partition must equal the unfiltered total (names are
        # '<adjective> <noun>' so noun substrings partition the table).
        from dggsray.pipelines.relational import product_profit_q9
        con = _con()
        nouns = con.sql(
            "SELECT DISTINCT split_part(p_name, ' ', 2) FROM part").df() \
            .iloc[:, 0].tolist()
        total = con.sql(
            f"SELECT CAST(SUM({REV}) AS BIGINT) FROM lineitem") \
            .fetchone()[0]
        got = sum(product_profit_q9(SF, name_sub=n).profit_e4.sum()
                  for n in nouns)
        assert got == total


class TestShippingLatencyQ12:
    def test_matches_duckdb(self, ray_session):
        from dggsray.pipelines.relational import shipping_latency_q12
        out = shipping_latency_q12(SF)
        con = _con()
        ref = con.sql(
            "WITH d AS (SELECT date_diff('day', CAST(o_orderdate AS DATE), "
            "CAST(l_shipdate AS DATE)) AS days, "
            "o_orderpriority IN ('1-URGENT', '2-HIGH') AS hi "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) "
            "SELECT CASE WHEN days < 0 THEN 'early' WHEN days < 30 THEN "
            "'0-29d' WHEN days < 90 THEN '30-89d' ELSE '90d+' END b, "
            "SUM(CASE WHEN hi THEN 1 ELSE 0 END) h, "
            "SUM(CASE WHEN hi THEN 0 ELSE 1 END) lo "
            "FROM d GROUP BY 1 ORDER BY 1").df()
        assert out.latency_bucket.tolist() == ref.b.tolist()
        assert out.high_line_count.tolist() == ref.h.tolist()
        assert out.low_line_count.tolist() == ref.lo.tolist()

    def test_mass_equals_lineitem_count(self, ray_session):
        from dggsray.pipelines.relational import shipping_latency_q12
        out = shipping_latency_q12(SF)
        con = _con()
        n = con.sql("SELECT COUNT(*) FROM lineitem").fetchone()[0]
        assert (out.high_line_count + out.low_line_count).sum() == n
