"""SQL frontend tests: parse + bind + execute against golden answers."""

import pytest

from duckdb_cubit_tpu.api import connect
from duckdb_cubit_tpu.sql.parser import parse
from duckdb_cubit_tpu.tpch import answers


@pytest.fixture(scope="module")
def conn():
    return connect(sf=0.01)


def test_parse_all_reference_queries():
    import glob

    files = sorted(glob.glob(
        "/root/reference/extension/tpch/dbgen/queries/q*.sql"))
    if not files:
        pytest.skip("reference queries not mounted")
    for f in files:
        parse(open(f).read())


def test_sql_q6_matches_golden(conn):
    rows = conn.sql("""
        SELECT sum(l_extendedprice * l_discount) AS revenue
        FROM lineitem
        WHERE l_shipdate >= CAST('1994-01-01' AS date)
          AND l_shipdate < CAST('1995-01-01' AS date)
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """).strings()
    assert not answers.compare(rows, 0.01, 6)


def test_sql_q1_matches_golden(conn):
    rows = conn.sql("""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               avg(l_quantity) AS avg_qty,
               avg(l_extendedprice) AS avg_price,
               avg(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= CAST('1998-09-02' AS date)
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """).strings()
    assert not answers.compare(rows, 0.01, 1)


def test_sql_join_aggregate(conn):
    # revenue per nation for one month, via SQL joins
    rows = conn.sql("""
        SELECT n_name, count(*) AS cnt
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND l_shipdate >= date '1994-01-01'
          AND l_shipdate < date '1994-02-01'
        GROUP BY n_name
        ORDER BY cnt DESC, n_name
        LIMIT 5
    """).strings()
    assert len(rows) == 5
    assert int(rows[0][1]) >= int(rows[1][1])


def test_sql_simple_select_limit(conn):
    rows = conn.sql(
        "SELECT n_name, n_regionkey FROM nation ORDER BY n_name LIMIT 3"
    ).strings()
    assert rows[0][0] == "ALGERIA"
    assert len(rows) == 3


def test_sql_scalar_subquery(conn):
    rows = conn.sql("""
        SELECT count(*) AS n FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """).strings()
    n = int(rows[0][0])
    total = int(conn.sql("SELECT count(*) AS n FROM orders").strings()[0][0])
    assert 0 < n < total


def test_sql_date_interval_fold(conn):
    a = conn.sql("SELECT count(*) AS n FROM orders "
                 "WHERE o_orderdate < date '1998-12-01' - interval '90' day"
                 ).strings()
    b = conn.sql("SELECT count(*) AS n FROM orders "
                 "WHERE o_orderdate < date '1998-09-02'").strings()
    assert a == b


def test_explain(conn):
    text = conn.explain("SELECT count(*) AS n FROM lineitem WHERE l_quantity < 10")
    assert "table_scan" in text and "group_aggregate" in text
