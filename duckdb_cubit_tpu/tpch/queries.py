"""The 22 TPC-H queries as physical plan builders.

Each builder mirrors the SQL under reference extension/tpch/dbgen/queries/
(q01.sql .. q22.sql); golden answers under extension/tpch/dbgen/answers/ are
the correctness oracle (SURVEY.md §4.2).  Plans are built against the engine
DSL and then run through the optimizer, which resolves filter pushdown and
CUBIT index matching.
"""

from __future__ import annotations

from ..ops.expressions import Case, Col, Lit, date_lit, dec_lit
from ..plan.physical import (Aggregate, Filter, GroupAggregate, HashJoin,
                             Limit, OrderBy, Project, TableScan)


def col(n):
    return Col(n)


def q1():
    scan = TableScan(
        "lineitem",
        filters=[col("l_shipdate") <= date_lit("1998-09-02")],
        projection=["l_returnflag", "l_linestatus", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax"],
    )
    disc_price = col("l_extendedprice") * (dec_lit(1) - col("l_discount"))
    charge = disc_price * (dec_lit(1) + col("l_tax"))
    agg = GroupAggregate(scan, ["l_returnflag", "l_linestatus"], [
        Aggregate("sum", col("l_quantity"), "sum_qty"),
        Aggregate("sum", col("l_extendedprice"), "sum_base_price"),
        Aggregate("sum", disc_price, "sum_disc_price"),
        Aggregate("sum", charge, "sum_charge"),
        Aggregate("avg", col("l_quantity"), "avg_qty"),
        Aggregate("avg", col("l_extendedprice"), "avg_price"),
        Aggregate("avg", col("l_discount"), "avg_disc"),
        Aggregate("count", None, "count_order"),
    ])
    return OrderBy(agg, [("l_returnflag", False), ("l_linestatus", False)])


def q6():
    scan = TableScan(
        "lineitem",
        filters=[
            col("l_shipdate") >= date_lit("1994-01-01"),
            col("l_shipdate") < date_lit("1995-01-01"),
            col("l_discount").between(dec_lit("0.05"), dec_lit("0.07")),
            col("l_quantity") < dec_lit(24),
        ],
        projection=["l_extendedprice", "l_discount"],
    )
    return GroupAggregate(scan, [], [
        Aggregate("sum", col("l_extendedprice") * col("l_discount"), "revenue"),
    ])


def _disc_price():
    return Col("l_extendedprice") * (dec_lit(1) - Col("l_discount"))


def q3():
    cust = TableScan("customer",
                     filters=[col("c_mktsegment") == "BUILDING"],
                     projection=["c_custkey"])
    orders = TableScan(
        "orders",
        filters=[col("o_orderdate") < date_lit("1995-03-15")],
        projection=["o_orderkey", "o_orderdate", "o_shippriority", "o_custkey"])
    orders_f = HashJoin(orders, cust, ["o_custkey"], ["c_custkey"], "semi")
    li = TableScan(
        "lineitem",
        filters=[col("l_shipdate") > date_lit("1995-03-15")],
        projection=["l_orderkey", "l_extendedprice", "l_discount"])
    j = HashJoin(li, orders_f, ["l_orderkey"], ["o_orderkey"])
    agg = GroupAggregate(j, ["l_orderkey"],
                         [Aggregate("sum", _disc_price(), "revenue")],
                         carry=["o_orderdate", "o_shippriority"])
    srt = OrderBy(agg, [("revenue", True), ("o_orderdate", False)], limit=10)
    return Project(srt, {"l_orderkey": "l_orderkey", "revenue": "revenue",
                         "o_orderdate": "o_orderdate",
                         "o_shippriority": "o_shippriority"})


def q5():
    li = TableScan("lineitem", projection=[
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    orders = TableScan(
        "orders",
        filters=[col("o_orderdate") >= date_lit("1994-01-01"),
                 col("o_orderdate") < date_lit("1995-01-01")],
        projection=["o_orderkey", "o_custkey"])
    j1 = HashJoin(li, orders, ["l_orderkey"], ["o_orderkey"])
    cust = TableScan("customer", projection=["c_custkey", "c_nationkey"])
    j2 = HashJoin(j1, cust, ["o_custkey"], ["c_custkey"])
    supp = TableScan("supplier", projection=["s_suppkey", "s_nationkey"])
    j3 = HashJoin(j2, supp, ["l_suppkey"], ["s_suppkey"])
    f = Filter(j3, col("c_nationkey") == col("s_nationkey"))
    region = TableScan("region", filters=[col("r_name") == "ASIA"],
                       projection=["r_regionkey"])
    nation = TableScan("nation",
                       projection=["n_nationkey", "n_name", "n_regionkey"])
    nation_f = HashJoin(nation, region, ["n_regionkey"], ["r_regionkey"],
                        "semi")
    j4 = HashJoin(f, nation_f, ["s_nationkey"], ["n_nationkey"])
    agg = GroupAggregate(j4, ["n_name"],
                         [Aggregate("sum", _disc_price(), "revenue")])
    srt = OrderBy(agg, [("revenue", True)])
    return Project(srt, {"n_name": "n_name", "revenue": "revenue"})


def q10():
    li = TableScan("lineitem", filters=[col("l_returnflag") == "R"],
                   projection=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = TableScan(
        "orders",
        filters=[col("o_orderdate") >= date_lit("1993-10-01"),
                 col("o_orderdate") < date_lit("1994-01-01")],
        projection=["o_orderkey", "o_custkey"])
    j1 = HashJoin(li, orders, ["l_orderkey"], ["o_orderkey"])
    cust = TableScan("customer", projection=[
        "c_custkey", "c_name", "c_acctbal", "c_address", "c_phone",
        "c_comment", "c_nationkey"])
    j2 = HashJoin(j1, cust, ["o_custkey"], ["c_custkey"])
    nation = TableScan("nation", projection=["n_nationkey", "n_name"])
    j3 = HashJoin(j2, nation, ["c_nationkey"], ["n_nationkey"])
    agg = GroupAggregate(
        j3, ["c_custkey"], [Aggregate("sum", _disc_price(), "revenue")],
        carry=["c_name", "c_acctbal", "c_phone", "n_name", "c_address",
               "c_comment"])
    srt = OrderBy(agg, [("revenue", True), ("c_custkey", False)], limit=20)
    return Project(srt, {
        "c_custkey": "c_custkey", "c_name": "c_name", "revenue": "revenue",
        "c_acctbal": "c_acctbal", "n_name": "n_name",
        "c_address": "c_address", "c_phone": "c_phone",
        "c_comment": "c_comment"})


def q12():
    li = TableScan(
        "lineitem",
        filters=[
            col("l_shipmode").isin(["MAIL", "SHIP"]),
            col("l_commitdate") < col("l_receiptdate"),
            col("l_shipdate") < col("l_commitdate"),
            col("l_receiptdate") >= date_lit("1994-01-01"),
            col("l_receiptdate") < date_lit("1995-01-01"),
        ],
        projection=["l_orderkey", "l_shipmode"])
    orders = TableScan("orders", projection=["o_orderkey", "o_orderpriority"])
    j = HashJoin(li, orders, ["l_orderkey"], ["o_orderkey"])
    high = Case(col("o_orderpriority").isin(["1-URGENT", "2-HIGH"]),
                Lit(1), Lit(0))
    low = Case(col("o_orderpriority").isin(["1-URGENT", "2-HIGH"]),
               Lit(0), Lit(1))
    agg = GroupAggregate(j, ["l_shipmode"], [
        Aggregate("sum", high, "high_line_count"),
        Aggregate("sum", low, "low_line_count")])
    srt = OrderBy(agg, [("l_shipmode", False)])
    return Project(srt, {"l_shipmode": "l_shipmode",
                         "high_line_count": "high_line_count",
                         "low_line_count": "low_line_count"})


def q14():
    li = TableScan(
        "lineitem",
        filters=[col("l_shipdate") >= date_lit("1995-09-01"),
                 col("l_shipdate") < date_lit("1995-10-01")],
        projection=["l_partkey", "l_extendedprice", "l_discount"])
    part = TableScan("part", projection=["p_partkey", "p_type"])
    j = HashJoin(li, part, ["l_partkey"], ["p_partkey"])
    promo = Case(col("p_type").like("PROMO%"), _disc_price(), dec_lit(0, 4))
    agg = GroupAggregate(j, [], [
        Aggregate("sum", promo, "promo"),
        Aggregate("sum", _disc_price(), "total")])
    return Project(agg, {
        "promo_revenue": (dec_lit("100.00") * col("promo")).cast_double()
        / col("total")})


def q19():
    li = TableScan("lineitem", projection=[
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount",
        "l_shipinstruct", "l_shipmode"])
    part = TableScan("part", projection=[
        "p_partkey", "p_brand", "p_container", "p_size"])
    j = HashJoin(li, part, ["l_partkey"], ["p_partkey"])

    def clause(brand, containers, qlo, qhi, smax):
        return ((col("p_brand") == brand)
                & col("p_container").isin(containers)
                & (col("l_quantity") >= dec_lit(qlo))
                & (col("l_quantity") <= dec_lit(qhi))
                & col("p_size").between(Lit(1), Lit(smax))
                & col("l_shipmode").isin(["AIR", "AIR REG"])
                & (col("l_shipinstruct") == "DELIVER IN PERSON"))

    f = Filter(j, clause("Brand#12", ["SM CASE", "SM BOX", "SM PACK",
                                      "SM PKG"], 1, 11, 5)
               | clause("Brand#23", ["MED BAG", "MED BOX", "MED PKG",
                                     "MED PACK"], 10, 20, 10)
               | clause("Brand#34", ["LG CASE", "LG BOX", "LG PACK",
                                     "LG PKG"], 20, 30, 15))
    agg = GroupAggregate(f, [], [Aggregate("sum", _disc_price(), "revenue")])
    return Project(agg, {"revenue": "revenue"})


QUERIES = {1: q1, 3: q3, 5: q5, 6: q6, 10: q10, 12: q12, 14: q14, 19: q19}


def get_query(n: int):
    if n not in QUERIES:
        raise NotImplementedError(f"TPC-H Q{n} not implemented yet")
    return QUERIES[n]()
