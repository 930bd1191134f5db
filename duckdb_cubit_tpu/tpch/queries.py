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


QUERIES = {1: q1, 6: q6}


def get_query(n: int):
    if n not in QUERIES:
        raise NotImplementedError(f"TPC-H Q{n} not implemented yet")
    return QUERIES[n]()
