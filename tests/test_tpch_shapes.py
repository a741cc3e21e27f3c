"""Edge-semantics + plan tests for the TPC-H-shaped analytical queries
(Q4/Q10/Q13/Q14/Q15/Q17/Q18/Q19/Q22 adaptations in operators/analytics.py).

The oracle gate proves fixture-scale equality with DuckDB; these pin the
semantics the oracle could silently agree on for the wrong reason
(EXISTS counting an order twice, ties at the max, zero buckets) and the
plan shapes that matter at 100 TB (broadcast-hash under a disjunction,
top-k without a global sort).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from cloudtrace_exporter_spark.operators import analytics

import __spark_entry__ as entry_mod


def _d(y, m, d):
    return datetime(y, m, d)


@pytest.fixture(scope="module")
def tiny(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, _d(1996, 2, 1), "1-URGENT"),
            (2, 10, "O", 200.0, _d(1996, 3, 1), "5-LOW"),
            (3, 20, "O", 300.0, _d(1996, 4, 1), "5-LOW"),
            (4, 30, "O", 400.0, _d(1999, 1, 1), "1-URGENT"),  # outside window
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            # order 1: TWO late lines -> must count once
            (1, 1, 1, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", _d(1996, 6, 1)),
            (1, 2, 1, 2, 5.0, 10.0, 0.0, 0.0, "N", "O", _d(1996, 7, 1)),
            # order 2: on-time only
            (2, 1, 2, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", _d(1996, 3, 10)),
            # order 3: one late line
            (3, 2, 2, 1, 5.0, 10.0, 0.0, 0.0, "R", "O", _d(1996, 8, 1)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    customer = spark.createDataFrame(
        [
            (10, "alice", 1, 500.0, "BUILDING"),
            (20, "bob", 1, 900.0, "AUTOMOBILE"),
            (30, "carol", 2, 900.0, "BUILDING"),
            (40, "dave", 2, -10.0, "BUILDING"),  # negative balance, no orders
        ],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    return {"orders": orders, "lineitem": lineitem, "customer": customer}


def test_order_priority_counts_each_order_once(tiny):
    out = analytics.order_priority_check(
        tiny["orders"], tiny["lineitem"], start="1996-01-01", end="1997-01-01", late_days=60
    ).collect()
    got = {r["o_orderpriority"]: r["order_count"] for r in out}
    # order 1 (urgent) has two >60d-late lines but counts once; order 3 (low) once
    assert got == {"1-URGENT": 1, "5-LOW": 1}


def test_customer_distribution_has_zero_bucket(tiny):
    out = analytics.customer_order_distribution(tiny["customer"], tiny["orders"]).collect()
    got = {r["c_count"]: r["custdist"] for r in out}
    # alice 2 orders, bob 1, carol 1 (1999 order still hers), dave 0
    assert got == {2: 1, 1: 2, 0: 1}


def test_top_supplier_keeps_all_tied_maxima(spark, tiny):
    supplier = spark.createDataFrame(
        [(1, "s1", 1, 0.0), (2, "s2", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    # within window suppliers 1 and 2 both have revenue 20.0 (two 10.0 lines each at disc 0)
    out = analytics.top_supplier(
        tiny["lineitem"], supplier, start="1996-01-01", end="1997-01-01"
    ).collect()
    assert [r["s_suppkey"] for r in out] == [1, 2]
    assert all(r["total_revenue"] == 20.0 for r in out)


def test_rich_inactive_excludes_urgent_customers(tiny):
    out = analytics.rich_inactive_customers(tiny["customer"], tiny["orders"]).collect()
    # avg positive balance = (500+900+900)/3 = 766.67; rich = bob, carol.
    # carol has an URGENT order (order 4) -> excluded; bob only 5-LOW -> kept.
    got = {r["c_mktsegment"]: (r["numcust"], r["totacctbal"]) for r in out}
    assert got == {"AUTOMOBILE": (1, 900.0)}


def test_small_quantity_revenue_uses_per_part_average(spark):
    part = spark.createDataFrame(
        [(1, "p1", "Brand#1", "PROMO", 5, 1.0), (2, "p2", "Brand#2", "PROMO", 5, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    lineitem = spark.createDataFrame(
        [
            # part 1 quantities: 1, 10, 10 -> avg 7 -> threshold 3.5 -> only qty=1 row kept
            (1, 1, 1, 1, 1.0, 70.0, 0.0, 0.0, "N", "O", _d(1996, 1, 1)),
            (2, 1, 1, 1, 10.0, 99.0, 0.0, 0.0, "N", "O", _d(1996, 1, 1)),
            (3, 1, 1, 1, 10.0, 99.0, 0.0, 0.0, "N", "O", _d(1996, 1, 1)),
            # part 2 is Brand#2 -> ignored entirely
            (4, 2, 1, 1, 1.0, 99.0, 0.0, 0.0, "N", "O", _d(1996, 1, 1)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    out = analytics.small_quantity_revenue(lineitem, part, brand="Brand#1").collect()
    assert out[0]["avg_yearly"] == 10.0  # 70.0 / 7


def test_disjunctive_join_stays_broadcast_hash(spark, sf_dir):
    df = entry_mod.queries()["q_disjunctive_join"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_large_orders_topk_is_take_ordered(spark, sf_dir):
    df = entry_mod.queries()["q_large_orders"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p


def test_returned_items_pushes_returnflag_to_scan(spark, sf_dir):
    df = entry_mod.queries()["q_returned_items"](spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in p and "l_returnflag" in p
