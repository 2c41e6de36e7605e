"""End-to-end hypothesis fuzz for the relational (TPC-H-shaped) oracled
queries over GENERATED customer/orders/lineitem tables: exact predicate
boundaries the fixture generator rarely lands on (q6's discount 0.05 /
0.07 and quantity 24, q4's +60-day ship cutoff, q1's 1998-09-02 scan
bound, q3's 1998-03-15 split), duplicate dates (RANGE peers), tied
prices, empty-filter results, and customers with zero orders (left/
anti join shapes). The decimal-cast and unique-tiebreaker conventions
are supposed to make all of this engine-agnostic — this suite is the
standing proof, the relational sibling of the corpus/events/vector
fuzzes.
"""

from __future__ import annotations

import os
from datetime import datetime

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rag_lakehouse_spark.plans import registry
from tests.oracle_harness import compare

registry._load_all()

# Order dates straddle q3's 1998-03-15 split and include exact
# duplicates (RANGE peers); 1997 dates feed q6's year filter.
_ORDER_DATES = [
    datetime(1995, 3, 1),
    datetime(1997, 1, 1),
    datetime(1997, 6, 15),
    datetime(1998, 3, 14),
    datetime(1998, 3, 15),
    datetime(1998, 3, 15),  # duplicated on purpose
    datetime(1998, 3, 16),
]
# Ship dates: q1's 1998-09-02 bound (inclusive) ± 1 day, q3's split
# boundary, q4's +60-day cutoff relative to the 1998-03-15 order date
# (1998-05-14 is exactly +60 — equality must NOT count as late).
_SHIP_DATES = [
    datetime(1997, 2, 1),
    datetime(1997, 12, 31),
    datetime(1998, 3, 15),
    datetime(1998, 3, 16),
    datetime(1998, 5, 14),
    datetime(1998, 5, 15),
    datetime(1998, 9, 2),
    datetime(1998, 9, 3),
]

_price = st.integers(min_value=0, max_value=4000).map(lambda v: v / 4)
_order = st.tuples(
    st.integers(min_value=0, max_value=3),            # o_custkey (cust 3 often idle)
    st.sampled_from(["O", "F", "P"]),
    _price,
    st.sampled_from(_ORDER_DATES),
    st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
)
_line = st.tuples(
    st.integers(min_value=0, max_value=13),           # order index (mod |orders|)
    st.sampled_from([1.0, 23.0, 24.0, 25.0, 50.0]),   # q6 boundary 24, q18 sums
    _price,                                           # l_extendedprice
    st.sampled_from([0.04, 0.05, 0.06, 0.07, 0.08]),  # q6 boundaries 0.05/0.07
    st.sampled_from(["R", "N", "A"]),
    st.sampled_from(["O", "F"]),
    st.sampled_from(_SHIP_DATES),
)
_tables = st.tuples(
    st.lists(_order, min_size=2, max_size=10),
    st.lists(_line, min_size=2, max_size=16),
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

QUERIES = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q4_late_order_priority",
    "q18_large_orders",
    "q13_order_count_distribution",
    "join_left_order_counts",
    "orders_monthly_trend",
    "topk_orders",
    "agg_global_stats",
    "math_scalar_funcs",
    "filter_predicates",
    "minby_maxby_agg",
    "date_scalar_funcs",
    "date_interval_arithmetic",
    # r8: basket affinity — l_partkey = j % 4 makes real co-occurring
    # pairs AND duplicate (order, part) rows, exercising the DISTINCT
    # support contract and the >=3 threshold boundary
    "orders_basket_affinity",
    # ship latency: generated ship dates BEFORE order dates give
    # negative latencies; the 90-day SLA boundary dates sit exactly
    # on the strict > gate
    "orders_ship_latency_profile",
]

_CUSTOMERS = [
    (0, "cust0", 0, 100.25, "BUILDING"),
    (1, "cust1", 1, -5.5, "MACHINERY"),
    (2, "cust2", 2, 0.0, "BUILDING"),
    (3, "cust3", 0, 9999.75, "MACHINERY"),
]


def _run(spark, tmp_path, tables, query_name, dup_every=3):
    orders_in, lines_in = tables
    orders = []
    for i, (cust, status, price, date, prio) in enumerate(orders_in):
        if i % dup_every == 0 and i > 0:
            price = orders[i - 1][3]  # force exact price ties
        orders.append((i, cust, status, price, date, prio))
    lines = []
    for j, (oidx, qty, price, disc, rflag, lstat, ship) in enumerate(lines_in):
        okey = orders[oidx % len(orders)][0]
        lines.append((okey, j % 4, j, j + 1, qty, price, disc, 0.05, rflag, lstat, ship))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        _CUSTOMERS,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "customer.parquet")
    )
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "orders.parquet")
    )
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "lineitem.parquet")
    )
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    q = registry.QUERIES[query_name]
    return compare(query_name, q.fn(spark, sf_dir), con, q.oracle)


@settings(**_SETTINGS)
@given(tables=_tables)
@pytest.mark.parametrize("name", QUERIES)
def test_relational_query_matches_oracle_on_generated_tables(
    spark, tmp_path, name, tables
):
    problems = _run(spark, tmp_path, tables, name)
    assert not problems, problems
