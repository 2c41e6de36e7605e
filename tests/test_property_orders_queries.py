"""End-to-end hypothesis fuzz for the orders-only oracled window
queries: generated orders with duplicate order dates (RANGE-frame
peers), tied totalprice values (rank/ntile tie handling), NULL-free
exact-quarter prices (the decimal-cast contract), tiny customer sets
(dense partitions), and 1995/1996 dates (union_by_name_drift's year
split). Same harness shape as the other generated-table fuzzes.
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

_dates = st.sampled_from(
    [
        datetime(1995, 3, 1),
        datetime(1995, 3, 1),  # duplicated on purpose → date ties
        datetime(1995, 3, 2),
        datetime(1995, 6, 15),
        datetime(1995, 12, 31),
        datetime(1996, 1, 1),
        datetime(1996, 7, 4),
    ]
)
_price = st.integers(min_value=0, max_value=4000).map(lambda v: v / 4)
_order = st.tuples(
    st.integers(min_value=0, max_value=3),  # o_custkey — dense partitions
    st.sampled_from(["O", "F", "P"]),
    _price,
    _dates,
    st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
)
_orders = st.lists(_order, min_size=2, max_size=14)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

QUERIES = [
    "window_rank_top_orders",
    "window_running_spend",
    "window_lag_lead_orders",
    "window_ntile_share",
    "window_distribution_funcs",
    "window_range_frame_spend",
    "union_by_name_drift",
    # r9 fuzz-coverage close-out (the two r8-new orders queries with no
    # generated-table row): tiny dense customer sets force tied
    # percentile edges / equal RFM tertiles, and duplicate spends force
    # rank ties the (neg_cents, custkey) order key must resolve
    # identically to the oracle's window
    "orders_rfm_segments",
    "orders_revenue_concentration",
]


def _run(spark, tmp_path, orders, query_name, dup_every=3):
    data = []
    for i, (cust, status, price, date, prio) in enumerate(orders):
        if i % dup_every == 0 and i > 0:
            price = data[i - 1][3]  # force exact price ties
        data.append((i, cust, status, price, date, prio))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "orders.parquet")
    )
    # minimal customer dimension for the join-bearing queries
    # (orders_revenue_concentration): covers the generated custkeys
    # 0..3 plus one customer with no orders (inner-join no-op) —
    # written for every query so the harness stays uniform
    spark.createDataFrame(
        [(k, seg) for k, seg in zip(range(5), ["BUILDING", "MACHINERY", "BUILDING", "AUTOMOBILE", "FURNITURE"])],
        "c_custkey long, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "customer.parquet")
    )
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    q = registry.QUERIES[query_name]
    return compare(query_name, q.fn(spark, sf_dir), con, q.oracle)


@settings(**_SETTINGS)
@given(orders=_orders)
@pytest.mark.parametrize("name", QUERIES)
def test_window_query_matches_oracle_on_generated_orders(
    spark, tmp_path, name, orders
):
    problems = _run(spark, tmp_path, orders, name)
    assert not problems, problems
