"""End-to-end hypothesis fuzz for the events-only oracled queries:
generate an events table stressing the shapes the fixture generator
never emits — exact hour/window boundary instants, same-instant ties
within and across users, NULL users/values/props, malformed JSON —
write it as parquet, and demand the registered Spark plan and its
DuckDB oracle agree exactly. (Same harness shape as
tests/test_property_corpus_queries.py.)

Values are exact quarters (k/4) so the decimal-cast exactness contract
of the oracles holds by construction, and timestamps are whole
microseconds (the loader/oracle precision contract).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rag_lakehouse_spark.plans import registry
from tests.oracle_harness import compare

registry._load_all()

_BASE = datetime(2024, 3, 1, 0, 0, 0, tzinfo=timezone.utc)

# offsets in seconds from _BASE: exact hour marks, one-microsecond
# neighbours, session-gap edges (sessionize uses 30-min gaps), ties
_offsets = st.one_of(
    st.sampled_from(
        [0, 1, 3599, 3600, 3601, 7200, 1799, 1800, 1801, 5400, 86399]
    ),
    st.integers(min_value=0, max_value=2 * 86400),
)
_event_type = st.sampled_from(["click", "view", "purchase", "scroll", "error"])
_props = st.sampled_from(
    [
        None,
        "{}",
        '{"page": "home", "ms": 12}',
        '{"page": "cart", "ms": 7, "ref": "ad"}',
        "not json",
        '{"nested": {"a": 1}}',
    ]
)
_event = st.tuples(
    _offsets,
    st.one_of(st.none(), st.integers(min_value=0, max_value=2)),  # user_id
    _event_type,
    # up to ±250 in exact quarters: the >200 incident-window predicates
    # (events_interval_overlap_join) must actually fire under fuzz
    st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000).map(lambda v: v / 4)),
    _props,
)
_events = st.lists(_event, min_size=1, max_size=12)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# map_funcs_events / variant_json_events are deliberately NOT fuzzed:
# their oracles are fixture-CONTRACT oracles (the docstrings say so —
# they state the expected values directly, derivable only under the
# fixture's props invariants, because DuckDB has no map/variant types
# to recompute them generally). Fuzzing them would test the fixture
# contract, not cross-engine semantics.
QUERIES = [
    "events_tumbling_hourly",
    "events_sessionize",
    "events_dedup_first",
    "events_user_activity",
    "events_hour_profile",
    "events_json_props",
    "window_ignore_nulls_nav",
    "events_sliding_windows",
    # gap-fill: generated NULL values produce observed-but-NULL hourly
    # sums (n>0, v NULL), the exact edge the value-based fill contract
    # defines as a gap; single-event tables exercise the no-prev/no-next
    # envelope NULLs
    "events_gapfill_interpolate",
    # interval-overlap: generated boundary instants create touching
    # endpoints (half-open: excluded) and identical windows
    "events_interval_overlap_join",
    # lag features: generated sparse series stress the partial-window
    # head (lag NULLs, window_rows < 24) and same-instant hour ties
    "events_lag_features",
    # anomaly days: tiny generated tables make N=1 groups (variance 0,
    # strict > keeps the single day non-anomalous) and exact-tie days
    "events_anomaly_days",
    # r8 monitoring folds: generated sparse/tied days exercise the
    # day-sorted integer recurrences (EWMA shift fold, CUSUM max fold)
    # with single-day series and same-day multi-type ties
    "events_ewma_daily",
    "events_cusum_changepoints",
    # OLS trend: N=1 series hit the zero-denominator guard (NULL slope
    # on both engines); tied day indexes across types
    "events_daily_trend",
    # retention: one-event users, NULL users dropped, same-week
    # multi-activity collapses via the distinct (user, week) pair
    "events_retention_cohorts",
    # Holt: two-variable integer recurrence (struct fold vs recursive
    # CTE); declining generated series push the trend negative — the
    # arithmetic-shift floor semantics must agree on negatives
    "events_holt_forecast",
    # rolling distinct: multi-day windows over sparse generated days
    # (window clipped at maxd), NULL users dropped, same-day dups
    "events_active_users_rolling",
    # inter-arrival: same-instant ties (gap 0) hit the unique
    # tiebreaker; single-event users produce no gaps on both engines
    "events_inter_arrival_stats",
    # Wilson bound: all-error and zero-error generated days hit the
    # p=1/p=0 envelope of the fixed-literal formula
    "events_error_rate_daily",
    # cohort churn: tiny generated ranges make everyone recent
    # (0 churn) and single-user cohorts; the 14-day strict > boundary
    "events_cohort_churn",
    # r11 portable HLL: ≤3 distinct users always land in the
    # linear-counting branch with near-empty register sets; NULL users
    # are excluded on both engines; duplicate users collapse via the
    # register max
    "events_distinct_hll_portable",
    # r11 quantile sketch: value 0.0 lands in bucket (e=1, m=0) with a
    # 0 exact quantile (rel_err NULL on both engines — double /0 is
    # NULL in Spark non-ANSI AND DuckDB); negative/NULL values are
    # filtered identically; n=1 types make every rank pick the only
    # bucket; exact quarters sit ON centi-grid cell edges
    "events_quantile_sketch_portable",
    # r11 decayed counters: same-instant generated events give age 0
    # (weight 2^40) and tied score_q across users (user_id ASC cutoff
    # order must agree); NULL users are filtered identically
    "events_decayed_engagement",
]


def _run(spark, tmp_path, events, query_name):
    rows = [
        (
            i,
            datetime.fromtimestamp(_BASE.timestamp() + off, tz=timezone.utc)
            .replace(tzinfo=None),  # naive UTC — session tz is pinned UTC
            uid,
            et,
            val,
            props,
        )
        for i, (off, uid, et, val, props) in enumerate(events)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW events AS "
        f"SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
    )
    q = registry.QUERIES[query_name]
    return compare(query_name, q.fn(spark, sf_dir), con, q.oracle)


@settings(**_SETTINGS)
@given(events=_events)
@pytest.mark.parametrize("name", QUERIES)
def test_events_query_matches_oracle_on_generated_events(
    spark, tmp_path, name, events
):
    problems = _run(spark, tmp_path, events, name)
    assert not problems, problems
