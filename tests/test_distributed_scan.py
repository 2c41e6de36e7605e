"""operators.distributed_scan: the two-phase prefix scan must be
bit-identical to the single-window form it replaces (VERDICT r7 #3-4),
and the rewritten queries must actually run the chunked shape."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from rag_lakehouse_spark.operators.distributed_scan import running_rank, running_totals

_rows = st.lists(
    st.tuples(
        st.sampled_from(["web", "wiki", "code"]),  # few keys on purpose
        st.integers(min_value=0, max_value=500),
    ),
    min_size=1,
    max_size=60,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    # unique order key per row (the operator's contract)
    data = [(i, src, v) for i, (src, v) in enumerate(rows)]
    return spark.createDataFrame(data, "doc_id long, source string, v long")


@settings(**_SETTINGS)
@given(rows=_rows)
def test_running_totals_matches_single_window(spark, rows):
    df = _df(spark, rows)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        (r.doc_id): r.off
        for r in df.withColumn(
            "off", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    got_df = running_totals(
        df, ["source"], ["doc_id"], {"off": "v"}, n_parts=5
    )
    got = {r.doc_id: r.off for r in got_df.collect()}
    assert got == want
    # column set preserved + appended output, no temp columns leaked
    assert set(got_df.columns) == {"doc_id", "source", "v", "off"}


@settings(**_SETTINGS)
@given(rows=_rows)
def test_running_rank_matches_row_number(spark, rows):
    df = _df(spark, rows)
    w = Window.partitionBy("source").orderBy("v", "doc_id")
    want = {
        r.doc_id: r.rk
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    got = {
        r.doc_id: r.rk
        for r in running_rank(df, ["source"], ["v", "doc_id"], n_parts=5).collect()
    }
    assert got == want


def test_rewritten_queries_run_the_chunked_scan(spark, sf_dir):
    """The pack/gate plans must window over (__scan_pid, source) chunks
    — never a raw-row window partitioned by source alone (one task per
    source at 100 TB). The source-only windows that remain operate on
    the P-row subtotal table (bounded by the chunk count)."""
    from rag_lakehouse_spark.plans.text_queries import (
        corpus_pack_sequences,
        quality_gate_per_source,
    )

    from rag_lakehouse_spark.plans.advanced_queries import (
        orders_revenue_concentration,
    )

    for q in (
        corpus_pack_sequences,
        quality_gate_per_source,
        orders_revenue_concentration,
    ):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "__scan_pid" in plan, q.__name__
        assert "windowspecdefinition(__scan_pid" in plan, q.__name__
