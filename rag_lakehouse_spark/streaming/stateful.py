"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for stream logic the built-in windows can't express
(running per-key aggregates that emit on every batch, custom session
logic, decaying counters).

Example operator: per-user running activity tracker — emits, per
micro-batch, the cumulative event count and value sum for each user
seen in the batch. State: one (count, total) pair per user, O(users)
in the state store, watermark-free (bounded by key cardinality).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_total", T.LongType()),
        T.StructField("value_total", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _track_user(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events_total": [n], "value_total": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful running totals per user over a stream of events."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _track_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
