"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-user accumulator: for each micro-batch, update persistent
state (event count, value sum, last-seen epoch) and emit the updated
totals. This is the pattern a streaming dedup / rate-limiter / feature
accumulator uses at 10^12-event scale — state is partitioned by key,
stored in the state store, and survives across triggers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, last_epoch long"
)
STATE_SCHEMA = "n long, s double, last long"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s, last = state.get
    else:
        n, s, last = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            last = max(last, int(pdf["epoch"].max()))
    state.update((n, s, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "last_epoch": [last],
        }
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """events stream → per-user running totals with persistent state."""
    prepared = events_stream.select(
        "user_id",
        F.col("value").cast("double").alias("value"),
        F.unix_timestamp("ts").alias("epoch"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
