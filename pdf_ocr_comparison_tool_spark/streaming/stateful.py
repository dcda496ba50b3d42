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


DEDUP_OUTPUT_SCHEMA = "text_hash string, doc_id long"
DEDUP_STATE_SCHEMA = "kept long"


def _dedup_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (text_hash,) = key
    first_seen = not state.exists
    kept = None if first_seen else state.get[0]
    for pdf in pdfs:
        if len(pdf):
            mn = int(pdf["doc_id"].min())
            kept = mn if kept is None else min(kept, mn)
    state.update((kept,))
    if first_seen:
        yield pd.DataFrame({"text_hash": [text_hash], "doc_id": [kept]})


def streaming_first_seen_dedup(docs_stream: DataFrame) -> DataFrame:
    """Streaming exact dedup — the unbounded twin of
    dedup.exact_dup_groups' keep policy: per content hash, admit only
    the first-seen document (min doc_id within the first micro-batch
    that carries the hash) and suppress every later arrival via
    persistent key-partitioned state. This is the shape an ingestion
    firehose dedups with at 10^12 docs: state lives in the state store
    sharded by hash, no batch-global shuffle ever forms.

    Arrival-order semantics by design: when ingestion order follows
    doc_id (the test fixes this via file modification times), the
    admitted set equals the batch min-doc_id keep set."""
    from ..operators.features import text_hash

    hashed = docs_stream.select(
        "doc_id", text_hash(F.col("text")).alias("text_hash")
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        _dedup_update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
