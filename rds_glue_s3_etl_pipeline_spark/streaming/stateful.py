"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9/§2.10 extension surface — the escape hatch for stateful
semantics Spark's built-in windows/dedup cannot express).

The built-ins cover tumbling/sliding/session windows and watermarked
dedup (streaming/ops.py). What they cannot express is *arbitrary
per-key running state* — e.g. "cumulative engagement per user since
stream start, emitted every micro-batch". That requires a user-defined
state machine: ``groupBy(key).applyInPandasWithState(...)``.

Scale design: state lives in the executor-side state store, hash-
partitioned by the grouping key across ``spark.sql.shuffle.partitions``
tasks — per-key state is O(1) here (three numbers), so 10^9 users is
~tens of GB spread over the cluster, and the per-batch work is
Arrow-batched pandas on only the keys present in that batch. On a real
cluster back it with the RocksDB state store + changelog checkpointing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_seen_ms long"
)
STATE_SCHEMA = "n_events long, total_value double, last_seen_ms long"


def _update_user_totals(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_events, total_value, last_seen_ms = state.get
    else:
        n_events, total_value, last_seen_ms = 0, 0.0, 0

    for pdf in pdf_iter:
        n_events += len(pdf)
        total_value += float(pdf["value"].sum())
        batch_max_ms = int(pdf["ts"].astype("int64").max() // 1_000_000)
        last_seen_ms = max(last_seen_ms, batch_max_ms)

    state.update((n_events, total_value, last_seen_ms))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_events],
            "total_value": [total_value],
            "last_seen_ms": [last_seen_ms],
        }
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, value-sum, last-seen) across the
    whole stream, one updated row per user per micro-batch — custom
    stateful aggregation no built-in window expresses (state never
    expires; output is the *running* total, not a windowed one)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
