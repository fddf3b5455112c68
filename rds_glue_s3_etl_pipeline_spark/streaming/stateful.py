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

API note: Spark 4's successor API (``transformWithStateInPandas`` —
timers, multiple state variables, TTL) was evaluated and is
unavailable in this environment: its driver-side runner needs the
``google.protobuf`` python package, which is broken here (probed:
STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE / ImportError). The
operators below use ``applyInPandasWithState``, which covers the same
semantics for these shapes and runs everywhere.
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


def user_totals_with_eviction(
    events: DataFrame, watermark: str = "2 hours", idle_timeout_min: int = 60
) -> DataFrame:
    """The bounded-state sibling of ``user_running_totals``: per-user
    running totals with EVENT-TIME idle eviction — a user quiet for
    ``idle_timeout_min`` past the watermark is closed out with a final
    ``closed=true`` punctuation row and their state dropped.

    This pairing (update rows AND a distinct end-of-life row from one
    operator) is exactly what the built-in windows can't express.
    Unlike ``user_running_totals`` its state is bounded: only users
    active within the timeout horizon occupy the store, so the stream
    can run forever over an unbounded user population.
    """
    out_schema = "user_id long, n_events long, total_value double, closed boolean"
    state_schema = "n long, total double, last_ms long"
    idle_ms = idle_timeout_min * 60_000

    def update(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n],
                 "total_value": [total], "closed": [True]}
            )
            return
        n, total, last_ts_ms = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            batch_max = pdf["ts"].max()
            if pd.notna(batch_max):
                last_ts_ms = max(last_ts_ms, int(batch_max.value // 1_000_000))
        # The high-water mark lives IN STATE: a batch of all-null ts
        # must not reset it (last_ts_ms=0 would put the timeout below
        # the watermark and fail the query), and a late in-watermark
        # batch of older events must not pull an existing timeout
        # earlier. The store rejects timeouts at or below the current
        # watermark, so clamp: an already-expired horizon fires at
        # wm+1 (evict ASAP); a group with no valid ts seen yet parks
        # one idle period past the watermark instead of evicting on
        # garbage.
        state.update((n, total, last_ts_ms))
        wm_ms = state.getCurrentWatermarkMs()
        if last_ts_ms > 0:
            state.setTimeoutTimestamp(max(last_ts_ms + idle_ms, wm_ms + 1))
        else:
            state.setTimeoutTimestamp(wm_ms + idle_ms + 1)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n],
             "total_value": [total], "closed": [False]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
