"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference's "state" is its history table, which ``incremental.py``
models with ``foreachBatch`` merges.  This module covers the other shape a
feed pipeline needs: per-key state that is NOT a merge target — session
windows over the event stream.  Sessionization cannot be expressed with
tumbling ``window()`` aggregates (a session's end depends on the data), so
it uses Spark's arbitrary-stateful-processing API: one state row per key,
Arrow-batched, timeout-driven eviction.

Scale notes: state lives in the state store partitioned by the grouping
key (one shuffle per micro-batch); state size is O(distinct active keys) —
bytes per key here, so hundreds of millions of concurrent sessions fit.
``GroupStateTimeout.ProcessingTimeTimeout`` evicts idle keys so state
doesn't grow unboundedly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("session_id", T.LongType()),
    ]
)

# state: (last event epoch-micros, running session counter)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("session_id", T.LongType()),
    ]
)


def sessionize_stream(
    stream: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    idle_timeout_minutes: int = 120,
) -> DataFrame:
    """Assign gap-based session ids to a stream, continuing sessions ACROSS
    micro-batches (the stateful analog of the batch ``sessionize`` query in
    driver_queries_wave3 — same semantics, state-store-resident last-seen
    timestamps instead of a lag window).
    """
    import pandas as pd

    from ..session import ensure_executors_can_import

    ensure_executors_can_import(stream.sparkSession)
    gap_us = gap_minutes * 60_000_000

    def assign(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        if state.hasTimedOut:
            state.remove()
            return
        last_us, session_id = state.get if state.exists else (None, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        # micro-batch rows arrive unordered within the group
        batch = batch.sort_values([ts_col, id_col], kind="mergesort")
        out_sessions = []
        for t in batch[ts_col]:
            t_us = int(t.value // 1_000)  # pandas Timestamp nanos → micros
            if last_us is None or t_us - last_us > gap_us:
                session_id += 1
            last_us = t_us
            out_sessions.append(session_id)
        state.update((last_us, session_id))
        state.setTimeoutDuration(idle_timeout_minutes * 60_000)
        yield pd.DataFrame(
            {
                "user_id": batch[key_col].astype("int64"),
                "event_id": batch[id_col].astype("int64"),
                "ts": batch[ts_col],
                "session_id": out_sessions,
            }
        )

    return (
        stream.select(key_col, id_col, ts_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            assign,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
