"""Custom stateful streaming operator: gap-based sessionization with
`applyInPandasWithState` (the task brief's designated mechanism for
stateful ops Spark's built-in windows can't express — a session closes
`gap` seconds after its last event, per key, across micro-batches).

State per user: (session_start, last_ts, n_events). On each batch the
handler merges new events into open state, emits every CLOSED session,
and uses event-time timeouts so idle users' sessions close without new
input. Output schema matches the batch sessionize query in
`__spark_entry__.py` so results are cross-checkable at drain time.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", IntegerType(), False),
    ]
)

STATE = StructType(
    [
        StructField("start_us", LongType(), False),
        StructField("last_us", LongType(), False),
        StructField("n", IntegerType(), False),
    ]
)


def make_sessionizer(gap_seconds: int = 1800):
    """Returns the applyInPandasWithState handler closing sessions after
    `gap_seconds` of per-user inactivity."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                rows.append((user_id, start_us, last_us, n))
                state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                # timestamps arrive tz-naive micro-batch local; use int64 µs
                ts_list.extend(
                    pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
                )
            ts_list.sort()
            if not ts_list:
                return
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us, last_us, n = ts_list[0], ts_list[0], 0
            for t in ts_list:
                if t - last_us > gap_us:
                    rows.append((user_id, start_us, last_us, n))
                    start_us, n = t, 0
                last_us = t
                n += 1
            state.update((start_us, last_us, n))
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if rows:
            out = pd.DataFrame(
                rows, columns=["user_id", "start_us", "last_us", "n"]
            )
            yield pd.DataFrame(
                {
                    "user_id": out["user_id"],
                    "session_start": pd.to_datetime(out["start_us"], unit="us"),
                    "session_end": pd.to_datetime(out["last_us"], unit="us"),
                    "n_events": out["n"].astype("int32"),
                }
            )

    return fn


def sessionize_stream(events, gap_seconds: int = 1800):
    """events streaming DF (user_id long, ts timestamp, …) → closed
    sessions streaming DF. Watermark bounds state for late events."""
    from pyspark.sql import functions as F

    # watermarks require TIMESTAMP (tz-aware); parquet often stores NTZ
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds),
            outputStructType=SESSION,
            stateStructType=STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
