"""Custom stateful streaming operator: client sessionization with an
inactivity timeout.

This is the (c)-tier custom-operator case from the build guidelines: a
semantics Spark's built-in windowed aggregation can't express (sessions
close on *gaps*, not on fixed windows), implemented with
`applyInPandasWithState` — per-group state on the executors, Arrow
batches in and out, timeout-driven emission. The batch equivalent
(`sessionize_batch`) expresses the same semantics with a lag/cumsum
window — useful for backfills and for cross-checking the streaming
operator in tests.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

SESSION_SCHEMA = StructType(
    [
        StructField("client_host", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_requests", LongType()),
        StructField("total_bytes", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("bytes", LongType()),
    ]
)


def sessionize_stream(
    logs: DataFrame, gap_seconds: int = 30 * 60, timeout_ms: int = 30 * 60 * 1000
) -> DataFrame:
    """Streaming sessionization keyed by client_host.

    Two distinct clocks: `gap_seconds` is the *event-time* inactivity gap
    that splits sessions within the arriving data; `timeout_ms` is the
    *processing-time* idle timeout after which an open session is flushed
    downstream. State per key is four longs — bounded regardless of
    stream length.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (client,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, end_us, n, nbytes = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "client_host": [client],
                        "session_start": [pd.Timestamp(start_us, unit="us")],
                        "session_end": [pd.Timestamp(end_us, unit="us")],
                        "n_requests": [n],
                        "total_bytes": [nbytes],
                    }
                )
            return

        closed = []
        start_us = end_us = None
        n = nbytes = 0
        if state.exists:
            start_us, end_us, n, nbytes = state.get

        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("timestamp")
        for ts, b in zip(rows["timestamp"], rows["bytes"].fillna(0)):
            us = int(pd.Timestamp(ts).value // 1000)
            if start_us is None:
                start_us, end_us, n, nbytes = us, us, 1, int(b)
            elif us - end_us > gap_us:
                closed.append((start_us, end_us, n, nbytes))
                start_us, end_us, n, nbytes = us, us, 1, int(b)
            else:
                end_us = us
                n += 1
                nbytes += int(b)

        state.update((start_us, end_us, n, nbytes))
        state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "client_host": [client] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                    "n_requests": [c[2] for c in closed],
                    "total_bytes": [c[3] for c in closed],
                }
            )

    return (
        logs.select("client_host", "timestamp", "bytes")
        .groupBy("client_host")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(logs: DataFrame, gap_seconds: int = 30 * 60) -> DataFrame:
    """Batch sessionization: lag-gap flags + running sum assigns session
    ids, then one aggregation per session. Two shuffles total (both on
    client_host), any scale."""
    w = Window.partitionBy("client_host").orderBy("timestamp")
    gap_flag = (
        F.when(
            F.unix_micros("timestamp") - F.lag(F.unix_micros("timestamp")).over(w)
            > gap_seconds * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("new_session")
    )
    with_ids = logs.select("client_host", "timestamp", "bytes", gap_flag).withColumn(
        "session_id", F.sum("new_session").over(w)
    )
    return (
        with_ids.groupBy("client_host", "session_id")
        .agg(
            F.min("timestamp").alias("session_start"),
            F.max("timestamp").alias("session_end"),
            F.count(F.lit(1)).alias("n_requests"),
            F.sum(F.coalesce(F.col("bytes"), F.lit(0))).alias("total_bytes"),
        )
        .drop("session_id")
    )
