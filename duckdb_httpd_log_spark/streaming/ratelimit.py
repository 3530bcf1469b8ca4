"""Custom stateful streaming operator: per-client token-bucket rate
limiting / abuse detection.

The token-bucket recurrence — tokens_i = min(burst, tokens_{i-1} +
rate*dt) - allowed_i — is nonlinear (the min caps the refill), so no
windowed aggregate or prefix sum can express it: it is the (c)-tier
custom-operator case, implemented with `applyInPandasWithState`. State
per key is two scalars (token level + last event time), bounded forever;
keys are distributed by the groupBy hash, so the operator scales
horizontally with executors exactly like the built-in stateful ops.

Violations (requests arriving with an empty bucket) are emitted in
append mode — the streaming twin of an abuse/alert feed.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

VIOLATION_SCHEMA = StructType(
    [
        StructField("client_host", StringType()),
        StructField("ts", TimestampType()),
        StructField("tokens", DoubleType()),  # bucket level at rejection
        StructField("n_rejected_so_far", LongType()),
    ]
)

_RL_STATE = StructType(
    [
        StructField("tokens", DoubleType()),
        StructField("last_us", LongType()),
        StructField("n_rejected", LongType()),
    ]
)


def rate_limit_stream(
    logs: DataFrame,
    limit: int = 60,
    period_seconds: float = 60.0,
    burst: int | None = None,
) -> DataFrame:
    """Emit one row per request that exceeds `limit` requests per
    `period_seconds` (token bucket, refill rate = limit/period, capacity
    `burst`, default = limit), keyed by client_host. Events are processed
    in event-time order within each micro-batch."""
    rate = limit / period_seconds  # tokens per second
    cap = float(burst if burst is not None else limit)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (client,) = key
        if state.hasTimedOut:  # NoTimeout: never reached, defensive
            return
        batch = pd.concat(list(pdfs))
        if batch.empty:
            return
        batch = batch.sort_values("timestamp")
        if state.exists:
            tokens, last_us, n_rejected = state.get
        else:
            tokens, last_us, n_rejected = cap, None, 0
        out_ts, out_tokens, out_n = [], [], []
        for ts in batch["timestamp"]:
            us = ts.value // 1000  # pandas ns ticks -> µs
            if last_us is not None and us > last_us:
                tokens = min(cap, tokens + (us - last_us) / 1e6 * rate)
            # Only advance the clock: a late event from a later micro-batch
            # (us < last_us) must not move it backward, or the next event
            # would refill over an interval already credited.
            last_us = us if last_us is None else max(last_us, us)
            if tokens >= 1.0:
                tokens -= 1.0
            else:
                n_rejected += 1
                out_ts.append(ts)
                out_tokens.append(round(tokens, 6))
                out_n.append(n_rejected)
        state.update((float(tokens), int(last_us), int(n_rejected)))
        if out_ts:
            yield pd.DataFrame(
                {
                    "client_host": client,
                    "ts": out_ts,
                    "tokens": out_tokens,
                    "n_rejected_so_far": out_n,
                }
            )

    return logs.groupBy("client_host").applyInPandasWithState(
        fn, VIOLATION_SCHEMA, _RL_STATE, "append", GroupStateTimeout.NoTimeout
    )
