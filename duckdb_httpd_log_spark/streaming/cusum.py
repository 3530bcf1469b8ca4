"""Custom stateful streaming operator: CUSUM change-point detection per
key (the streaming twin of the batch seasonal/drift diagnostics in
`operators/corpus.py`).

A CUSUM control chart accumulates deviations of each observation from a
reference mean; when the one-sided cumulative sum exceeds a threshold,
the mean has shifted — the standard online drift detector for metric
streams (error rates, request volumes, quality scores). Windowed
aggregation can't express it: the statistic is a RUNNING recurrence
(s ← max(0, s + x − μ − k)), so it needs per-key state — the (c)-tier
custom-operator case, implemented with `applyInPandasWithState`.

State per key is four doubles/longs — bounded no matter how long the
stream runs. Alerts are emitted AT the observation that crosses the
threshold, then the statistic resets (standard restart-after-signal
CUSUM). The deterministic recurrence makes the operator exactly
testable: the batch replay in tests/test_streaming.py recomputes the
same recurrence in plain Python.
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
)

ALERT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_seen", LongType()),
        StructField("value", DoubleType()),
        StructField("cusum_pos", DoubleType()),
        StructField("cusum_neg", DoubleType()),
        StructField("direction", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s_pos", DoubleType()),
        StructField("s_neg", DoubleType()),
    ]
)


def cusum_alerts_stream(
    values: DataFrame,
    target_mean: float,
    slack: float,
    threshold: float,
    key_col: str = "event_type",
    value_col: str = "value",
    order_col: str = None,
) -> DataFrame:
    """Per-key one-sided CUSUM drift alerts over a value stream.

    `target_mean` is the in-control reference (at 100 TB it comes from
    the batch baseline job, e.g. events_seasonal_baseline's dow means,
    broadcast per deploy); `slack` (k) absorbs in-control noise;
    `threshold` (h) is the alarm level. The recurrence is
    order-sensitive by definition, and Spark guarantees no row order
    inside a micro-batch — pass `order_col` (an event-time or sequence
    column) and the operator sorts each key's batch on it before
    folding. Ordering ACROSS micro-batches is the source's
    responsibility (file arrival order / kafka offsets).
    """

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        if state.exists:
            n, s_pos, s_neg = state.get
        else:
            n, s_pos, s_neg = 0, 0.0, 0.0
        out = {c.name: [] for c in ALERT_SCHEMA.fields}
        chunks = list(pdfs)
        if order_col is not None and chunks:
            merged = pd.concat(chunks, ignore_index=True).sort_values(
                order_col, kind="stable"
            )
            chunks = [merged]
        for pdf in chunks:
            for v in pdf[value_col]:
                v = float(v)
                n += 1
                s_pos = max(0.0, s_pos + (v - target_mean) - slack)
                s_neg = max(0.0, s_neg + (target_mean - v) - slack)
                direction = None
                if s_pos > threshold:
                    direction = "up"
                elif s_neg > threshold:
                    direction = "down"
                if direction is not None:
                    out["key"].append(k)
                    out["n_seen"].append(n)
                    out["value"].append(v)
                    out["cusum_pos"].append(s_pos)
                    out["cusum_neg"].append(s_neg)
                    out["direction"].append(direction)
                    s_pos, s_neg = 0.0, 0.0  # restart after signal
        state.update((n, s_pos, s_neg))
        if out["key"]:
            yield pd.DataFrame(out)

    return values.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_replay(values, target_mean: float, slack: float, threshold: float):
    """Reference replay of the same recurrence in plain Python (for
    tests and batch backfills): values is an iterable of (key, value)
    in stream order; returns the alert list the streaming operator
    would emit."""
    state: dict = {}
    alerts = []
    for k, v in values:
        n, s_pos, s_neg = state.get(k, (0, 0.0, 0.0))
        v = float(v)
        n += 1
        s_pos = max(0.0, s_pos + (v - target_mean) - slack)
        s_neg = max(0.0, s_neg + (target_mean - v) - slack)
        direction = None
        if s_pos > threshold:
            direction = "up"
        elif s_neg > threshold:
            direction = "down"
        if direction is not None:
            alerts.append((k, n, v, s_pos, s_neg, direction))
            s_pos, s_neg = 0.0, 0.0
        state[k] = (n, s_pos, s_neg)
    return alerts
