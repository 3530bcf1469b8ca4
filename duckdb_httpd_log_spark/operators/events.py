"""Event-stream analytics operators (batch, over the `events` table):
gap-based sessionization, as-of join, and funnel analysis — the classic
clickstream/log-session workloads a log engine is used for downstream.

All timestamps are projected as epoch microseconds (BIGINT) in the
output contract so the DuckDB oracle comparison never depends on
engine-specific timestamp rendering.

Scale shapes:
- sessionize: one shuffle on user_id, then window lag + running sum —
  the canonical distributed gap-session plan (state per user bounded
  by their own events).
- as-of join: window `last(..., ignorenulls)` over (user_id, ts) — a
  single sort-partition pass, not a per-row subquery (the oracle uses
  the equivalent correlated-max formulation).
- funnel: three staged conditional aggregations joined on user_id —
  each stage is a hash agg + broadcast-joinable per-user table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register, table

SESSION_GAP_MIN = 30  # minutes of inactivity ending a session
_GAP_US = SESSION_GAP_MIN * 60 * 1_000_000


@register(
    "q15_sessionize",
    f"""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    ),
    marked AS (
        SELECT user_id, event_id, us,
               CASE WHEN prev_us IS NULL OR us - prev_us > {_GAP_US} THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    numbered AS (
        SELECT user_id, event_id, us,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM marked
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           min(us) AS session_start_us, max(us) AS session_end_us,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx
    """,
    f"gap-based sessionization ({SESSION_GAP_MIN} min inactivity) via window lag + running sum",
)
def q15_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w).isNull() | ((F.col("us") - F.lag("us").over(w)) > _GAP_US), 1
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_idx",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        numbered.groupBy("user_id", "session_idx")
        .agg(
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_idx")
    )


@register(
    "q16_asof_join",
    """
    SELECT e.event_id AS err_id, e.user_id, epoch_us(e.ts) AS err_us,
           (SELECT max(epoch_us(c.ts)) FROM events c
            WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
           ) AS prev_click_us
    FROM events e
    WHERE e.event_type = 'error'
    ORDER BY err_id
    """,
    "as-of join: most recent preceding click per error, via a single window pass",
)
def q16_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "error"))
        .select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"))
    )
    # clicks sort before errors at identical (us): an err row's window
    # then includes same-instant clicks, matching the oracle's `<=`
    kind = F.when(F.col("event_type") == "click", 0).otherwise(1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", kind, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_us = F.last(
        F.when(F.col("event_type") == "click", F.col("us")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("prev_click_us", click_us)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("err_id"),
            "user_id",
            F.col("us").alias("err_us"),
            "prev_click_us",
        )
        .orderBy("err_id")
    )


@register(
    "q17_funnel",
    """
    WITH v AS (
        SELECT user_id, min(epoch_us(ts)) AS first_view_us
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS first_click_us
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.first_view_us
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS first_purchase_us
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.first_click_us
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.first_view_us, c.first_click_us, p.first_purchase_us,
           CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2
                ELSE 1 END AS stage
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    ORDER BY v.user_id
    """,
    "view→click→purchase funnel: staged ordered-min aggregation per user",
)
def q17_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("first_view_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") >= F.col("first_view_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("first_click_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") >= F.col("first_click_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("first_purchase_us"))
    )
    stage = (
        F.when(F.col("first_purchase_us").isNotNull(), 3)
        .when(F.col("first_click_us").isNotNull(), 2)
        .otherwise(1)
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "first_view_us", "first_click_us", "first_purchase_us")
        .withColumn("stage", stage)
        .orderBy("user_id")
    )


@register(
    "q21_time_bucketed",
    """
    SELECT epoch_us(date_trunc('hour', ts)) AS hour_us,
           count(*) AS n_events,
           count(*) FILTER (WHERE event_type = 'error') AS n_errors,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    "hourly time-bucketed rollup (the reference README's requests-per-period idiom)",
)
def q21_time_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_us"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("hour_us")
    )
