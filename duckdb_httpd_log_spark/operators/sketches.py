"""Aggregation-sketch operators: latency quantiles, heavy hitters under
key skew, and approximate distinct counting.

Scale notes:
- quantiles: Spark's exact `percentile` matches DuckDB's linear
  interpolation (`quantile_cont`) value-for-value; at 100 TB swap in
  `percentile_approx` (t-digest-style bounded memory) — the approximate
  twin is exercised in `q20_approx_distinct`'s pattern.
- heavy hitters: the aggregation is two-phase by construction — an
  explicit salt splits each key across `SALT_BUCKETS` partial groups
  before the final merge, so a single hot key (the classic skewed
  client_host) never concentrates on one reducer. The result is
  bit-identical to the unsalted groupBy, which is exactly what the
  DuckDB oracle runs.
- approx distinct: HyperLogLog++ (`approx_count_distinct`) — sketch
  mergeable across partitions, fixed memory; rows-only driver check
  plus a relative-error tolerance test against the exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register, table

QUANTILES = (0.5, 0.95, 0.99)


@register(
    "q18_quantiles",
    f"""
    SELECT event_type,
           count(*) AS n,
           round(quantile_cont(value, {QUANTILES[0]}), 4) AS p50,
           round(quantile_cont(value, {QUANTILES[1]}), 4) AS p95,
           round(quantile_cont(value, {QUANTILES[2]}), 4) AS p99
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    "per-type latency quantiles (exact linear interpolation, both engines)",
)
def q18_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    pct = F.expr(f"percentile(value, array({QUANTILES[0]}, {QUANTILES[1]}, {QUANTILES[2]}))")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), pct.alias("p"))
        .select(
            "event_type",
            "n",
            F.round(F.element_at("p", 1), 4).alias("p50"),
            F.round(F.element_at("p", 2), 4).alias("p95"),
            F.round(F.element_at("p", 3), 4).alias("p99"),
        )
        .orderBy("event_type")
    )


SALT_BUCKETS = 16
TOP_N = 10


@register(
    "q19_heavy_hitters",
    f"""
    SELECT user_id, count(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY n_events DESC, user_id
    LIMIT {TOP_N}
    """,
    "top-N heavy hitters via explicit two-phase salted aggregation (skew-proof)",
)
def q19_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # phase 1: per-(key, salt) partial counts — a hot key spreads over
    # SALT_BUCKETS reducers; phase 2: merge partials per key
    partial = (
        ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(SALT_BUCKETS)))
        .groupBy("user_id", "salt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        partial.groupBy("user_id")
        .agg(F.sum("c").alias("n_events"))
        .orderBy(F.col("n_events").desc(), "user_id")
        .limit(TOP_N)
    )


@register(
    "q20_approx_distinct",
    None,  # sketch output is estimate-valued; driver records rows-only
    "HyperLogLog++ approximate distinct counts (tolerance-tested vs exact)",
)
def q20_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", 0.02).alias("approx_suppliers"),
    )
