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

from ..plans.registry import fround, register, table

QUANTILES = (0.5, 0.95, 0.99)


@register(
    "q18_quantiles",
    f"""
    SELECT event_type,
           count(*) AS n,
           floor((quantile_cont(value, {QUANTILES[0]})) * 1e4 + 0.5) / 1e4 AS p50,
           floor((quantile_cont(value, {QUANTILES[1]})) * 1e4 + 0.5) / 1e4 AS p95,
           floor((quantile_cont(value, {QUANTILES[2]})) * 1e4 + 0.5) / 1e4 AS p99
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
            fround(F.element_at("p", 1), 4).alias("p50"),
            fround(F.element_at("p", 2), 4).alias("p95"),
            fround(F.element_at("p", 3), 4).alias("p99"),
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
    """
    SELECT count(DISTINCT l_orderkey) AS exact_orders,
           count(DISTINCT l_partkey) AS exact_parts,
           count(DISTINCT l_suppkey) AS exact_suppliers,
           CASE WHEN abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey)) * 10
                     <= count(DISTINCT l_orderkey) THEN 1 ELSE 0 END AS orders_within_10pct,
           CASE WHEN abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey)) * 10
                     <= count(DISTINCT l_partkey) THEN 1 ELSE 0 END AS parts_within_10pct,
           CASE WHEN abs(approx_count_distinct(l_suppkey) - count(DISTINCT l_suppkey)) * 10
                     <= count(DISTINCT l_suppkey) THEN 1 ELSE 0 END AS suppliers_within_10pct
    FROM lineitem
    """,
    "HyperLogLog++ approx distinct with a hashable tolerance contract: exact "
    "counts + integer within-10%% indicators (each engine checks its OWN "
    "sketch against the exact count; 10%% is ~5 sigma at rsd 0.02 — "
    "overwhelmingly likely to be 1, though HLL error tails are not strictly "
    "Gaussian, so a pathological key distribution on some engine build could "
    "in principle flip an indicator)",
)
def q20_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("__a_o"),
        F.approx_count_distinct("l_partkey", 0.02).alias("__a_p"),
        F.approx_count_distinct("l_suppkey", 0.02).alias("__a_s"),
    )

    def within(approx: str, exact: str, out: str):
        return (
            F.when(F.abs(F.col(approx) - F.col(exact)) * 10 <= F.col(exact), 1)
            .otherwise(0)
            .alias(out)
        )

    return agg.select(
        "exact_orders",
        "exact_parts",
        "exact_suppliers",
        within("__a_o", "exact_orders", "orders_within_10pct"),
        within("__a_p", "exact_parts", "parts_within_10pct"),
        within("__a_s", "exact_suppliers", "suppliers_within_10pct"),
    )
