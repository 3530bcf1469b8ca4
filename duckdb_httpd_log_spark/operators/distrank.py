"""Distributed global ranking without a single-task window.

A bare ``row_number() OVER (ORDER BY ...)`` (or ``ntile``/cumulative
``sum``) moves the ENTIRE input through one task — fine on a spine of
days, fatal on a customer/order/user dimension at the 100 TB design
point. This helper decomposes the global order into the classic
two-phase scan (the same shape text_pack_sequences uses, but fully
declarative — no mapInPandas, no driver collect):

1. range-partition the input on the ranking order (Spark samples range
   bounds; skew is bounded by the sampler);
2. per-partition row counts / sums -> an nparts-row table; a window
   over THAT (trivially small) yields each partition's global offset;
3. partition-LOCAL row_number / cumulative sum + broadcast offset join.

The result is bit-identical to the global window, so oracles written
with plain ``row_number``/``ntile``/cumulative ``sum`` still
hash-match.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def with_global_rank(
    spark: SparkSession,
    df: DataFrame,
    order_cols: Sequence[Column],
    rn_col: str = "rn",
    n_col: Optional[str] = None,
    cum_col: Optional[str] = None,
    cum_src: Optional[str] = None,
) -> DataFrame:
    """Attach a global ``rn_col`` (1-based row_number under
    ``order_cols``) and optionally the total row count ``n_col`` and a
    global running sum ``cum_col`` of column ``cum_src`` — all computed
    with partition-local windows only.

    ``order_cols`` must be a total order (include a tiebreak key);
    pass ``F.col(...).desc()`` columns for descending components (the
    same Column list feeds repartitionByRange AND the local window).
    """
    from pyspark import StorageLevel

    nparts = max(spark.sparkContext.defaultParallelism, 1)
    d = (
        df.repartitionByRange(nparts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        # both passes (per-partition totals + the local scan) must see
        # the SAME partitioning — repartitionByRange SAMPLES its bounds,
        # so two independent evaluations could disagree on __pid. The
        # lazy checkpoint pins it and runs the range shuffle once.
        # Explicit SERIALIZED MEMORY_AND_DISK, not localCheckpoint's
        # MEMORY_AND_DISK_DESER default: deserialized in-heap
        # materialization of a fact-scale table OOM'd the 1000x events
        # rehearsal (100M rows, 8g heap) — serialized blocks unroll
        # byte-incrementally and spill cleanly. localCheckpoint rather
        # than persist(): persist registers in the CacheManager, whose
        # canonical-plan matching would silently serve every later
        # identically-shaped query (and benchmark rerun) from this
        # cache and leak the entry for the session's lifetime.
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    aggs = [F.count(F.lit(1)).alias("__c")]
    if cum_src is not None:
        aggs.append(F.sum(cum_src).alias("__s"))
    pc = d.groupBy("__pid").agg(*aggs)
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    sel = [
        F.col("__pid"),
        F.coalesce(F.sum("__c").over(woff), F.lit(0)).alias("__coff"),
    ]
    if cum_src is not None:
        sel.append(F.coalesce(F.sum("__s").over(woff), F.lit(0)).alias("__soff"))
    if n_col is not None:
        sel.append(F.sum("__c").over(Window.partitionBy()).alias(n_col))
    offs = pc.select(*sel)
    wloc = Window.partitionBy("__pid").orderBy(*order_cols)
    out = d.join(F.broadcast(offs), "__pid").withColumn(
        rn_col, F.col("__coff") + F.row_number().over(wloc)
    )
    if cum_col is not None:
        out = out.withColumn(
            cum_col,
            F.col("__soff")
            + F.sum(cum_src).over(wloc.rowsBetween(Window.unboundedPreceding, 0)),
        )
    drop = ["__pid", "__coff"] + (["__soff"] if cum_src is not None else [])
    return out.drop(*drop)


def with_grouped_rank(
    spark: SparkSession,
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[Column],
    rn_col: str = "rn",
    n_col: Optional[str] = None,
    cum_col: Optional[str] = None,
    cum_src: Optional[str] = None,
) -> DataFrame:
    """Per-group ``row_number() OVER (PARTITION BY keys ORDER BY
    order_cols)`` without per-group sort tasks — the grouped two-phase
    rank (factored from orders_rfm_migration's inline form, r8 verdict
    item 1).

    ``Window.partitionBy(key)`` funnels each group's FULL row set
    through one sort task: over a fact table partitioned by a
    low-cardinality key (an order priority, a language, a funnel
    stage — 2..30 distinct values), that is the whole fact table in a
    handful of tasks at the 100 TB design point. Here instead:

    1. range-partition on ``(*keys, *order_cols)`` — every partition
       holds a contiguous slice of the (group, order) space, so a
       group larger than one partition spans ADJACENT partitions and
       the sort work stays spread over all of them;
    2. per-(group, partition) row counts -> a bounded offsets table
       (at most nparts + n_groups rows: each range partition touches
       a contiguous run of groups), windowed per group over the
       partition id for each slice's global offset — trivially small;
    3. partition-LOCAL row_number (plus optional count / running sum)
       rebased by the broadcast offset.

    Bit-identical to the naive grouped window when ``order_cols`` is a
    per-group total order (include a tiebreak), so oracles written
    with plain partitioned row_number/count/sum hash-match unchanged.

    ``keys`` are column names; ``order_cols`` are Columns (use
    ``F.col(...).desc()`` for descending components — the same list
    feeds repartitionByRange and the local window). Optional outputs
    mirror with_global_rank: ``n_col`` = the group's total row count,
    ``cum_col`` = the group's running sum of ``cum_src`` under the
    same order.
    """
    from pyspark import StorageLevel

    nparts = max(spark.sparkContext.defaultParallelism, 1)
    key_cols = [F.col(k) for k in keys]
    d = (
        df.repartitionByRange(nparts, *key_cols, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        # same contract as with_global_rank: both passes must see ONE
        # sampled range partitioning, pinned serialized so a fact-scale
        # input spills instead of OOMing the unroll.
        .localCheckpoint(eager=False, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    aggs = [F.count(F.lit(1)).alias("__c")]
    if cum_src is not None:
        aggs.append(F.sum(cum_src).alias("__s"))
    pc = d.groupBy(*keys, "__pid").agg(*aggs)
    woff = (
        Window.partitionBy(*keys)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sel = [
        *key_cols,
        F.col("__pid"),
        F.coalesce(F.sum("__c").over(woff), F.lit(0)).alias("__coff"),
    ]
    if cum_src is not None:
        sel.append(F.coalesce(F.sum("__s").over(woff), F.lit(0)).alias("__soff"))
    if n_col is not None:
        sel.append(F.sum("__c").over(Window.partitionBy(*keys)).alias(n_col))
    # Null-safe offsets join (r9 ADVICE): a name-list join uses plain
    # EqualTo and silently DROPS rows whose key is NULL, whereas the
    # naive Window.partitionBy this helper must be bit-identical to
    # keeps NULL as a regular partition (groupBy/repartitionByRange
    # above already treat NULL as an ordinary value). Rename the
    # offsets keys and join with eqNullSafe. __pid is never NULL.
    offs = pc.select(*sel).withColumnRenamed("__pid", "__o_pid")
    for k in keys:
        offs = offs.withColumnRenamed(k, f"__o_{k}")
    cond = F.col("__pid") == F.col("__o_pid")
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"__o_{k}"))
    wloc = Window.partitionBy("__pid", *keys).orderBy(*order_cols)
    out = d.join(F.broadcast(offs), cond).withColumn(
        rn_col, F.col("__coff") + F.row_number().over(wloc)
    )
    if cum_col is not None:
        out = out.withColumn(
            cum_col,
            F.col("__soff")
            + F.sum(cum_src).over(wloc.rowsBetween(Window.unboundedPreceding, 0)),
        )
    drop = (
        ["__pid", "__o_pid", "__coff"]
        + [f"__o_{k}" for k in keys]
        + (["__soff"] if cum_src is not None else [])
    )
    return out.drop(*drop)


def ntile_expr(rn_col: str, n_col: str, k: int) -> Column:
    """Exact SQL ``ntile(k)`` bucket from a 1-based global rank and the
    total count: the first ``n % k`` buckets hold ``n div k + 1`` rows.
    Pure integer arithmetic — portable across engines."""
    return F.expr(
        f"CASE WHEN {rn_col} <= ({n_col} div {k} + 1) * ({n_col} % {k})"
        f"     THEN ({rn_col} - 1) div ({n_col} div {k} + 1) + 1"
        f"     ELSE {n_col} % {k}"
        f"          + ({rn_col} - ({n_col} div {k} + 1) * ({n_col} % {k}) - 1)"
        f"            div ({n_col} div {k}) + 1 END"
    )
