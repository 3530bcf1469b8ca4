"""Output sinks for parsed logs — the layout side of the 100 TB story.

The reference delegates output to its host engine (DuckDB `COPY TO`);
the Spark-native equivalent is the DataFrameWriter, wrapped here with
the partitioning discipline a large corpus needs: date-partitioned
parquet (partition pruning for time-range queries) with a bounded
file count per partition (no small-file explosion, no 10 GB monoliths).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def save_logs_partitioned(
    logs: DataFrame,
    path: str,
    ts_column: str = "timestamp",
    files_per_partition: int = 8,
    mode: str = "error",
    compression: str = "zstd",
) -> None:
    """Write parsed logs as date-partitioned parquet.

    Adds a `log_date` partition column derived from `ts_column`, then
    `repartition(files_per_partition, log_date)` so each date directory
    holds a bounded number of similarly-sized files — the layout that
    keeps both the writer shuffle and later partition-pruned scans
    healthy at 100 TB (readers of `WHERE log_date = ...` touch one
    directory; `spark.sql.files.maxPartitionBytes` re-splits on read).

    Rows are additionally `sortWithinPartitions(ts_column)` before the
    write: each parquet row group then covers a narrow, non-overlapping
    timestamp range, so its footer min/max statistics let time-range
    readers skip whole row groups INSIDE the matching date partitions —
    the second pruning level after directory pruning. Cost: one
    in-partition sort at write time, no extra shuffle.
    """
    (
        logs.withColumn("log_date", F.to_date(F.col(ts_column)))
        .repartition(files_per_partition, F.col("log_date"))
        .sortWithinPartitions(ts_column)
        .write.mode(mode)
        .partitionBy("log_date")
        .option("compression", compression)
        .parquet(path)
    )


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: Optional[list[str]] = None,
    mode: str = "error",
) -> None:
    """Write a hash-bucketed (optionally sorted) managed parquet table.

    Bucketing is the pre-shuffle layout for repeated big-big joins and
    aggregations: two tables bucketed on the same keys with the same
    bucket count join WITHOUT an exchange (and without even a sort when
    `sort_cols` matches the join keys) — the shuffle is paid once at
    write time instead of on every query. At 100 TB this is the
    difference between an hourly pipeline re-shuffling the corpus per
    run and reading co-located buckets. Verified by
    tests/test_operators.py::test_bucketed_join_has_no_shuffle.
    """
    writer = (
        df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def save_logs_single(
    logs: DataFrame, path: str, fmt: str = "parquet", mode: str = "error",
    coalesce: Optional[int] = 1,
) -> None:
    """Small-result export (reports, samples): optionally coalesced to a
    handful of files; format `parquet`, `csv`, or `json`."""
    df = logs.coalesce(coalesce) if coalesce else logs
    writer = df.write.mode(mode)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        writer.parquet(path)


def save_fingerprint_index(
    docs: DataFrame, path: str, prefix_k: int = 8, mode: str = "error"
) -> None:
    """Persist the dedup fingerprint index the incremental pipelines
    consume (batch `dedup_incremental`'s corpus side; streaming
    `dedup_against_index_stream`): one DISTINCT md5-of-first-k-tokens
    row per unique prefix. The index is the artifact a 100 TB pipeline
    maintains between runs — updating it is an idempotent distinct
    union, and it is orders of magnitude smaller than the corpus (one
    16-byte-hex row per unique prefix), so the stream side's per-batch
    reload stays cheap.
    """
    from pyspark.sql import functions as F

    fp = F.md5(
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, prefix_k)).cast("binary")
    )
    docs.select(fp.alias("fp")).distinct().write.mode(mode).parquet(path)
