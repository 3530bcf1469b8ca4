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


def compact_partition(
    spark, path: str, target_mb: int = 128, fmt: str = "parquet"
) -> int:
    """Rewrite a directory of many small files into ~target_mb outputs —
    the standing answer to the small-files problem a long-running
    partitioned sink accumulates (every micro-batch writes at least one
    file per partition; a year of 5-minute triggers is 10^5 files whose
    per-file open/footer overhead dominates scans).

    Sizing comes from the actual on-disk bytes (not row counts), read
    through the same Hadoop FileSystem the executors use, so it works
    on any scheme. Returns the number of output files written. The
    rewrite goes through a temp dir + rename so a crash mid-compaction
    never leaves the partition half-replaced.
    """
    import math
    import uuid

    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    if not fs.exists(hpath):
        raise FileNotFoundError(path)
    summary = fs.getContentSummary(hpath)
    total_bytes = summary.getLength()
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))

    df = spark.read.format(fmt).load(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(n_out).write.mode("overwrite").format(fmt).save(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    fs.rename(hpath, jvm.org.apache.hadoop.fs.Path(old))
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath)
    fs.delete(jvm.org.apache.hadoop.fs.Path(old), True)
    return n_out
