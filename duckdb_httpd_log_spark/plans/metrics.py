"""Scan instrumentation — the Spark counterpart of the reference's
EXPLAIN ANALYZE counters (saygox/duckdb-httpd-log
`src/httpd_log_table_function.cpp:858-891`: total_rows, files_processed,
parse_errors).

Implemented with `df.observe()`: accumulator-style metrics collected on
the executors during a normal action, zero extra passes over the data.
Timings (time_file_io / time_regex in the reference) are Spark-UI /
QueryExecutionListener territory rather than row metrics, so they are
not replicated here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def scan_metrics(logs: DataFrame) -> tuple[Observation, DataFrame]:
    """Attach scan counters to a httpd-log DataFrame.

    Returns (observation, observed_df). Run any action on observed_df,
    then read `observation.get` for: total_rows, parse_errors (raw mode
    only, else 0), files_processed, bytes_scanned (sum of raw line
    lengths when available).
    """
    cols = set(logs.columns)
    metrics = [
        F.count(F.lit(1)).alias("total_rows"),
        F.approx_count_distinct("log_file").alias("files_processed"),
    ]
    if "parse_error" in cols:
        metrics.append(
            F.sum(F.col("parse_error").cast("long")).alias("parse_errors")
        )
    else:
        metrics.append(F.lit(0).cast("long").alias("parse_errors"))
    if "raw_line" in cols:
        metrics.append(F.sum(F.length("raw_line").cast("long")).alias("bytes_scanned"))

    obs = Observation("httpd_log_scan")
    return obs, logs.observe(obs, *metrics)
