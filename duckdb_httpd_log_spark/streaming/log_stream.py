"""Structured Streaming variant of the httpd log source.

The reference engine is strictly batch (no streaming surface exists in
saygox/duckdb-httpd-log); this is a beyond-reference extension: the
same bind-time format compilation and the same Catalyst projection
applied to `spark.readStream.text`, so a directory of arriving log
files becomes an incrementally processed stream. Watermarked windowed
aggregation gives the classic "status counts per minute" rollup with
late-data tolerance.

Raw mode is not offered on the stream path: per-file line numbers
require whole-file ordering, which contradicts incremental splittable
ingestion. (Batch `read_httpd_log(raw=True)` remains the tool for
forensics.)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import exprs as X
from ..sources.logformat import COMBINED_FORMAT, COMMON_FORMAT, parse_format_string
from ..sources.reader import _normalize_file_uri, _projection


def read_httpd_log_stream(
    spark: SparkSession,
    path: str,
    format_type: Optional[str] = None,
    format_str: Optional[str] = None,
) -> DataFrame:
    """Streaming httpd log source. `path` is a directory watched for new
    files; format must be given explicitly (no sampling probe on an
    unbounded source)."""
    if format_str is None:
        if format_type == "combined":
            format_str = COMBINED_FORMAT
        elif format_type in ("common", None):
            format_str = COMMON_FORMAT
        else:
            raise ValueError(f"Invalid format_type '{format_type}' for streaming read")
    parsed = parse_format_string(format_str)

    df = spark.readStream.text(path)
    df = df.filter(F.length("value") > 0)
    ok, parts = X.mark_and_split(F.col("value"), parsed.regex_pattern, parsed.num_capture_groups)
    cols = _projection(parsed, ok, parts)
    cols.append(_normalize_file_uri(F.input_file_name()).alias("log_file"))
    return df.withColumn("__ok", ok).filter(F.col("__ok")).select(*cols)


def windowed_status_counts(
    logs: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Watermarked tumbling-window rollup: requests and error counts per
    (window, status). Late rows beyond the watermark are dropped —
    bounded state at any scale."""
    return (
        logs.withWatermark("timestamp", watermark)
        .groupBy(F.window("timestamp", window).alias("w"), "status")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum(F.col("bytes")).alias("total_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "status",
            "n_requests",
            "total_bytes",
        )
    )
