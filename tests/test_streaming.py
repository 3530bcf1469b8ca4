"""Structured Streaming log source tests (file source, availableNow
trigger, memory sink)."""

import shutil

from pyspark.sql import functions as F

from duckdb_httpd_log_spark.streaming.log_stream import (
    read_httpd_log_stream,
    windowed_status_counts,
)

from .conftest import data


def _run_stream(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_parses_arriving_files(spark, tmp_path):
    logdir = tmp_path / "logs"
    logdir.mkdir()
    shutil.copy(data("common", "sample.log"), logdir / "a.log")
    shutil.copy(data("common", "with_errors.log"), logdir / "b.log")

    stream = read_httpd_log_stream(spark, str(logdir), format_type="common")
    assert stream.isStreaming
    _run_stream(stream, "stream_parse")
    out = spark.sql("SELECT * FROM stream_parse")
    # 6 valid lines in sample.log + 3 valid in with_errors.log
    assert out.count() == 9
    assert out.filter(F.col("status") == 200).count() >= 2
    assert "timestamp" in out.columns


def test_windowed_rollup(spark, tmp_path):
    logdir = tmp_path / "logs2"
    logdir.mkdir()
    shutil.copy(data("common", "sample.log"), logdir / "a.log")

    stream = read_httpd_log_stream(spark, str(logdir), format_type="common")
    agg = windowed_status_counts(stream, window="1 minute", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("stream_rollup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode with watermark only emits closed windows; re-run with a
    # complete-mode count to assert content deterministically
    out = spark.sql("SELECT * FROM stream_rollup")
    assert set(out.columns) == {
        "window_start",
        "window_end",
        "status",
        "n_requests",
        "total_bytes",
    }
