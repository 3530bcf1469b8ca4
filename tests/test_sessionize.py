"""Sessionization tests: batch semantics (lag/cumsum windows) and the
stateful streaming operator (applyInPandasWithState)."""

import shutil
import time

from pyspark.sql import functions as F

from duckdb_httpd_log_spark import read_httpd_log
from duckdb_httpd_log_spark.streaming.log_stream import read_httpd_log_stream
from duckdb_httpd_log_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

from .conftest import data


def test_batch_sessionize_gap_splits(spark):
    logs = read_httpd_log(spark, data("common", "sample.log"))
    # 30-minute gap: sample.log spans 13:55..14:00, so host 192.168.1.1
    # (hits at 13:55:36 and 14:00:15) stays one session at 30m...
    s30 = sessionize_batch(logs, gap_seconds=30 * 60)
    one = s30.filter(F.col("client_host") == "192.168.1.1").collect()
    assert len(one) == 1
    assert one[0].n_requests == 2
    assert one[0].total_bytes == 2326 + 5678
    # ...but splits into two sessions with a 60-second gap
    s1 = sessionize_batch(logs, gap_seconds=60)
    two = s1.filter(F.col("client_host") == "192.168.1.1").collect()
    assert len(two) == 2
    assert sorted(r.n_requests for r in two) == [1, 1]


def test_batch_sessionize_total_conservation(spark):
    logs = read_httpd_log(spark, data("common", "sample.log"))
    sessions = sessionize_batch(logs, gap_seconds=60)
    assert sessions.agg(F.sum("n_requests")).first()[0] == logs.count()


def test_stream_sessionize_emits_on_timeout(spark, tmp_path):
    logdir = tmp_path / "logs"
    logdir.mkdir()
    shutil.copy(data("common", "sample.log"), logdir / "a.log")

    stream = read_httpd_log_stream(spark, str(logdir), format_type="common")
    sessions = sessionize_stream(stream, gap_seconds=30 * 60, timeout_ms=100)

    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # first batch ingests data and arms the timeout; an (empty)
        # subsequent batch after the timeout emits the closed sessions
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM sessions_out").collect()
            if rows:
                break
            time.sleep(1)
        assert rows, "no sessions emitted before deadline"
        by_host = {r.client_host: r for r in rows}
        assert by_host["192.168.1.1"].n_requests == 2
        assert by_host["192.168.1.1"].total_bytes == 2326 + 5678
        # the stateful stream must agree with the batch twin exactly
        # (sample.log spans 5 minutes -> one session per host at 30m gap)
        batch = {
            r.client_host: (r.n_requests, r.total_bytes)
            for r in sessionize_batch(
                read_httpd_log(spark, data("common", "sample.log")), gap_seconds=30 * 60
            ).collect()
        }
        got = {r.client_host: (r.n_requests, r.total_bytes) for r in rows}
        assert got == batch
    finally:
        q.stop()
