"""The reference README's documented analytics workflows, end-to-end
over our reader — SQL via temp view AND the DataFrame API, asserting
concrete values on the fixture logs (reference: README.md:34-145)."""

from pyspark.sql import functions as F

from duckdb_httpd_log_spark import read_httpd_log

from .conftest import data


def _logs(spark):
    df = read_httpd_log(spark, data("common", "sample.log"))
    df.createOrReplaceTempView("logs")
    return df


def test_select_limit(spark):
    """README.md:34-36 — projection + LIMIT."""
    _logs(spark)
    rows = spark.sql(
        "SELECT client_host, method, path, status, bytes FROM logs LIMIT 5"
    ).collect()
    assert len(rows) == 5
    assert all(r.method in ("GET", "POST") for r in rows)


def test_count_per_file(spark):
    """README.md:55-57 — per-file counts over a glob."""
    df = read_httpd_log(spark, data("multi_file", "server*.log"))
    got = {r.log_file.rsplit("/", 1)[-1]: r.n for r in
           df.groupBy("log_file").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) == {"server1.log", "server2.log", "server3.log"}
    assert all(n > 0 for n in got.values())


def test_status_count_ordered(spark):
    """README.md:97-101 — the flagship status rollup."""
    _logs(spark)
    rows = spark.sql(
        "SELECT status, COUNT(*) AS count FROM logs GROUP BY status "
        "ORDER BY count DESC, status"
    ).collect()
    assert rows[0].status == 200 and rows[0]["count"] == 2  # Row.count is the tuple method
    assert {r.status for r in rows} == {200, 201, 304, 403, 404}


def test_top_paths(spark):
    """README.md:118-122 — top paths by hits."""
    _logs(spark)
    rows = spark.sql(
        "SELECT path, COUNT(*) AS hits FROM logs GROUP BY path "
        "ORDER BY hits DESC, path LIMIT 5"
    ).collect()
    assert len(rows) == 5
    assert rows[0].hits >= rows[-1].hits


def test_top_user_agents_combined(spark):
    """README.md:140-145 — user-agent rollup on combined format."""
    df = read_httpd_log(spark, data("combined", "combined.log"), format_type="combined")
    rows = (
        df.groupBy("user_agent")
        .agg(F.count(F.lit(1)).alias("requests"))
        .orderBy(F.col("requests").desc(), "user_agent")
        .limit(3)
        .collect()
    )
    assert len(rows) >= 1 and all(r.user_agent for r in rows)


def test_duration_format(spark):
    """README.md:79-81 — custom format exposing request duration."""
    df = read_httpd_log(
        spark, data("directives", "duration.log"), format_str='%h %l %u %t "%r" %>s %b %D'
    )
    assert dict(df.dtypes)["duration"] == "interval day to second"
    assert df.filter(F.col("duration").isNotNull()).count() > 0


def test_register_log_view_sql_workflow(spark):
    """The reference's SQL-first idiom, one call away (README.md:97-101
    in /root/reference: status counts over an access log)."""
    from duckdb_httpd_log_spark import register_log_view

    register_log_view(spark, "logs_view", data("common", "sample.log"))
    rows = spark.sql(
        "SELECT status, COUNT(*) AS n FROM logs_view GROUP BY status ORDER BY n DESC, status"
    ).collect()
    assert [(r.status, r.n) for r in rows][0] == (200, 2)
    assert {r.status for r in rows} == {200, 201, 304, 403, 404}
