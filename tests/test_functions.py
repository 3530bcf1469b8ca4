"""Column-function library tests (duckdb_httpd_log_spark.functions)."""

from pyspark.sql import functions as F

from duckdb_httpd_log_spark import functions as H

from .conftest import data


def test_status_class_and_is_error(spark):
    df = spark.createDataFrame([(200,), (301,), (404,), (503,), (None,)], "status int")
    got = [
        (r.c, r.e)
        for r in df.select(
            H.status_class(F.col("status")).alias("c"), H.is_error(F.col("status")).alias("e")
        ).collect()
    ]
    assert got == [("2xx", False), ("3xx", False), ("4xx", True), ("5xx", True), (None, None)]


def test_apache_timestamp_utc(spark):
    df = spark.createDataFrame([("10/Oct/2000:13:55:36 -0700",)], "t string")
    row = df.select(H.apache_timestamp(F.col("t")).alias("ts")).collect()[0]
    assert str(row.ts) == "2000-10-10 20:55:36"


def test_strftime_timestamp(spark):
    df = spark.createDataFrame([("2024-03-01 10:20:30",)], "t string")
    row = df.select(H.strftime_timestamp(F.col("t"), "%Y-%m-%d %H:%M:%S").alias("ts")).collect()[0]
    assert str(row.ts) == "2024-03-01 10:20:30"


def test_path_helpers(spark):
    df = spark.createDataFrame(
        [("/a/b/c.HTML", "?q=1&page=2"), ("/", None)], "path string, qs string"
    )
    rows = df.select(
        H.url_path_depth(F.col("path")).alias("d"),
        H.path_extension(F.col("path")).alias("x"),
        H.query_param(F.col("qs"), "page").alias("p"),
    ).collect()
    assert (rows[0].d, rows[0].x, rows[0].p) == (3, "html", "2")
    assert (rows[1].d, rows[1].x, rows[1].p) == (0, None, None)


def test_bytes_ip_bot(spark):
    df = spark.createDataFrame(
        [(512, "10.1.2.3", "Mozilla/5.0"), (5 * 1024 * 1024, "192.168.1.77", "Googlebot/2.1")],
        "b long, ip string, ua string",
    )
    rows = df.select(
        H.human_bytes(F.col("b")).alias("hb"),
        H.ip_prefix(F.col("ip")).alias("px"),
        H.is_bot(F.col("ua")).alias("bot"),
    ).collect()
    assert (rows[0].hb, rows[0].px, rows[0].bot) == ("512 B", "10.1.2", False)
    assert (rows[1].hb, rows[1].px, rows[1].bot) == ("5.0 MiB", "192.168.1", True)


def test_interval_micros(spark):
    df = spark.createDataFrame([(1500000,)], "us long").select(
        H.interval_micros(F.expr("us * INTERVAL '0.000001' SECOND")).alias("us")
    )
    assert df.collect()[0].us == 1500000


def test_ua_family(spark):
    from duckdb_httpd_log_spark.functions import ua_family

    rows = [
        ("Mozilla/5.0 (X11) Gecko/20100101 Firefox/118.0", "firefox"),
        ("Mozilla/5.0 AppleWebKit/537.36 Chrome/118.0 Safari/537.36", "chrome"),
        ("Mozilla/5.0 AppleWebKit/605.1.15 Version/17.0 Safari/605.1.15", "safari"),
        ("Mozilla/5.0 Chrome/118.0 Safari/537.36 Edg/118.0", "edge"),
        ("Googlebot/2.1 (+http://www.google.com/bot.html)", "bot"),
        ("Mozilla/5.0 (compatible; bingbot/2.0) Chrome/118 Safari/537", "bot"),
        ("curl/8.1.2", "cli"),
        ("python-requests/2.31.0", "cli"),
        ("Mozilla/4.0 (compatible; MSIE 8.0; Trident/4.0)", "ie"),
        ("-", "unknown"),
        (None, "unknown"),
        ("SomethingElse/1.0", "other"),
    ]
    df = spark.createDataFrame([(ua,) for ua, _ in rows], ["ua"])
    got = [r.fam for r in df.select(ua_family(F.col("ua")).alias("fam")).collect()]
    assert got == [want for _, want in rows]


# ---------------------------------------------------------------------------
# Python UDTFs (Spark 4 row-expanding SQL surface)
# ---------------------------------------------------------------------------
def test_udtf_explode_query_params(spark):
    from duckdb_httpd_log_spark.functions import register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM explode_query_params('?a=1&b=hello%20world&flag')"
    ).collect()
    assert [(r.param_key, r.param_value) for r in rows] == [
        ("a", "1"),
        ("b", "hello world"),
        ("flag", None),
    ]


def test_udtf_lateral_join_over_logs(spark):
    from duckdb_httpd_log_spark import read_httpd_log
    from duckdb_httpd_log_spark.functions import register_udtfs

    register_udtfs(spark)
    logs = read_httpd_log(spark, data("common", "sample.log"))
    logs.createOrReplaceTempView("udtf_logs")
    rows = spark.sql(
        """
        SELECT l.path, s.segment, s.depth
        FROM udtf_logs l, LATERAL explode_path_segments(l.path) s
        ORDER BY l.path, s.depth
        """
    ).collect()
    assert ("images", 1) in {(r.segment, r.depth) for r in rows}
    assert ("logo.png", 2) in {(r.segment, r.depth) for r in rows}
    # every segment row reassembles into a prefix of its path
    for r in rows:
        assert r.segment in r.path


def test_udtf_empty_and_none_inputs(spark):
    from duckdb_httpd_log_spark.functions import register_udtfs

    register_udtfs(spark)
    assert spark.sql("SELECT * FROM explode_query_params('')").count() == 0
    assert spark.sql("SELECT * FROM explode_query_params(CAST(NULL AS STRING))").count() == 0
    assert spark.sql("SELECT * FROM explode_path_segments('/')").count() == 0
