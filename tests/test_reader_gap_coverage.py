"""Coverage for the reference test scenarios whose fixtures weren't yet
exercised by name: typed-header edge semantics, %v/%V and %s/%>s pairs,
%r-vs-individual collisions, %b zero/both, strftime-with-tz groups,
msec_frac combination, and error rows in combined/malformed inputs.

Reference cases: test/sql/directives/typed_headers.test:125-240,
duplicate_directives.test:40-160, query_string.test:20-60,
bytes_directives.test, timestamp_format.test.
"""

from pyspark.sql import functions as F

from duckdb_httpd_log_spark import read_httpd_log

from .conftest import data


def _types(df):
    return dict(df.dtypes)


# --- typed headers (typed_headers.test:125-240) ---------------------------
def test_typed_headers_mixed_schema_and_values(spark):
    df = read_httpd_log(
        spark,
        data("directives", "typed_headers_mixed.log"),
        format_str='%h %l %u %t "%r" %>s %{Content-Length}o %{Max-Forwards}i %{Age}o',
    )
    t = _types(df)
    assert (t["content_length"], t["max_forwards"], t["age"]) == ("bigint", "int", "int")
    rows = {r.client_host: r for r in df.collect()}
    assert (rows["192.168.1.1"].content_length, rows["192.168.1.1"].max_forwards,
            rows["192.168.1.1"].age) == (1024, 5, 3600)
    # dash -> NULL for non-bytes numeric headers
    assert (rows["192.168.1.2"].content_length, rows["192.168.1.2"].max_forwards,
            rows["192.168.1.2"].age) == (None, None, None)
    # zero is a valid value, not NULL
    assert (rows["192.168.1.3"].content_length, rows["192.168.1.3"].max_forwards,
            rows["192.168.1.3"].age) == (0, 10, 0)


def test_typed_headers_edge_cases(spark):
    df = read_httpd_log(
        spark,
        data("directives", "typed_headers_edge_cases.log"),
        format_str='%h %l %u %t "%r" %>s %{Content-Length}o',
    )
    assert df.filter(F.col("content_length").isNull()).count() == 2  # 'abc' and '-'
    rows = {r.client_host: r.content_length for r in df.collect()}
    assert rows["192.168.1.3"] == 9223372036854775807  # max BIGINT survives
    assert rows["192.168.1.4"] == -2147483648


def test_typed_headers_direction_sensitivity(spark):
    # Content-Length typed on both %i and %o; Age only on %o; Max-Forwards only on %i
    df_i = read_httpd_log(
        spark,
        data("directives", "typed_headers_request.log"),
        format_str='%h %t "%r" %>s %{Content-Length}i',
    )
    assert _types(df_i)["content_length"] == "bigint"
    df_age_i = read_httpd_log(
        spark, data("common", "sample.log"), format_str='%h %t "%r" %>s %{Age}i'
    )
    assert _types(df_age_i)["age"] == "string"
    df_mf_o = read_httpd_log(
        spark, data("common", "sample.log"), format_str='%h %t "%r" %>s %{Max-Forwards}o'
    )
    assert _types(df_mf_o)["max_forwards"] == "string"


# --- %v / %V pairs (duplicate_directives.test:40-81) ----------------------
def test_server_name_directives(spark):
    v_only = read_httpd_log(
        spark, data("directives", "server_v_only.log"), format_str='%h %v %t "%r" %>s %b'
    )
    assert "server_name" in v_only.columns
    V_only = read_httpd_log(
        spark, data("directives", "server_V_directive.log"), format_str='%h %V %t "%r" %>s %b'
    )
    assert "server_name" in V_only.columns
    both = read_httpd_log(
        spark, data("directives", "server_both.log"), format_str='%h %v %V %t "%r" %>s %b'
    )
    assert "server_name" in both.columns and "server_name_used" in both.columns
    r = both.collect()[0]
    assert r.server_name == "canonical.example.com"
    assert r.server_name_used == "used.example.com"


# --- %s / %>s original vs final (duplicate_directives.test:130-160) -------
def test_status_original_final_values(spark):
    df = read_httpd_log(
        spark, data("directives", "redirect.log"), format_str='%h %t "%r" %>s %b %s'
    )
    r = df.collect()[0]
    assert (r.status, r.status_original) == (200, 301)


def test_all_pairs_schema(spark):
    df = read_httpd_log(
        spark,
        data("directives", "all_pairs.log"),
        format_str='%h %v %V %t "%r" %>s %s %b %B',
    )
    cols = df.columns
    assert {"status", "status_original"} <= set(cols)
    assert {"server_name", "server_name_used"} <= set(cols)
    assert cols.count("bytes") == 1  # %b/%B collapse to one column


def test_single_status_variants(spark):
    for fixture, fmt in [
        ("status_s_only.log", '%h %l %u %t "%r" %s %b'),
        ("status_gt_s_only.log", '%h %l %u %t "%r" %>s %b'),
    ]:
        df = read_httpd_log(spark, data("directives", fixture), format_str=fmt)
        assert "status" in df.columns and "status_original" not in df.columns
        assert df.filter(F.col("status").isNotNull()).count() == df.count()


# --- %r vs individual directives (query_string.test:20-102) ---------------
def test_request_collision_single_columns(spark):
    df = read_httpd_log(
        spark,
        data("directives", "request_collision.log"),
        format_str='%h %l %u %t "%r" %>s %b %m %U %q %H',
    )
    for col in ("method", "path", "query_string", "protocol"):
        assert df.columns.count(col) == 1, col
    qs = sorted([r.query_string for r in df.collect()], key=lambda v: (v is None, v))
    assert qs == ["?q=test", None]  # NULL last, '?' kept


# --- bytes zero/both (bytes_directives.test) ------------------------------
def test_bytes_zero_not_null(spark):
    df = read_httpd_log(
        spark, data("directives", "bytes_with_zero.log"), format_str='%h %l %u %t "%r" %>s %b'
    )
    assert df.filter(F.col("bytes") == 0).count() == 2
    assert df.filter(F.col("bytes").isNull()).count() == 0


def test_bytes_both_first_occurrence_wins(spark):
    df = read_httpd_log(
        spark, data("directives", "bytes_both.log"), format_str='%h %t "%r" %>s %b %B'
    )
    assert df.columns.count("bytes") == 1
    assert df.collect()[0].bytes == 2326


# --- strftime with timezone; msec_frac group ------------------------------
def test_strftime_with_timezone_normalizes_utc(spark):
    df = read_httpd_log(
        spark,
        data("directives", "timestamp_strftime_tz.log"),
        format_str="%h %{%d/%b/%Y}t %{%T}t %{%z}t",
    )
    rows = {r.client_host: str(r.timestamp) for r in df.collect()}
    assert rows["192.168.1.1"] == "2021-01-01 20:55:36"  # -0700 -> UTC
    assert rows["192.168.1.2"] == "2021-12-31 23:59:59"  # +0000 unchanged


def test_msec_frac_group_combination(spark):
    df = read_httpd_log(
        spark,
        data("directives", "timestamp_frac.log"),
        format_str="%h %l %u %t %{msec_frac}t",
    )
    rows = {r.client_host: r.timestamp for r in df.collect()}
    assert rows["192.168.1.1"].microsecond == 123000
    assert rows["192.168.1.2"].microsecond == 456000


# --- error rows in combined / malformed inputs ----------------------------
def test_combined_with_errors_raw(spark):
    df = read_httpd_log(
        spark, data("combined", "combined_with_errors.log"), format_type="combined", raw=True
    )
    errs = [r.line_number for r in df.filter("parse_error").collect()]
    assert 2 in errs
    ok = df.filter(~F.col("parse_error"))
    assert ok.filter(F.col("status") == 201).count() == 1


def test_malformed_raw_error_accounting(spark):
    df = read_httpd_log(spark, data("edge_cases", "malformed.log"), format_type="common", raw=True)
    rows = sorted(df.collect(), key=lambda r: r.line_number)
    assert rows[0].parse_error and rows[0].raw_line.startswith("This is not")
    good = [r for r in rows if not r.parse_error]
    assert all(r.raw_line for r in rows)  # raw_line always populated
    assert len(good) >= 1 and good[0].status == 200


# --- input-shape robustness ----------------------------------------------
def test_read_directory_path(spark, tmp_path):
    """A directory argument reads every file under it (reference glob
    semantics accept directories via the multi-file layer)."""
    import shutil

    d = tmp_path / "logs"
    d.mkdir()
    shutil.copy(data("common", "sample.log"), d / "a.log")
    shutil.copy(data("common", "sample.log"), d / "b.log")
    df = read_httpd_log(spark, str(d), format_type="common")
    assert df.count() == 12
    assert df.select("log_file").distinct().count() == 2


def test_empty_file(spark, tmp_path):
    p = tmp_path / "empty.log"
    p.write_text("")
    df = read_httpd_log(spark, str(p), format_type="common")
    assert df.count() == 0
    assert "status" in df.columns  # schema intact with zero rows


def test_blank_lines_only_raw(spark, tmp_path):
    """A file of only blank lines: no rows, but the schema includes the
    raw metadata columns (blank lines advance the counter, emit nothing)."""
    p = tmp_path / "blank.log"
    p.write_text("\n\n\n")
    df = read_httpd_log(spark, str(p), format_type="common", raw=True)
    assert df.count() == 0
    assert {"line_number", "parse_error", "raw_line"} <= set(df.columns)


def test_missing_file_raises(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="No files found"):
        read_httpd_log(spark, str(tmp_path / "nope.log"), format_type="common")


def test_single_directive_format(spark, tmp_path):
    p = tmp_path / "one.log"
    p.write_text("10.0.0.1\n10.0.0.2\n")
    df = read_httpd_log(spark, str(p), format_str="%h")
    assert [r.client_host for r in df.orderBy("client_host").collect()] == [
        "10.0.0.1",
        "10.0.0.2",
    ]


def test_bzip2_matches_plain(spark, tmp_path):
    """bzip2 input decodes transparently — and unlike gzip it's a
    SPLITTABLE codec, so one big .bz2 file still parallelizes."""
    import bz2
    import shutil

    src = data("common", "sample.log")
    plain = read_httpd_log(spark, src, format_type="common")
    bz = tmp_path / "sample.log.bz2"
    with open(src, "rb") as fi, bz2.open(bz, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    compressed = read_httpd_log(spark, str(bz), format_type="common")
    a = sorted([tuple(r)[:-1] for r in plain.collect()])  # drop log_file
    b = sorted([tuple(r)[:-1] for r in compressed.collect()])
    assert a == b
