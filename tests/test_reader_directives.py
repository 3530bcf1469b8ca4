"""Second e2e batch: directives not covered in test_reader.py — server
names, peer host/IP, trailers, header collisions with data, duplicate
directives, status original/final values, %b/%B merge values, conf glob,
and observation metrics."""

from pyspark.sql import functions as F

from duckdb_httpd_log_spark import read_httpd_conf, read_httpd_log

from .conftest import data


def test_server_name_v_and_V(spark):
    df = read_httpd_log(
        spark,
        data("directives", "server_both.log"),
        format_str='%h %v %V %t "%r" %>s %b',
    )
    r = df.first()
    assert r.server_name == "canonical.example.com"
    assert r.server_name_used == "used.example.com"


def test_peer_ip_and_peer_host(spark):
    r = read_httpd_log(
        spark,
        data("directives", "peer_ip.log"),
        format_str='%h %{c}a %t "%r" %>s %b',
    ).first()
    assert (r.client_host, r.peer_ip) == ("192.168.1.100", "10.0.0.1")
    r = read_httpd_log(
        spark,
        data("directives", "hostname.log"),
        format_str='%h %{c}h %t "%r" %>s %b',
    ).first()
    assert (r.client_host, r.peer_host) == ("192.168.1.1", "10.0.0.1")


def test_status_original_and_final_values(spark):
    r = read_httpd_log(
        spark,
        data("directives", "status_both.log"),
        format_str='%h %t "%r" %s %b %>s',
    ).first()
    # %>s keeps `status`, %s becomes `status_original`
    assert (r.status, r.status_original) == (301, 200)


def test_bytes_b_and_B_merged(spark):
    df = read_httpd_log(
        spark,
        data("directives", "bytes_b_and_B.log"),
        format_str='%h %l %u %t "%r" %>s %b %B',
    )
    assert df.columns.count("bytes") == 1
    rows = df.orderBy("client_host").collect()
    # first occurrence (%b) wins; "-" -> 0
    assert [r.bytes for r in rows] == [2326, 0, 0]


def test_full_collision_chain_values(spark):
    df = read_httpd_log(
        spark,
        data("directives", "collision_test.log"),
        format_str="%h %{x}C %{x}e %{x}n %{x}^ti %{x}^to %{x}i %{x}o",
    )
    r = df.orderBy("client_host").first()
    assert r.x == "val_in"  # %i has the best (lowest) collision priority
    assert r.x_cookie == "val_cookie"
    assert r.x_env == "val_env"
    assert r.x_note == "val_note"
    assert r.x_trail_in == "val_trail_in"
    assert r.x_trail_out == "val_trail_out"
    assert r.x_out == "val_out"


def test_typed_header_collision_in_out(spark):
    df = read_httpd_log(
        spark,
        data("directives", "header_collision.log"),
        format_str='%h %l %u %t "%r" %>s %{Content-Length}i %{Content-Length}o',
    )
    rows = df.orderBy("client_host").collect()
    assert dict(df.dtypes)["content_length"] == "bigint"
    assert dict(df.dtypes)["content_length_out"] == "bigint"
    assert (rows[0].content_length, rows[0].content_length_out) == (1024, 2048)
    assert rows[1].content_length is None  # "-" -> NULL for typed headers


def test_duplicate_directive_values(spark, tmp_path):
    p = tmp_path / "dup.log"
    p.write_text("1.2.3.4 first second\n")
    r = read_httpd_log(spark, str(p), format_str="%h %{foo}i %{foo}i").first()
    assert (r.foo, r.foo_2) == ("first", "second")


def test_unknown_directive_value(spark, tmp_path):
    p = tmp_path / "unk.log"
    p.write_text("1.2.3.4 weird\n")
    r = read_httpd_log(spark, str(p), format_str="%h %Q").first()
    assert r.field_Q == "weird"


def test_conf_glob_multiple_files(spark, tmp_path):
    (tmp_path / "a.conf").write_text('LogFormat "%h %t" fmt_a\n')
    (tmp_path / "b.conf").write_text('LogFormat "%h %>s" fmt_b\n')
    df = read_httpd_conf(spark, str(tmp_path / "*.conf"))
    rows = df.orderBy("config_file").collect()
    assert [r.nickname for r in rows] == ["fmt_a", "fmt_b"]


def test_empty_file(spark, tmp_path):
    p = tmp_path / "empty.log"
    p.write_text("")
    df = read_httpd_log(spark, str(p), format_type="common")
    assert df.count() == 0
    df = read_httpd_log(spark, str(p), format_type="common", raw=True)
    assert df.count() == 0


def test_trailing_empty_lines_advance_line_number(spark, tmp_path):
    p = tmp_path / "gaps.log"
    line = '1.2.3.4 - - [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.0" 200 1\n'
    p.write_text(line + "\n" + "\n" + line)  # valid, empty, empty, valid
    df = read_httpd_log(spark, str(p), format_type="common", raw=True)
    rows = df.orderBy("line_number").collect()
    assert [r.line_number for r in rows] == [1, 4]  # empties counted, not emitted


def test_crlf_lines(spark, tmp_path):
    p = tmp_path / "crlf.log"
    p.write_bytes(
        b'1.2.3.4 - - [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.0" 200 10\r\n'
        b'1.2.3.5 - - [10/Oct/2000:13:55:37 -0700] "GET / HTTP/1.0" 200 20\r\n'
    )
    df = read_httpd_log(spark, str(p), format_type="common", raw=True)
    rows = df.orderBy("line_number").collect()
    assert len(rows) == 2 and not any(r.parse_error for r in rows)
    assert not rows[0].raw_line.endswith("\r")


def test_keepalive_and_ports_types(spark):
    df = read_httpd_log(
        spark, data("directives", "port.log"), format_str="%h %p %{local}p %{remote}p"
    )
    types = dict(df.dtypes)
    assert types["server_port"] == types["local_port"] == types["remote_port"] == "int"


def test_observe_metrics(spark):
    from duckdb_httpd_log_spark.plans.metrics import scan_metrics

    df = read_httpd_log(spark, data("common", "with_errors.log"), raw=True)
    obs, observed = scan_metrics(df)
    observed.collect()
    m = obs.get
    assert m["total_rows"] == 5
    assert m["parse_errors"] == 2
    assert m["files_processed"] == 1
