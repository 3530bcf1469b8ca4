"""write_httpd_log: the inverse formatter. Core contract is the
round-trip property — read(write(read(x))) == read(x) — plus the exact
inverse of the reader's NULL/zero/remap quirks."""

import glob

import pytest
from pyspark.sql import functions as F

from duckdb_httpd_log_spark import read_httpd_log, write_httpd_log

from .conftest import data


def _read_back(spark, outdir, fmt):
    return read_httpd_log(spark, f"{outdir}/part-*.txt", format_type=fmt)


def _rows_no_file(df):
    return sorted(map(str, df.drop("log_file").collect()))


@pytest.mark.parametrize("fmt", ["common", "combined"])
def test_round_trip_sample(spark, tmp_path, fmt):
    src = read_httpd_log(spark, data("common", "sample.log"), format_type=fmt) \
        if fmt == "common" else None
    if src is None:
        # synthesize combined rows by reading a combined-format fixture
        lines = [
            '1.2.3.4 - alice [10/Oct/2024:13:55:36 +0000] "GET /api/x?q=1 HTTP/1.1" 500 123 "-" "curl/8"',
            '9.9.9.9 - - [10/Oct/2024:13:55:38 -0700] "POST /api/z HTTP/1.1" 404 0 "http://r" "Mozilla/5.0 (X11)"',
        ]
        p = tmp_path / "in.log"
        p.write_text("\n".join(lines) + "\n")
        src = read_httpd_log(spark, str(p), format_type="combined")
    out = str(tmp_path / f"out_{fmt}")
    write_httpd_log(src, out, format_type=fmt)
    back = _read_back(spark, out, fmt)
    assert _rows_no_file(back) == _rows_no_file(src)
    assert back.count() > 0


def test_bytes_zero_round_trips_as_dash(spark, tmp_path):
    # %b: 0 bytes must render "-" (Apache semantics), and parse back to 0
    p = tmp_path / "z.log"
    p.write_text('1.1.1.1 - u [10/Oct/2024:13:55:36 +0000] "GET /a HTTP/1.1" 304 -\n')
    src = read_httpd_log(spark, str(p), format_type="common")
    assert src.collect()[0].bytes == 0
    out = str(tmp_path / "zout")
    write_httpd_log(src, out, format_type="common")
    txt = open(glob.glob(f"{out}/part-*.txt")[0]).read()
    assert " 304 -" in txt
    assert _rows_no_file(_read_back(spark, out, "common")) == _rows_no_file(src)


def test_null_fields_render_dashes(spark, tmp_path):
    p = tmp_path / "n.log"
    p.write_text('2.2.2.2 - - [10/Oct/2024:13:55:36 +0000] "GET /x HTTP/1.1" 200 5\n')
    src = read_httpd_log(spark, str(p), format_type="common")
    out = str(tmp_path / "nout")
    write_httpd_log(src, out, format_type="common")
    txt = open(glob.glob(f"{out}/part-*.txt")[0]).read()
    assert txt.startswith("2.2.2.2 - - [")
    assert _rows_no_file(_read_back(spark, out, "common")) == _rows_no_file(src)


def test_offset_timestamps_render_session_zone_instant(spark, tmp_path):
    # a -0700 input line round-trips to the same INSTANT (+0000 text)
    p = tmp_path / "tz.log"
    p.write_text('3.3.3.3 - u [10/Oct/2024:13:55:36 -0700] "GET /t HTTP/1.1" 200 7\n')
    src = read_httpd_log(spark, str(p), format_type="common")
    out = str(tmp_path / "tzout")
    write_httpd_log(src, out, format_type="common")
    txt = open(glob.glob(f"{out}/part-*.txt")[0]).read()
    assert "[10/Oct/2024:20:55:36 +0000]" in txt
    assert _rows_no_file(_read_back(spark, out, "common")) == _rows_no_file(src)


def test_round_trip_generated_corpus(spark, tmp_path):
    """Property over a generated 3k-line corpus: read -> write -> read
    is identity on every typed column."""
    import random

    rng = random.Random(5)
    p = tmp_path / "gen.log"
    with open(p, "w") as fh:
        for i in range(3000):
            q = "?page=2" if i % 7 == 0 else ""
            ua = rng.choice(['curl/8', 'Mozilla/5.0 (X11; Linux)', '-'])
            ref = rng.choice(['-', 'http://example.com/a b'])
            fh.write(
                f"10.{rng.randrange(256)}.0.{rng.randrange(9)} - "
                f"{rng.choice(['-', 'u' + str(i % 17)])} "
                f"[{1 + i % 28:02d}/Oct/2024:{i % 24:02d}:{i % 60:02d}:{rng.randrange(60):02d} +0000] "
                f'"{rng.choice(["GET", "POST"])} /p/{i % 50}{q} HTTP/1.1" '
                f"{rng.choice([200, 304, 404, 500])} {rng.choice([0, 17, 99999])} "
                f'"{ref}" "{ua}"\n'
            )
    src = read_httpd_log(spark, str(p), format_type="combined")
    out = str(tmp_path / "genout")
    write_httpd_log(src, out, format_type="combined")
    back = _read_back(spark, out, "combined")
    assert _rows_no_file(back) == _rows_no_file(src)


def test_gzip_output(spark, tmp_path):
    p = tmp_path / "g.log"
    p.write_text('4.4.4.4 - u [10/Oct/2024:13:55:36 +0000] "GET /g HTTP/1.1" 200 9\n')
    src = read_httpd_log(spark, str(p), format_type="common")
    out = str(tmp_path / "gzout")
    write_httpd_log(src, out, format_type="common", compression="gzip")
    assert glob.glob(f"{out}/part-*.txt.gz")
    back = read_httpd_log(spark, f"{out}/part-*.txt.gz", format_type="common")
    assert _rows_no_file(back) == _rows_no_file(src)


def test_unsupported_format_raises(spark):
    df = None
    # %U (week-of-year) has no deterministic inverse rendering; the
    # validation must fire BEFORE any IO (df is never touched)
    with pytest.raises(ValueError):
        write_httpd_log(df, "/tmp/x", format_str="%{%U %H:%M}t %h")


def test_streaming_writer_round_trips(spark, tmp_path):
    from duckdb_httpd_log_spark.sources.writer import write_httpd_log_stream
    from duckdb_httpd_log_spark.streaming.log_stream import read_httpd_log_stream

    indir = tmp_path / "sin"
    indir.mkdir()
    (indir / "a.log").write_text(
        '5.5.5.5 - u [10/Oct/2024:13:55:36 +0000] "GET /s HTTP/1.1" 200 11\n'
        '6.6.6.6 - - [10/Oct/2024:13:55:37 +0000] "POST /t HTTP/1.1" 404 0\n'
    )
    stream = read_httpd_log_stream(spark, str(indir), format_type="common")
    out = str(tmp_path / "sout")
    q = write_httpd_log_stream(
        stream.drop("log_file").withColumn("log_file", F.lit("x")),
        out,
        checkpoint=str(tmp_path / "ckpt"),
        format_type="common",
    )
    q.processAllAvailable()
    q.stop()
    back = read_httpd_log(spark, f"{out}/part-*", format_type="common")
    src = read_httpd_log(spark, str(indir), format_type="common")
    assert _rows_no_file(back) == _rows_no_file(src)


def test_interval_round_trip_us_exact(spark, tmp_path):
    # ADVICE r10 (high): interval->long truncates to SECONDS; rendering
    # must go through exact microseconds. 2,500,000us under %D must
    # write "2500000" (not "2"), and %T must write "2" (not "0").
    fmt = '%h %l %u %t "%r" %>s %b %D'
    src = read_httpd_log(spark, data("directives", "duration.log"), format_str=fmt)
    out = str(tmp_path / "dur_us")
    write_httpd_log(src, out, format_str=fmt)
    txt = open(glob.glob(f"{out}/part-*.txt")[0]).read()
    rendered = sorted(int(line.rsplit(" ", 1)[1]) for line in txt.splitlines())
    assert rendered == [250, 50000, 1500000]
    back = read_httpd_log(spark, f"{out}/part-*.txt", format_str=fmt)
    assert _rows_no_file(back) == _rows_no_file(src)


@pytest.mark.parametrize(
    "fixture,fmt,expected",
    [
        ("duration_sec.log", '%h %l %u %t "%r" %>s %b %T', [0, 2, 5]),
        ("duration_unit.log", '%h %l %u %t "%r" %>s %b %{ms}T', [50, 250, 1500]),
    ],
)
def test_interval_round_trip_T_units(spark, tmp_path, fixture, fmt, expected):
    src = read_httpd_log(spark, data("directives", fixture), format_str=fmt)
    out = str(tmp_path / f"dur_{fixture.replace('.', '_')}")
    write_httpd_log(src, out, format_str=fmt)
    txt = open(glob.glob(f"{out}/part-*.txt")[0]).read()
    rendered = sorted(int(line.rsplit(" ", 1)[1]) for line in txt.splitlines())
    assert rendered == expected
    back = read_httpd_log(spark, f"{out}/part-*.txt", format_str=fmt)
    assert _rows_no_file(back) == _rows_no_file(src)


def test_conditional_directive_renders_clean(spark, tmp_path):
    # ADVICE r10 (low): the walker must consume the stripped status
    # condition text ('%400s' / '%!200,304s') instead of emitting it as
    # literal garbage in every line.
    fmt = "%h %400s %b"
    p = tmp_path / "c.log"
    p.write_text("7.7.7.7 400 123\n7.7.7.8 - 9\n")
    src = read_httpd_log(spark, str(p), format_str=fmt)
    out = str(tmp_path / "cout")
    write_httpd_log(src, out, format_str=fmt)
    txt = open(glob.glob(f"{out}/part-*.txt")[0]).read()
    assert sorted(txt.splitlines()) == ["7.7.7.7 400 123", "7.7.7.8 - 9"]
    fmt2 = "%h %!200,304s %b"
    src2 = read_httpd_log(spark, str(p), format_str=fmt2)
    out2 = str(tmp_path / "cout2")
    write_httpd_log(src2, out2, format_str=fmt2)
    txt2 = open(glob.glob(f"{out2}/part-*.txt")[0]).read()
    assert sorted(txt2.splitlines()) == ["7.7.7.7 400 123", "7.7.7.8 - 9"]


def test_batch_stream_line_parity(spark, tmp_path):
    # the streaming twin must render byte-identical lines to the batch
    # writer for the same rows
    from duckdb_httpd_log_spark.sources.writer import write_httpd_log_stream
    from duckdb_httpd_log_spark.streaming.log_stream import read_httpd_log_stream

    indir = tmp_path / "pin"
    indir.mkdir()
    (indir / "a.log").write_text(
        '8.8.8.8 - u [10/Oct/2024:13:55:36 +0000] "GET /p?a=1 HTTP/1.1" 200 11\n'
        '9.9.9.9 - - [11/Oct/2024:03:05:07 +0000] "POST /q HTTP/1.1" 404 0\n'
    )
    bout = str(tmp_path / "bout")
    write_httpd_log(
        read_httpd_log(spark, str(indir), format_type="common"), bout,
        format_type="common",
    )
    sout = str(tmp_path / "sout2")
    q = write_httpd_log_stream(
        read_httpd_log_stream(spark, str(indir), format_type="common"),
        sout,
        checkpoint=str(tmp_path / "ck2"),
        format_type="common",
    )
    q.processAllAvailable()
    q.stop()

    def lines(d):
        out = []
        for f in glob.glob(f"{d}/part-*"):
            out.extend(open(f).read().splitlines())
        return sorted(out)

    assert lines(bout) == lines(sout) != []


@pytest.mark.parametrize(
    "sfmt,sample",
    [
        ("%Y-%m-%d %H:%M:%S", "2024-10-10 13:55:36"),
        ("%d/%b/%Y:%H:%M:%S %z", "10/Oct/2024:13:55:36 +0000"),
        # discarded-on-read tokens: %a weekday, %Z zone name — the
        # writer renders deterministic text the reader re-accepts
        ("%a, %d %b %Y %H:%M:%S %Z", "Thu, 10 Oct 2024 13:55:36 UTC"),
        # %e space-padded day and fractional %f
        ("%Y-%m-%dT%H:%M:%S.%f", "2024-10-10T13:55:36.123456"),
    ],
)
def test_strftime_t_round_trips(spark, tmp_path, sfmt, sample):
    # r10 verdict item 4: strftime %t renders via the inverted
    # translate_strftime table; read(write(read(x))) == read(x)
    fmt = f"%h %{{{sfmt}}}t %>s"
    p = tmp_path / "s.log"
    p.write_text(f"1.2.3.4 {sample} 200\n5.6.7.8 {sample} 404\n")
    src = read_httpd_log(spark, str(p), format_str=fmt)
    assert src.filter(F.col("timestamp").isNull()).count() == 0, "fixture must parse"
    out = str(tmp_path / "sout")
    write_httpd_log(src, out, format_str=fmt)
    back = read_httpd_log(spark, f"{out}/part-*.txt", format_str=fmt)
    assert _rows_no_file(back) == _rows_no_file(src)


def _read_back_fmt(spark, outdir, fmt):
    return read_httpd_log(spark, f"{outdir}/part-*.txt", format_str=fmt)


def test_strftime_round_trip_values(spark, tmp_path):
    fmt = "%h %{%Y-%m-%d %H:%M:%S}t %>s %b"
    p = tmp_path / "v.log"
    p.write_text(
        "1.1.1.1 2024-10-10 13:55:36 200 10\n"
        "2.2.2.2 2024-12-31 23:59:59 404 -\n"
    )
    src = read_httpd_log(spark, str(p), format_str=fmt)
    out = str(tmp_path / "vout")
    write_httpd_log(src, out, format_str=fmt)
    back = _read_back_fmt(spark, out, fmt)
    assert _rows_no_file(back) == _rows_no_file(src)


def test_strftime_discard_tokens_round_trip_typed(spark, tmp_path):
    fmt = "%h %{%a, %d %b %Y %H:%M:%S %Z}t %>s"
    p = tmp_path / "d.log"
    p.write_text("1.1.1.1 Thu, 10 Oct 2024 13:55:36 GMT 200\n")
    src = read_httpd_log(spark, str(p), format_str=fmt)
    assert src.collect()[0].timestamp is not None
    out = str(tmp_path / "dout")
    write_httpd_log(src, out, format_str=fmt)
    txt = open(glob.glob(f"{out}/part-*.txt")[0]).read()
    # weekday re-derived from the date; zone renders the session zone
    assert "Thu, 10 Oct 2024 13:55:36 UTC" in txt
    back = _read_back_fmt(spark, out, fmt)
    assert _rows_no_file(back) == _rows_no_file(src)


def test_frac_only_ts_group_raises(spark):
    # a frac-only group's combined column is always NULL on read —
    # nothing to render (multi-field groups themselves write since r12)
    with pytest.raises(ValueError):
        write_httpd_log(None, "/tmp/x", format_str="%{msec_frac}t %h")


def _rt_fmt(spark, tmp_path, fmt, lines, tag):
    src_p = tmp_path / f"{tag}.log"
    src_p.write_text("\n".join(lines) + "\n")
    src = read_httpd_log(spark, str(src_p), format_str=fmt)
    assert src.filter(F.col(src.columns[1]).isNull()).count() == 0
    out = str(tmp_path / f"{tag}_out")
    write_httpd_log(src, out, format_str=fmt)
    back = read_httpd_log(spark, f"{out}/part-*.txt", format_str=fmt)
    assert _rows_no_file(back) == _rows_no_file(src), tag
    return out


def test_multifield_group_apache_plus_msec_frac_round_trips(spark, tmp_path):
    # r12: %t %{msec_frac}t — the frac token carries exactly the µs
    # remainder the bracketed seconds render drops
    out = _rt_fmt(
        spark, tmp_path, "%h %t %{msec_frac}t %>s",
        ['1.1.1.1 [10/Oct/2024:13:55:36 +0000] 123 200',
         '1.1.1.2 [10/Oct/2024:13:55:37 +0000] 045 404'],
        "msecfrac",
    )
    txt = open(glob.glob(f"{out}/part-*.txt")[0]).read()
    assert " 123 " in txt and " 045 " in txt  # zero-padded \d{3} token


def test_multifield_group_epoch_plus_usec_frac_round_trips(spark, tmp_path):
    _rt_fmt(
        spark, tmp_path, "%h %{sec}t %{usec_frac}t %>s",
        ['2.2.2.2 1728568536 123456 200', '2.2.2.3 1728568537 000042 404'],
        "usecfrac",
    )
    # epoch-msec base: the frac renders only the remainder the msec
    # base does NOT already carry (000456, not 123456)
    out = _rt_fmt(
        spark, tmp_path, "%h %{msec}t %{usec_frac}t %>s",
        ['3.3.3.3 1728568536123 000456 200'],
        "msecbase",
    )
    txt = open(glob.glob(f"{out}/part-*.txt")[0]).read()
    assert " 1728568536123 000456 " in txt


def test_multifield_group_split_strftime_round_trips(spark, tmp_path):
    # two strftime %t fields in ONE group (date part + time part) both
    # render from the single combined column
    _rt_fmt(
        spark, tmp_path, "%h %{%Y-%m-%d}t %{%H:%M:%S}t %>s",
        ['4.4.4.4 2024-10-08 13:55:36 200', '4.4.4.5 2024-10-09 01:02:03 404'],
        "splitsf",
    )


def test_begin_end_ts_pair_round_trips(spark, tmp_path):
    # begin/end %t fields form SEPARATE groups/columns
    # (timestamp_original / timestamp) — both must render
    _rt_fmt(
        spark, tmp_path, "%h %{begin:%Y-%m-%d %H:%M:%S}t %{end:sec}t %>s",
        ['5.5.5.5 2024-10-08 13:55:36 1728568536 200'],
        "beginend",
    )


_POOL_VALUES = {
    "%h": "10.1.2.3",
    "%l": "-",
    "%u": "alice",
    "%>s": "404",
    "%s": "200",
    "%b": "512",
    "%B": "512",
    "%D": "2500000",
    "%T": "3",
    "%{ms}T": "250",
    "%k": "2",
    "%X": "+",
    "%v": "vhost.example",
    "%{User-Agent}i": "curl/8",
    "%{Referer}i": "http://r/x",
}
_TS_VALUES = {
    "%t": "[10/Oct/2024:13:55:36 +0000]",
    "%{sec}t": "1727740800",
    "%{msec}t": "1727740800123",
    "%{usec}t": "1727740800123456",
    "%{%Y-%m-%d %H:%M:%S}t": "2024-10-01 12:30:45",
    "%{%d/%b/%Y %H:%M:%S %z}t": "01/Oct/2024 12:30:45 +0000",
}


def test_writer_random_format_round_trip_sweep(spark, tmp_path):
    """Seeded sweep over random supported formats (every writer family
    incl. the r11 strftime/epoch %t flavors): read -> write -> read is
    identity on the typed rows for each generated format."""
    import random

    rng = random.Random(411)
    quoted_ok = {"%{User-Agent}i", "%{Referer}i"}
    pool = list(_POOL_VALUES)
    for case in range(12):
        n = rng.randrange(2, 6)
        fields = rng.sample(pool, n)
        ts = rng.choice(list(_TS_VALUES))
        fields.insert(rng.randrange(len(fields) + 1), ts)
        fmt_parts, val_parts = [], []
        for f in fields:
            v = _TS_VALUES.get(f, _POOL_VALUES.get(f))
            if f in quoted_ok and rng.random() < 0.5:
                fmt_parts.append(f'"{f}"')
                val_parts.append(f'"{v}"')
            else:
                fmt_parts.append(f)
                val_parts.append(v)
        fmt = " ".join(fmt_parts)
        line = " ".join(val_parts)
        p = tmp_path / f"rt{case}.log"
        p.write_text(line + "\n")
        src = read_httpd_log(spark, str(p), format_str=fmt)
        assert src.count() == 1, (fmt, line)
        out = str(tmp_path / f"rtout{case}")
        write_httpd_log(src, out, format_str=fmt)
        back = read_httpd_log(spark, f"{out}/part-*.txt", format_str=fmt)
        assert _rows_no_file(back) == _rows_no_file(src), (fmt, line)


def test_strftime_e_day_round_trips_single_digit(spark, tmp_path):
    # review fix: %e must render a 2-char day ('dd') — a 1-digit render
    # fails the reader's [\s\d]\d regex and silently drops the row
    fmt = "%h %{%e/%b/%Y %H:%M:%S}t %>s"
    p = tmp_path / "e.log"
    # the reader accepts the 2-char zero-padded %e form ("05"); the
    # classic " 5" pad can't follow the possessive \s++ separator
    p.write_text(
        "1.1.1.1 05/Oct/2024 13:55:36 200\n"
        "2.2.2.2 15/Oct/2024 13:55:36 404\n"
    )
    src = read_httpd_log(spark, str(p), format_str=fmt)
    assert src.filter(F.col("timestamp").isNull()).count() == 0
    out = str(tmp_path / "eout")
    write_httpd_log(src, out, format_str=fmt)
    back = read_httpd_log(spark, f"{out}/part-*.txt", format_str=fmt)
    assert back.count() == 2
    assert _rows_no_file(back) == _rows_no_file(src)


def test_strftime_Z_offset_session_zone_raises(spark, tmp_path):
    # 'zzz' under an offset-style session zone renders 'GMT+05:30',
    # which the reader's %Z discard regex rejects — the writer must
    # raise up front instead of producing an unreadable corpus
    p = tmp_path / "z.log"
    p.write_text("1.1.1.1 2024-10-08 13:55:36 UTC 200\n")
    fmt = "%h %{%Y-%m-%d %H:%M:%S %Z}t %>s"
    src = read_httpd_log(spark, str(p), format_str=fmt)
    spark.conf.set("spark.sql.session.timeZone", "GMT+05:30")
    try:
        with pytest.raises(ValueError, match="zone NAMES only"):
            write_httpd_log(src, str(tmp_path / "zout"), format_str=fmt)
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # a NAMED zone still renders fine
    write_httpd_log(src, str(tmp_path / "zok"), format_str=fmt)
    back = read_httpd_log(spark, str(tmp_path / "zok") + "/part-*.txt", format_str=fmt)
    assert _rows_no_file(back) == _rows_no_file(src)


def test_epoch_base_floor_consistent_with_frac(spark, tmp_path):
    # review fix: the epoch base render must FLOOR (like the frac
    # pmod), not truncate toward zero — a positive-instant round trip
    # exercises the (us - pmod) div unit form end-to-end
    _rt_fmt(
        spark, tmp_path, "%h %{msec}t %{usec_frac}t %>s",
        ['9.9.9.9 1728568536999 000999 200'],
        "floorbase",
    )
