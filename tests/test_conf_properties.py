"""Property-based tests for the httpd.conf parser (tokenizer, line
continuation, quoting) — driver-side only, no SparkSession needed."""

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_httpd_log_spark.sources.conf import parse_config_file, tokenize_line

# format strings: printable, no newline; quotes/backslashes exercised via
# explicit escaping below
fmt_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, exclude_characters='"\\'),
    min_size=1,
    max_size=40,
)
nickname = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12)


def test_tokenize_quotes_and_escapes():
    assert tokenize_line('a "b c" d') == ["a", "b c", "d"]
    assert tokenize_line('"%h \\"%r\\" %b" nick') == ['%h "%r" %b', "nick"]
    assert tokenize_line("  spaced\t\ttabs  ") == ["spaced", "tabs"]
    assert tokenize_line('""') == [""]


@given(fmt=fmt_text, nick=nickname)
@settings(max_examples=100, deadline=None, derandomize=True)
def test_logformat_roundtrip(tmp_path_factory, fmt, nick):
    """A LogFormat line's quoted format string comes back verbatim, with
    the nickname attached and the right type."""
    p = tmp_path_factory.mktemp("conf") / "httpd.conf"
    p.write_text(f'LogFormat "{fmt}" {nick}\nLogFormat "{fmt}"\n')
    entries = parse_config_file(str(p))
    assert len(entries) == 2
    named, default = entries
    assert (named.format_string, named.nickname, named.format_type) == (fmt, nick, "named")
    assert (default.format_string, default.format_type) == (fmt, "default")
    assert (named.line_number, default.line_number) == (1, 2)


@given(fmt=fmt_text)
@settings(max_examples=50, deadline=None, derandomize=True)
def test_continuation_joins_with_space(tmp_path_factory, fmt):
    """A trailing backslash continues the logical line; the entry keeps
    the FIRST physical line's number (reference parity)."""
    p = tmp_path_factory.mktemp("conf") / "httpd.conf"
    p.write_text(f'# leading comment\nLogFormat \\\n"{fmt}" cont\n')
    entries = parse_config_file(str(p))
    assert len(entries) == 1
    assert entries[0].format_string == fmt
    assert entries[0].nickname == "cont"
    assert entries[0].line_number == 2


def test_customlog_nickname_ref_skipped(tmp_path):
    p = tmp_path / "httpd.conf"
    p.write_text(
        'CustomLog "/var/log/access.log" combined\n'
        'CustomLog "/var/log/x.log" "%h %l %u %t"\n'
        "ErrorLog /var/log/error.log\n"
    )
    entries = parse_config_file(str(p))
    assert len(entries) == 1  # only the inline-quoted one
    assert entries[0].format_type == "inline"
    assert entries[0].format_string == "%h %l %u %t"


def test_case_insensitive_directives(tmp_path):
    p = tmp_path / "httpd.conf"
    p.write_text('logformat "%h" lower\nLOGFORMAT "%b" upper\n')
    entries = parse_config_file(str(p))
    assert [e.nickname for e in entries] == ["lower", "upper"]
