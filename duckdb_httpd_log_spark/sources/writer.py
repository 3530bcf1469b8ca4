"""CLF/combined log WRITER — the inverse of the format compiler.

``write_httpd_log(df, path, format_type=...)`` renders a typed log
DataFrame back into Apache access-log text, inverting the reader's
conversion rules exactly (NULL -> "-", the %b zero -> "-" quirk, %X's
remap, request-line reassembly, the fixed %t layout in the session
zone's +0000 form). Beyond-reference surface (the reference is
read-only): useful as a text SINK for curated pipelines, for
generating synthetic corpora at cluster scale, and as the round-trip
property anchor — ``read(write(read(x))) == read(x)`` is pinned in
tests/test_writer.py.

Everything is a single Catalyst ``concat`` projection: one codegen'd
expression per line, no Python on the row path, splittable text write.
Supported directives are the reader's VARCHAR/INTEGER/BIGINT/INTERVAL
families, plain/epoch/strftime ``%t`` (strftime renders through
exprs.strftime_to_output_pattern — discarded-on-read tokens get
deterministic text the reader re-accepts), and ``%r``; fractional and
multi-field timestamp groups raise ``ValueError`` (their raw text
split is not reconstructible from one TIMESTAMP column).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .exprs import APACHE_TS_PATTERN
from .logformat import (
    BIGINT,
    BYTES_COLUMNS,
    COMBINED_FORMAT,
    COMMON_FORMAT,
    INTEGER,
    INTERVAL,
    TIMESTAMP,
    VARCHAR,
    FormatField,
    ParsedFormat,
    TsFormat,
    _REQUEST_DIRECTIVES,
    parse_format_string,
)


def _dash_null(c: Column) -> Column:
    return F.coalesce(c.cast("string"), F.lit("-"))


def _field_text(f: FormatField) -> Column:
    """Raw-token expression for one directive from its typed column —
    the exact inverse of exprs.regular_field_expr."""
    name = f.column_name
    col = F.col(name)
    if f.directive in _REQUEST_DIRECTIVES:
        # method + path + query_string (leading '?' retained by the
        # reader) + protocol
        return F.concat(
            F.coalesce(F.col("method"), F.lit("")),
            F.lit(" "),
            F.coalesce(F.col("path"), F.lit("")),
            F.coalesce(F.col("query_string"), F.lit("")),
            F.lit(" "),
            F.coalesce(F.col("protocol"), F.lit("")),
        )
    if f.type == TIMESTAMP:
        if f.timestamp_type == TsFormat.APACHE_DEFAULT:
            return F.concat(
                F.lit("["), F.date_format(col, APACHE_TS_PATTERN), F.lit("]")
            )
        if f.timestamp_type == TsFormat.STRFTIME:
            from .exprs import strftime_to_output_pattern

            return F.date_format(col, strftime_to_output_pattern(f.strftime_format))
        if f.timestamp_type == TsFormat.EPOCH_SEC:
            return (F.unix_micros(col) / F.lit(1_000_000)).cast("bigint").cast("string")
        if f.timestamp_type == TsFormat.EPOCH_MSEC:
            return (F.unix_micros(col) / F.lit(1_000)).cast("bigint").cast("string")
        if f.timestamp_type == TsFormat.EPOCH_USEC:
            return F.unix_micros(col).cast("string")
        raise ValueError(
            f"write_httpd_log cannot render timestamp flavor {f.timestamp_type}"
        )
    if f.type == VARCHAR:
        if f.directive == "%X":
            return (
                F.when(col == "aborted", F.lit("X"))
                .when(col == "keepalive", F.lit("+"))
                .when(col == "close", F.lit("-"))
                .otherwise(_dash_null(col))
            )
        return _dash_null(col)
    if f.type == INTEGER:
        return _dash_null(col)
    if f.type == BIGINT:
        base = name.rsplit("_", 1)[0]
        is_bytes = name in BYTES_COLUMNS or (
            base in BYTES_COLUMNS and name.rsplit("_", 1)[-1].isdigit()
        )
        if is_bytes and f.directive in ("%b",):
            # Apache's %b writes "-" for zero bytes (the reader maps it
            # back to 0 — exact round trip)
            return F.when(
                col.isNull() | (col == 0), F.lit("-")
            ).otherwise(col.cast("string"))
        return _dash_null(col)
    if f.type == INTERVAL:
        # DayTimeIntervalType -> long truncates to end-field SECONDS;
        # go through decimal(20,6) (seconds with fractional µs) for
        # exact microseconds
        us = (col.cast("decimal(20,6)") * F.lit(1_000_000)).cast("long")
        if f.directive == "%T":
            if f.modifier == "ms":
                us = (us / F.lit(1000)).cast("long")
            elif f.modifier == "us":
                pass
            else:
                us = (us / F.lit(1_000_000)).cast("long")
        return _dash_null(us)
    raise ValueError(f"write_httpd_log cannot render directive {f.directive}")


def format_line_expr(parsed: ParsedFormat) -> Column:
    """One Catalyst expression rendering a typed row as a raw log line
    under ``parsed``'s format string (literals, spacing, and quoting
    reproduced verbatim — the same walk generate_regex_pattern does)."""
    from collections import Counter as _Counter

    ts_fields = [f for f in parsed.fields if f.type == TIMESTAMP]
    grp = _Counter(f.timestamp_group_id for f in ts_fields)
    for f in ts_fields:
        if grp[f.timestamp_group_id] > 1 or f.timestamp_type in (
            TsFormat.FRAC_MSEC,
            TsFormat.FRAC_USEC,
        ):
            # multi-field groups / standalone frac fields combine into
            # one TIMESTAMP on read; their raw text split is not
            # reconstructible from that single column
            raise ValueError(
                "write_httpd_log supports single plain/epoch/strftime %t fields only"
            )
    pieces: list[Column] = []
    lit_buf: list[str] = []

    def flush():
        if lit_buf:
            pieces.append(F.lit("".join(lit_buf)))
            lit_buf.clear()

    fmt = parsed.original_format_str
    pos = 0
    n = len(fmt)
    field_idx = 0
    while pos < n:
        c = fmt[pos]
        if c == "%" and field_idx < len(parsed.fields):
            f = parsed.fields[field_idx]
            # raw span covers stripped %400,501 / %!200 status conditions
            if f.raw_end > pos:
                pos = f.raw_end
            elif f.modifier:
                close = fmt.find("}", pos)
                pos = close + (4 if f.directive.startswith("%^") else 2)
            else:
                pos += len(f.directive)
            flush()
            pieces.append(_field_text(f))
            field_idx += 1
            continue
        lit_buf.append(c)
        pos += 1
    flush()
    return F.concat(*pieces)


def write_httpd_log(
    df: DataFrame,
    path: str,
    format_type: Optional[str] = None,
    format_str: Optional[str] = None,
    mode: str = "error",
    **options: str,
) -> None:
    """Render ``df`` (the reader's typed schema) to Apache log text at
    ``path``. ``format_type``/``format_str`` mirror the reader;
    ``mode``/``options`` pass to the text writer (``compression=gzip``
    for .gz output). One line per row, reader column order not
    required — fields resolve by name."""
    if format_str is None:
        if format_type == "combined":
            format_str = COMBINED_FORMAT
        elif format_type in ("common", None):
            format_str = COMMON_FORMAT
        else:
            raise ValueError(f"Invalid format_type '{format_type}' for writing")
    parsed = parse_format_string(format_str)
    line = format_line_expr(parsed)  # validates the format before any IO
    df.select(line.alias("value")).write.mode(mode).options(**options).text(path)


def write_httpd_log_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    format_type: Optional[str] = None,
    format_str: Optional[str] = None,
    **options: str,
):
    """Streaming twin: render a STREAMING typed log DataFrame to rolling
    text files (one line per row, same inverse-formatting contract).
    Returns the started StreamingQuery; pass trigger options etc. via
    the writeStream ``options``."""
    if format_str is None:
        if format_type == "combined":
            format_str = COMBINED_FORMAT
        elif format_type in ("common", None):
            format_str = COMMON_FORMAT
        else:
            raise ValueError(f"Invalid format_type '{format_type}' for writing")
    parsed = parse_format_string(format_str)
    line = format_line_expr(parsed)
    return (
        df.select(line.alias("value"))
        .writeStream.format("text")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .options(**options)
        .start()
    )
