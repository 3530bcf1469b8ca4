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
deterministic text the reader re-accepts), ``%r``, and (r12)
MULTI-FIELD timestamp groups: every member renders from the group's
single combined column — bases at their own resolution, frac tokens
(``%{msec_frac}t``/``%{usec_frac}t``) carrying exactly the µs
remainder the base drops — so the typed round trip holds for every
instant the reader can produce. Only a frac-ONLY group raises
``ValueError`` (its read column is always NULL). Epoch directives
raise at WRITE time (job failure via ``raise_error``) on pre-1970
instants — the reader's ``\\d+`` epoch regex has no rendering for a
negative value, so the alternative would be silently unreadable lines.
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


def _epoch_text(col: Column, unit_us: int) -> Column:
    """Epoch token at ``unit_us`` resolution, FLOOR-consistent with
    _frac_text's pmod (a truncating cast rounds toward zero, which
    would disagree with the floor-based frac remainder on pre-1970
    instants and recombine to the wrong instant). The reader's epoch
    regex is \\d+, so a NEGATIVE instant has no parseable rendering at
    all — pre-1970 instants are outside every epoch directive's
    writable range (they can only enter a combined column through a
    non-epoch base field in the same group). Rather than emit a '-123'
    line that silently fails the line regex on read-back, the
    expression RAISES at write time (raise_error — the job fails with
    an actionable message, the loss is never invisible)."""
    us = F.unix_micros(col)
    if unit_us == 1:
        digits = us.cast("string")
    else:
        digits = (
            ((us - F.pmod(us, F.lit(unit_us))) / F.lit(unit_us))
            .cast("long")
            .cast("string")
        )
    return F.when(
        us < 0,
        F.raise_error(
            F.concat(
                F.lit(
                    "write_httpd_log: pre-1970 instant has no parseable "
                    "epoch rendering (reader's epoch regex is \\d+): "
                ),
                col.cast("string"),
            )
        ).cast("string"),
    ).otherwise(digits)


def _frac_text(col: Column, unit_us: int, width: int, carrier_mod: int) -> Column:
    """Sub-second token for a frac %t field in a multi-field group:
    the µs remainder the group's base rendering DROPS (mod
    ``carrier_mod`` — 1e6 for seconds-resolution bases, 1e3 for
    %{msec}t, 1 for %{usec}t), scaled to the token's unit and
    zero-padded to the reader's fixed-width regex (\\d{3} / \\d{6}).
    Read-back adds the token back onto the base, recovering the
    instant exactly for any value the reader itself can produce."""
    rem = F.pmod(F.unix_micros(col), F.lit(carrier_mod))
    tok = (rem / F.lit(unit_us)).cast("long")
    return F.lpad(tok.cast("string"), width, "0")


def _field_text(
    f: FormatField, col: Optional[Column] = None, session=None
) -> Column:
    """Raw-token expression for one directive from its typed column —
    the exact inverse of exprs.regular_field_expr. ``col`` overrides
    the source column (used by multi-field timestamp groups, where
    every member renders from the group head's combined column).
    ``session`` threads the writer's SparkSession into the %Z write
    guard (getActiveSession() can be None on executor-adjacent call
    paths; the writer always has df.sparkSession)."""
    name = f.column_name
    if col is None:
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

            return F.date_format(
                col, strftime_to_output_pattern(f.strftime_format, session=session)
            )
        if f.timestamp_type == TsFormat.EPOCH_SEC:
            return _epoch_text(col, 1_000_000)
        if f.timestamp_type == TsFormat.EPOCH_MSEC:
            return _epoch_text(col, 1_000)
        if f.timestamp_type == TsFormat.EPOCH_USEC:
            return _epoch_text(col, 1)
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


def format_line_expr(parsed: ParsedFormat, session=None) -> Column:
    """One Catalyst expression rendering a typed row as a raw log line
    under ``parsed``'s format string (literals, spacing, and quoting
    reproduced verbatim — the same walk generate_regex_pattern does)."""
    ts_fields = [f for f in parsed.fields if f.type == TIMESTAMP]
    groups: dict[int, list[FormatField]] = {}
    for f in ts_fields:
        groups.setdefault(f.timestamp_group_id, []).append(f)

    # Multi-field %t groups combine into ONE TIMESTAMP column on read
    # (exprs.timestamp_group_expr: last plain/epoch base wins, strftime
    # parts join, frac adds µs). The inverse renders every member from
    # that single column: bases at their own resolution, frac tokens
    # carrying exactly the remainder the base rendering drops — so
    # read(write(read(x))) == read(x) holds for every instant the
    # reader can produce. Only a frac-ONLY group stays unrenderable
    # (its read column is always NULL).
    _frac_types = (TsFormat.FRAC_MSEC, TsFormat.FRAC_USEC)
    ts_override: dict[int, Column] = {}  # id(field) -> rendering
    for fl in groups.values():
        fracs = [f for f in fl if f.timestamp_type in _frac_types]
        if len(fl) == 1 and not fracs:
            continue  # single plain/epoch/strftime field: default path
        bases = [f for f in fl if f.timestamp_type not in _frac_types]
        if not bases:
            raise ValueError(
                "write_httpd_log cannot render a frac-only %t group "
                "(its combined column is always NULL on read)"
            )
        head = fl[0]
        col = F.col(head.column_name)
        # µs granularity the EFFECTIVE base rendering preserves: the
        # reader keeps the LAST plain/epoch base; strftime-only groups
        # resolve to seconds unless some part carries %f
        plain_epoch = [f for f in bases if f.timestamp_type != TsFormat.STRFTIME]
        if plain_epoch:
            carrier_mod = {
                TsFormat.EPOCH_MSEC: 1_000,
                TsFormat.EPOCH_USEC: 1,
            }.get(plain_epoch[-1].timestamp_type, 1_000_000)
        else:
            from .logformat import _strftime_tokens

            has_us = any(
                k == "spec" and t == "%f"
                for f in bases
                for k, t in _strftime_tokens(f.strftime_format)
            )
            carrier_mod = 1 if has_us else 1_000_000
        for f in fl:
            if f.timestamp_type == TsFormat.FRAC_MSEC:
                ts_override[id(f)] = _frac_text(col, 1_000, 3, carrier_mod)
            elif f.timestamp_type == TsFormat.FRAC_USEC:
                ts_override[id(f)] = _frac_text(col, 1, 6, carrier_mod)
            else:
                ts_override[id(f)] = _field_text(f, col=col, session=session)

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
            ov = ts_override.get(id(f))
            pieces.append(_field_text(f, session=session) if ov is None else ov)
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
    # validates the format before any IO (reachable with df=None for a
    # pure validation call); df.sparkSession threads into the %Z guard
    # so it never silently skips on a real write (ADVICE r12)
    line = format_line_expr(
        parsed, session=df.sparkSession if df is not None else None
    )
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
    line = format_line_expr(parsed, session=df.sparkSession)
    return (
        df.select(line.alias("value"))
        .writeStream.format("text")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .options(**options)
        .start()
    )
