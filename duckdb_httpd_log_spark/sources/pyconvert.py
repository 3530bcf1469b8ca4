"""Python-side typed value conversion for the httpd_log Data Source.

Mirrors, value-for-value, the Catalyst expressions in `exprs.py` (which
themselves mirror src/httpd_log_file_reader.cpp:410-654 of the
reference): `-` → NULL/0 rules, %X remap, %r decomposition, duration
unit quirk, timestamp group combination, strftime parsing. Used only by
the Data Source executor path (`datasource.py`); the primary reader
never runs Python per-row.
"""

from __future__ import annotations

import gzip as _gzip
import io
import re
from datetime import datetime, timedelta, timezone
from typing import Callable, Iterator, Optional

from .logformat import (
    BIGINT,
    BYTES_COLUMNS,
    INTEGER,
    INTERVAL,
    VARCHAR,
    FormatField,
    ParsedFormat,
    TsFormat,
    _REQUEST_DIRECTIVES,
    _strftime_tokens,
)

_UTC = timezone.utc

# strftime tokens CPython's strptime can parse directly (parity choices
# match exprs._STRFTIME_TO_SPARK: %I parsed as plain hour, %h == %b).
_STRFTIME_TO_PY = {
    "%Y": "%Y",
    "%y": "%y",
    "%m": "%m",
    "%-m": "%m",
    "%d": "%d",
    "%-d": "%d",
    "%b": "%b",
    "%h": "%b",
    "%B": "%B",
    "%H": "%H",
    "%-H": "%H",
    "%I": "%H",
    "%-I": "%H",
    "%M": "%M",
    "%S": "%S",
    "%f": "%f",
    "%z": "%z",
    "%T": "%H:%M:%S",
    "%R": "%H:%M",
}

# tokens matched in the value but discarded before parsing (same set as
# exprs._STRFTIME_DISCARD_REGEX)
_DISCARD_REGEX = {
    "%Z": r"[A-Za-z/_]+",
    "%j": r"\d{3}",
    "%a": r"[A-Za-z]{3}",
    "%A": r"[A-Za-z]+",
    "%p": r"[AaPp][Mm]",
    "%P": r"[AaPp][Mm]",
    "%n": r"\n",
    "%t": r"\t",
}

_KEEP_REGEX = {
    "%Y": r"\d{4}",
    "%y": r"\d{2}",
    "%m": r"\d{2}",
    "%-m": r"\d{1,2}",
    "%d": r"\d{2}",
    "%-d": r"\d{1,2}",
    "%b": r"[A-Za-z]{3}",
    "%h": r"[A-Za-z]{3}",
    "%B": r"[A-Za-z]+",
    "%H": r"\d{2}",
    "%-H": r"\d{1,2}",
    "%I": r"\d{2}",
    "%-I": r"\d{1,2}",
    "%M": r"\d{2}",
    "%S": r"\d{2}",
    "%f": r"\d{6}",
    "%z": r"[+-]\d{4}",
    "%T": r"\d{2}:\d{2}:\d{2}",
    "%R": r"\d{2}:\d{2}",
}

_RE_META = set(".*+?^$()[]{}|\\")


def _esc(c: str) -> str:
    return "\\" + c if c in _RE_META else c


def translate_strftime_py(fmt: str) -> tuple[Optional[re.Pattern], str]:
    """strftime format -> (cleanup regex or None, python strptime pattern).

    When a cleanup regex is returned, applying it to the raw value and
    concatenating the capture groups yields text parseable by the python
    pattern (discarded tokens — zone names, weekday names, AM/PM, %e pad
    spaces — fall outside the groups). Mirrors exprs.translate_strftime.
    """
    regex_parts: list[str] = []
    keep_open = False
    needs_cleanup = False
    py_pat: list[str] = []

    def open_keep():
        nonlocal keep_open
        if not keep_open:
            regex_parts.append("(")
            keep_open = True

    def close_keep():
        nonlocal keep_open
        if keep_open:
            regex_parts.append(")")
            keep_open = False

    for kind, tok in _strftime_tokens(fmt):
        if kind == "lit":
            open_keep()
            regex_parts.append(_esc(tok))
            py_pat.append(tok.replace("%", "%%"))
            continue
        if tok == "%%":
            open_keep()
            regex_parts.append("%")
            py_pat.append("%%")
            continue
        if tok == "%e":
            close_keep()
            regex_parts.append(r"\s?")
            open_keep()
            regex_parts.append(r"\d{1,2}")
            py_pat.append("%d")
            needs_cleanup = True
            continue
        py = _STRFTIME_TO_PY.get(tok)
        if py is not None:
            open_keep()
            regex_parts.append(_KEEP_REGEX[tok])
            py_pat.append(py)
            continue
        close_keep()
        regex_parts.append("(?:" + _DISCARD_REGEX.get(tok, r"\S+") + ")")
        needs_cleanup = True

    close_keep()
    cleanup = re.compile("^" + "".join(regex_parts) + "$") if needs_cleanup else None
    return cleanup, "".join(py_pat)


def _parse_strftime_value(value: str, fmt: str) -> Optional[datetime]:
    cleanup, py_pat = translate_strftime_py(fmt)
    if cleanup is not None:
        m = cleanup.match(value)
        if m is None:
            return None
        value = "".join(g for g in m.groups() if g is not None)
    try:
        dt = datetime.strptime(value, py_pat)
    except ValueError:
        return None
    if dt.tzinfo is not None:
        return dt.astimezone(_UTC)
    return dt.replace(tzinfo=_UTC)


def parse_apache_timestamp(value: str) -> Optional[datetime]:
    """`10/Oct/2000:13:55:36 -0700` -> aware UTC datetime."""
    try:
        return datetime.strptime(value, "%d/%b/%Y:%H:%M:%S %z").astimezone(_UTC)
    except ValueError:
        return None


def _try_int(v: str) -> Optional[int]:
    try:
        return int(v)
    except ValueError:
        return None


_EPOCH = datetime(1970, 1, 1, tzinfo=_UTC)


def _epoch_us(us: int) -> datetime:
    return _EPOCH + timedelta(microseconds=us)


def _is_bytes_column(name: str) -> bool:
    if name in BYTES_COLUMNS:
        return True
    stem, _, tail = name.rpartition("_")
    return stem in BYTES_COLUMNS and tail.isdigit()


def _scalar_converter(f: FormatField) -> Callable[[str], object]:
    """One captured string -> typed python value (exprs.regular_field_expr)."""
    if f.type == VARCHAR:
        if f.directive == "%X":
            remap = {"X": "aborted", "+": "keepalive", "-": "close"}
            return lambda v: remap.get(v, v)
        return lambda v: None if v == "-" else v

    if f.type == INTEGER:
        return _try_int

    if f.type == BIGINT:
        if _is_bytes_column(f.column_name):
            return lambda v: 0 if v == "-" else _try_int(v)
        return _try_int

    if f.type == INTERVAL:
        if f.directive == "%T":
            mult = {"ms": 1000, "us": 1}.get(f.modifier, 1_000_000)
        else:  # %D family and %>T/%<T take the value as raw µs (quirk parity)
            mult = 1
        return lambda v: (
            None if (us := _try_int(v)) is None else timedelta(microseconds=us * mult)
        )

    return lambda v: v


def _request_values(req: str, f: FormatField) -> list[object]:
    """%r decomposition (exprs.request_subcolumn_exprs); returns the
    values for the non-skipped sub-columns in schema order."""
    toks = req.lstrip().split()
    ok = len(toks) >= 3
    if ok:
        method, full, protocol = toks[0], toks[1], toks[2]
        qpos = full.find("?")
        if qpos >= 0:
            path, query = full[:qpos], full[qpos:] or None
        else:
            path, query = full, None
    else:
        method = path = protocol = ""
        query = None
    out = []
    if not f.skip_method:
        out.append(method)
    if not f.skip_path:
        out.append(path)
    if not f.skip_query_string:
        out.append(query)
    if not f.skip_protocol:
        out.append(protocol)
    return out


def _group_timestamp(parsed: ParsedFormat, gid: int, groups: tuple) -> Optional[datetime]:
    """Timestamp group combination (exprs.timestamp_group_expr)."""
    base: Optional[datetime] = None
    frac_us = 0
    strf_vals: list[str] = []
    strf_fmts: list[str] = []
    for i in parsed.timestamp_groups[gid].field_indices:
        f = parsed.fields[i]
        v = groups[f.capture_index - 1]
        if v is None:
            continue
        t = f.timestamp_type
        if t == TsFormat.APACHE_DEFAULT:
            base = parse_apache_timestamp(v)
        elif t == TsFormat.EPOCH_SEC:
            n = _try_int(v)
            base = _epoch_us(n * 1_000_000) if n is not None else None
        elif t == TsFormat.EPOCH_MSEC:
            n = _try_int(v)
            base = _epoch_us(n * 1000) if n is not None else None
        elif t == TsFormat.EPOCH_USEC:
            n = _try_int(v)
            base = _epoch_us(n) if n is not None else None
        elif t == TsFormat.FRAC_MSEC:
            frac_us = (_try_int(v) or 0) * 1000
        elif t == TsFormat.FRAC_USEC:
            frac_us = _try_int(v) or 0
        else:  # STRFTIME
            strf_vals.append(v)
            strf_fmts.append(f.strftime_format)
    if base is None and strf_vals:
        base = _parse_strftime_value(" ".join(strf_vals), " ".join(strf_fmts))
    if base is None:
        return None
    return base + timedelta(microseconds=frac_us)


def build_row_converter(parsed: ParsedFormat) -> Callable[[tuple], list]:
    """Compile a ParsedFormat into a groups-tuple -> row-values function.

    Output order matches `generate_schema` exactly (metadata columns are
    appended by the caller)."""

    def convert(groups: tuple) -> list:
        out: list = []
        for f in parsed.fields:
            if f.should_skip:
                continue
            if f.directive == "%t":
                if f.timestamp_group_id >= 0:
                    out.append(_group_timestamp(parsed, f.timestamp_group_id, groups))
                else:
                    v = groups[f.capture_index - 1]
                    out.append(parse_apache_timestamp(v) if v is not None else None)
            elif f.directive in _REQUEST_DIRECTIVES:
                out.extend(_request_values(groups[f.capture_index - 1] or "", f))
            else:
                v = groups[f.capture_index - 1]
                out.append(None if v is None else _scalar_converter(f)(v))
        return out

    return convert


def error_row(parsed: ParsedFormat) -> list:
    """Typed-column fill for unparseable lines in raw mode: '' for
    VARCHAR, NULL otherwise (src/httpd_log_file_reader.cpp:488-536)."""
    out: list = []
    for f in parsed.fields:
        if f.should_skip:
            continue
        if f.directive == "%t":
            out.append(None)
        elif f.directive in _REQUEST_DIRECTIVES:
            for skip, is_query in (
                (f.skip_method, False),
                (f.skip_path, False),
                (f.skip_query_string, True),
                (f.skip_protocol, False),
            ):
                if not skip:
                    out.append(None if is_query else "")
        else:
            out.append("" if f.type == VARCHAR else None)
    return out


_STREAM_CHUNK = 1 << 21  # 2 MiB, the reference's buffer size
# (src/httpd_log_buffered_reader.cpp:5-57)


def _iter_byte_lines(chunks: "Iterator[bytes]") -> Iterator[tuple[int, str]]:
    """(1-based line_number, CR-stripped line) pairs from a byte-chunk
    stream. Splitting on b'\\n' BEFORE decoding is safe: 0x0A never
    appears inside a UTF-8 multi-byte sequence, so a code point split
    across chunks always reassembles within its line. A trailing
    newline produces no phantom final line."""
    buf = b""
    i = 0
    for chunk in chunks:
        if not chunk:
            continue
        buf += chunk
        parts = buf.split(b"\n")
        buf = parts.pop()
        for part in parts:
            i += 1
            yield i, part.decode("utf-8", errors="replace").rstrip("\r")
    if buf:
        i += 1
        yield i, buf.decode("utf-8", errors="replace").rstrip("\r")


def _iter_remote_lines(fname: str) -> Iterator[tuple[int, str]]:
    """Streamed lines via pyarrow.fs — usable on EXECUTORS (Python
    DataSource workers have no JVM gateway, so the Hadoop FileSystem
    route used at bind time is not available here). Memory is
    O(chunk), never O(file): raw-mode reads of multi-GB remote logs
    stream through the same 2 MiB buffer as local ones. gzip is
    inflated incrementally (multi-member aware, like gzip.decompress)."""
    import zlib

    from .fs import _pyarrow_fs

    fs, rel, _, _ = _pyarrow_fs(fname)
    with fs.open_input_stream(rel) as stream:
        first = stream.read(2)

        def raw_chunks():
            if first:
                yield first
            while True:
                c = stream.read(_STREAM_CHUNK)
                if not c:
                    break
                yield c

        if first == b"\x1f\x8b":

            def gz_chunks():
                d = zlib.decompressobj(wbits=31)
                data = first
                while True:
                    if not data:
                        data = stream.read(_STREAM_CHUNK)
                        if not data:
                            break
                    if d.eof:  # next gzip member in a concatenated file
                        d = zlib.decompressobj(wbits=31)
                    out = d.decompress(data)
                    if out:
                        yield out
                    data = d.unused_data
                if not d.eof:
                    # stream ended mid-member: match the local gzip.open
                    # path (and gzip.decompress) instead of silently
                    # yielding a truncated tail
                    raise EOFError(f"truncated gzip stream: {fname}")

            chunks = gz_chunks()
        else:
            chunks = raw_chunks()
        yield from _iter_byte_lines(chunks)


def iter_log_lines(fname: str) -> Iterator[tuple[int, str]]:
    """(1-based line_number, CR-stripped line) pairs; gzip sniffed by
    magic bytes like the reference's AUTO_DETECT compression. Paths with
    a URI scheme stream through pyarrow.fs (file/s3/hdfs/gcs); local
    paths stream through buffered python I/O. Either way memory is
    bounded by the 2 MiB buffer, never file size."""
    from .fs import has_scheme

    if has_scheme(fname):
        yield from _iter_remote_lines(fname)
        return
    with open(fname, "rb") as fh:
        magic = fh.read(2)
    if magic == b"\x1f\x8b":
        stream = io.TextIOWrapper(_gzip.open(fname, "rb"), encoding="utf-8", errors="replace")
    else:
        stream = open(fname, "r", encoding="utf-8", errors="replace")
    with stream:
        for i, line in enumerate(stream, start=1):
            yield i, line.rstrip("\n").rstrip("\r")
