"""Apache LogFormat compiler — pure Python, no Spark dependency.

Compiles an Apache ``LogFormat`` string into a :class:`ParsedFormat` IR:
the ordered field list (with collision-resolved column names and types),
a single anchored regex that parses one log line, timestamp grouping
metadata, and the resulting relational schema.

This is the driver-side "bind" half of the engine: everything here runs
once per query on the driver; the produced regex + schema are then turned
into Catalyst expressions by ``reader.py`` (JVM-side, codegen'd — no
Python on the per-row hot path).

Reference parity (semantics, not code): saygox/duckdb-httpd-log
``src/httpd_log_format_parser.cpp`` — directive table :14-96, strftime
regex table :104-192, duration priorities :194-217, column naming
:261-337, typing :339-390, tokenizer :392-534, regex gen :536-648,
schema gen :650-709, collision resolution :859-1215, auto-detect
:1217-1269.

One deliberate divergence: skipped non-``%t`` fields are emitted as
non-capturing groups *and* excluded from capture-index bookkeeping
(the reference increments its value index for them even though they do
not capture — see ``src/httpd_log_file_reader.cpp:424-428`` vs
``:613-619`` — which only stays consistent because its test formats
always place skipped duplicates last). We keep the two strictly in sync.
"""

from __future__ import annotations

import re
import sys

if sys.version_info < (3, 11):  # pragma: no cover
    raise ImportError(
        "duckdb_httpd_log_spark requires Python >= 3.11: generated log-line "
        "regexes use possessive quantifiers, which the `re` module only "
        "supports from 3.11 (declared via requires-python in pyproject.toml)"
    )
from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import Optional

# ---------------------------------------------------------------------------
# Type names (engine-neutral; mapped to Spark/DuckDB types at the edges)
# ---------------------------------------------------------------------------
VARCHAR = "string"
INTEGER = "int"
BIGINT = "bigint"
TIMESTAMP = "timestamp"
INTERVAL = "interval"
BOOLEAN = "boolean"


class TsFormat(Enum):
    """Timestamp flavor of a %t / %{...}t directive."""

    APACHE_DEFAULT = "apache"  # [10/Oct/2000:13:55:36 -0700]
    EPOCH_SEC = "sec"
    EPOCH_MSEC = "msec"
    EPOCH_USEC = "usec"
    FRAC_MSEC = "msec_frac"
    FRAC_USEC = "usec_frac"
    STRFTIME = "strftime"


@dataclass
class DirectiveDef:
    directive: str
    column_name: str
    type: str
    collision_suffix: str = ""
    collision_priority: int = 0


# Reference: src/httpd_log_format_parser.cpp:14-88 (order matters for %b/%B
# "first occurrence wins" semantics only, which we track per-field anyway).
DIRECTIVE_DEFS: dict[str, DirectiveDef] = {
    d.directive: d
    for d in [
        DirectiveDef("%h", "client_host", VARCHAR),
        DirectiveDef("%a", "remote_ip", VARCHAR),
        DirectiveDef("%A", "local_ip", VARCHAR),
        DirectiveDef("%l", "ident", VARCHAR),
        DirectiveDef("%u", "auth_user", VARCHAR),
        DirectiveDef("%t", "timestamp", TIMESTAMP),
        DirectiveDef("%>r", "request", VARCHAR, "", 0),
        DirectiveDef("%r", "request", VARCHAR, "_original", 1),
        DirectiveDef("%<r", "request", VARCHAR, "_original", 1),
        DirectiveDef("%m", "method", VARCHAR),
        DirectiveDef("%>U", "path", VARCHAR, "", 0),
        DirectiveDef("%U", "path", VARCHAR, "_original", 1),
        DirectiveDef("%<U", "path", VARCHAR, "_original", 1),
        DirectiveDef("%q", "query_string", VARCHAR),
        DirectiveDef("%H", "protocol", VARCHAR),
        DirectiveDef("%p", "server_port", INTEGER),
        DirectiveDef("%k", "keepalive_count", INTEGER),
        DirectiveDef("%X", "connection_status", VARCHAR),
        DirectiveDef("%P", "process_id", INTEGER),
        DirectiveDef("%>D", "duration", INTERVAL, "", 0),
        DirectiveDef("%D", "duration", INTERVAL, "_original", 1),
        DirectiveDef("%<D", "duration", INTERVAL, "_original", 1),
        DirectiveDef("%>T", "duration", INTERVAL, "", 0),
        DirectiveDef("%T", "duration", INTERVAL, "_original", 1),
        DirectiveDef("%<T", "duration", INTERVAL, "_original", 1),
        DirectiveDef("%>s", "status", INTEGER, "", 0),
        DirectiveDef("%s", "status", INTEGER, "_original", 1),
        DirectiveDef("%<s", "status", INTEGER, "_original", 1),
        DirectiveDef("%v", "server_name", VARCHAR, "", 0),
        DirectiveDef("%V", "server_name", VARCHAR, "_used", 1),
        DirectiveDef("%B", "bytes", BIGINT),
        DirectiveDef("%b", "bytes", BIGINT),
        DirectiveDef("%I", "bytes_received", BIGINT),
        DirectiveDef("%O", "bytes_sent", BIGINT),
        DirectiveDef("%S", "bytes_transferred", BIGINT),
        DirectiveDef("%f", "filename", VARCHAR),
        DirectiveDef("%L", "request_log_id", VARCHAR),
        DirectiveDef("%R", "handler", VARCHAR),
        DirectiveDef("%i", "", VARCHAR, "_in", 2),
        DirectiveDef("%o", "", VARCHAR, "_out", 3),
        DirectiveDef("%C", "", VARCHAR, "_cookie", 4),
        DirectiveDef("%e", "", VARCHAR, "_env", 5),
        DirectiveDef("%n", "", VARCHAR, "_note", 6),
        DirectiveDef("%^ti", "", VARCHAR, "_trail_in", 7),
        DirectiveDef("%^to", "", VARCHAR, "_trail_out", 8),
    ]
}

# Reference: src/httpd_log_format_parser.cpp:92-96.
# header name (lowercase) -> (type, applies_to_request(%i), applies_to_response(%o))
TYPED_HEADERS: dict[str, tuple[str, bool, bool]] = {
    "content-length": (BIGINT, True, True),
    "age": (INTEGER, False, True),
    "max-forwards": (INTEGER, True, False),
}

COMMON_FORMAT = '%h %l %u %t "%r" %>s %b'
COMBINED_FORMAT = '%h %l %u %t "%r" %>s %b "%{Referer}i" "%{User-agent}i"'

BYTES_COLUMNS = {"bytes", "bytes_received", "bytes_sent", "bytes_transferred"}

_REQUEST_DIRECTIVES = {"%r", "%>r", "%<r"}
_PATH_DIRECTIVES = {"%U", "%>U", "%<U"}
_DYNAMIC_NAME_DIRECTIVES = {"%i", "%o", "%C", "%e", "%n", "%^ti", "%^to"}


@dataclass
class FormatField:
    directive: str
    column_name: str
    type: str
    is_quoted: bool = False
    modifier: str = ""
    should_skip: bool = False
    # %r sub-column suppression when individual %m/%U/%q/%H present
    skip_method: bool = False
    skip_path: bool = False
    skip_query_string: bool = False
    skip_protocol: bool = False
    # timestamp metadata
    timestamp_group_id: int = -1
    timestamp_type: TsFormat = TsFormat.APACHE_DEFAULT
    strftime_format: str = ""
    is_end_timestamp: bool = False
    # 1-based index of this field's regex capture group (None if non-capturing)
    capture_index: Optional[int] = None
    # span of this directive's raw text in original_format_str (includes any
    # stripped %400,501 / %!200 status condition); -1 when built by hand
    raw_start: int = -1
    raw_end: int = -1


@dataclass
class TimestampGroup:
    field_indices: list[int] = dc_field(default_factory=list)
    has_epoch_component: bool = False
    has_strftime_component: bool = False
    has_plain_t: bool = False
    has_frac_component: bool = False


@dataclass
class ParsedFormat:
    original_format_str: str
    fields: list[FormatField] = dc_field(default_factory=list)
    regex_pattern: str = ""
    num_capture_groups: int = 0
    timestamp_groups: list[TimestampGroup] = dc_field(default_factory=list)

    _compiled: Optional[re.Pattern] = dc_field(default=None, repr=False, compare=False)

    @property
    def compiled(self) -> Optional[re.Pattern]:
        """Python-side compiled regex (driver-only: sampling/auto-detect)."""
        if self._compiled is None and self.regex_pattern:
            self._compiled = re.compile(self.regex_pattern)
        return self._compiled

    def parse_line(self, line: str) -> Optional[tuple]:
        """Driver-side parse of one line (for auto-detect / conf validation).

        Returns the capture tuple, or None on parse failure. The executor
        hot path never calls this — it uses the same pattern via Catalyst
        ``regexp_replace``.
        """
        if not self.regex_pattern:
            return None
        m = self.compiled.match(line)
        if m is None or m.end() != len(line):
            return None
        return m.groups()


# ---------------------------------------------------------------------------
# strftime -> regex  (reference :104-192)
# ---------------------------------------------------------------------------
_STRFTIME_REGEX = {
    "%Y": r"\d{4}",
    "%y": r"\d{2}",
    "%m": r"\d{2}",
    "%-m": r"\d{1,2}",
    "%d": r"\d{2}",
    "%-d": r"\d{1,2}",
    "%e": r"[\s\d]\d",
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
    "%Z": r"[A-Za-z/_]+",
    "%T": r"\d{2}:\d{2}:\d{2}",
    "%R": r"\d{2}:\d{2}",
    "%j": r"\d{3}",
    "%a": r"[A-Za-z]{3}",
    "%A": r"[A-Za-z]+",
    "%p": r"[AaPp][Mm]",
    "%P": r"[AaPp][Mm]",
    "%n": r"\n",
    "%t": r"\t",
    "%%": r"%",
}

_REGEX_META = set(".*+?^$()[]{}|\\")


def _escape_literal(c: str) -> str:
    return "\\" + c if c in _REGEX_META else c


def _strftime_tokens(fmt: str):
    """Yield ('spec', '%X') or ('lit', char) tokens of a strftime format."""
    i = 0
    n = len(fmt)
    while i < n:
        if fmt[i] == "%" and i + 1 < n:
            if fmt[i + 1] == "-" and i + 2 < n:
                yield ("spec", fmt[i : i + 3])
                i += 3
            else:
                yield ("spec", fmt[i : i + 2])
                i += 2
        else:
            yield ("lit", fmt[i])
            i += 1


def strftime_to_regex(fmt: str) -> str:
    out = []
    for kind, tok in _strftime_tokens(fmt):
        if kind == "spec":
            out.append(_STRFTIME_REGEX.get(tok, r"\S+"))
        else:
            out.append(_escape_literal(tok))
    return "".join(out)


# ---------------------------------------------------------------------------
# Duration precedence  (reference :194-217)
# ---------------------------------------------------------------------------
def duration_priority(directive: str, modifier: str) -> int:
    if directive in ("%D", "%>D", "%<D"):
        return 0
    if directive in ("%T", "%>T", "%<T"):
        return {"us": 1, "ms": 2, "s": 4}.get(modifier, 3)
    return -1


# ---------------------------------------------------------------------------
# Naming / typing  (reference :261-390)
# ---------------------------------------------------------------------------
def get_column_name(directive: str, modifier: str = "") -> str:
    if directive in _DYNAMIC_NAME_DIRECTIVES and modifier:
        return modifier.lower().replace("-", "_")
    if directive == "%a" and modifier == "c":
        return "peer_ip"
    if directive == "%h" and modifier == "c":
        return "peer_host"
    if directive in ("%T", "%>T", "%<T") and modifier in ("ms", "us", "s"):
        return DIRECTIVE_DEFS[directive].column_name
    if directive == "%P":
        if modifier in ("pid", ""):
            return "process_id"
        if modifier == "tid":
            return "thread_id"
        if modifier == "hextid":
            return "thread_id_hex"
    if directive == "%p":
        if modifier in ("canonical", ""):
            return "server_port"
        if modifier == "local":
            return "local_port"
        if modifier == "remote":
            return "remote_port"
    d = DIRECTIVE_DEFS.get(directive)
    if d is not None and d.column_name:
        return d.column_name
    return "field_" + directive.lstrip("%")


def get_data_type(directive: str, modifier: str = "") -> str:
    if directive in ("%i", "%o"):
        if modifier:
            rule = TYPED_HEADERS.get(modifier.lower())
            if rule is not None:
                typ, req, resp = rule
                if (directive == "%i" and req) or (directive == "%o" and resp):
                    return typ
        return VARCHAR
    if directive in ("%C", "%e", "%n", "%^ti", "%^to"):
        return VARCHAR
    if directive in ("%T", "%>T", "%<T") and modifier in ("ms", "us", "s"):
        return INTERVAL
    if directive == "%P":
        if modifier in ("pid", ""):
            return INTEGER
        if modifier == "tid":
            return BIGINT
        if modifier == "hextid":
            return VARCHAR
    if directive == "%p" and modifier in ("canonical", "local", "remote"):
        return INTEGER
    d = DIRECTIVE_DEFS.get(directive)
    if d is not None:
        return d.type
    return VARCHAR


# ---------------------------------------------------------------------------
# Format-string tokenizer  (reference :392-534)
# ---------------------------------------------------------------------------
def parse_format_string(format_str: str) -> ParsedFormat:
    result = ParsedFormat(original_format_str=format_str)
    pos = 0
    in_quotes = False
    n = len(format_str)

    while pos < n:
        c = format_str[pos]
        if c == '"':
            in_quotes = not in_quotes
            pos += 1
            continue
        if c != "%" or pos + 1 >= n:
            pos += 1
            continue

        modifier = ""
        directive = ""
        field_start = pos

        # Skip optional status-code condition: %400,501{..} / %!200,304{..}
        # (conditions are stripped; the directive behaves unconditionally)
        dstart = pos + 1
        if dstart < n and format_str[dstart] == "!":
            dstart += 1
        while dstart < n and (format_str[dstart].isdigit() or format_str[dstart] == ","):
            dstart += 1

        if dstart < n and format_str[dstart] == "{":
            close = format_str.find("}", dstart + 1)
            if close == -1 or close + 1 >= n:
                pos += 1  # malformed; skip char
                continue
            modifier = format_str[dstart + 1 : close]
            if format_str[close + 1] == "^" and close + 3 < n:
                directive = "%" + format_str[close + 1 : close + 4]  # %^ti / %^to
                pos = close + 4
            else:
                directive = "%" + format_str[close + 1]
                pos = close + 2
        else:
            dir_start = pos if dstart == pos + 1 else dstart
            if (
                dir_start + 1 < n
                and format_str[dir_start] == "%"
                and format_str[dir_start + 1] in "<>"
            ):
                directive = format_str[dir_start : dir_start + 3]
                pos = dir_start + 3
            elif dstart > pos + 1:
                directive = "%" + format_str[dstart]
                pos = dstart + 1
            else:
                directive = format_str[pos : pos + 2]
                pos += 2

        f = FormatField(
            directive=directive,
            column_name=get_column_name(directive, modifier),
            type=get_data_type(directive, modifier),
            is_quoted=in_quotes,
            modifier=modifier,
            raw_start=field_start,
            raw_end=pos,
        )
        if directive == "%t":
            if modifier == "":
                f.timestamp_type = TsFormat.APACHE_DEFAULT
            elif modifier == "sec":
                f.timestamp_type = TsFormat.EPOCH_SEC
            elif modifier == "msec":
                f.timestamp_type = TsFormat.EPOCH_MSEC
            elif modifier == "usec":
                f.timestamp_type = TsFormat.EPOCH_USEC
            elif modifier == "msec_frac":
                f.timestamp_type = TsFormat.FRAC_MSEC
            elif modifier == "usec_frac":
                f.timestamp_type = TsFormat.FRAC_USEC
            else:
                fmt = modifier
                if fmt.startswith("begin:"):
                    fmt = fmt[6:]
                    f.is_end_timestamp = False
                elif fmt.startswith("end:"):
                    fmt = fmt[4:]
                    f.is_end_timestamp = True
                f.timestamp_type = TsFormat.STRFTIME
                f.strftime_format = fmt
        result.fields.append(f)

    resolve_column_name_collisions(result)
    result.regex_pattern, result.num_capture_groups = generate_regex_pattern(result)
    return result


# ---------------------------------------------------------------------------
# Regex generation  (reference :536-648)
# ---------------------------------------------------------------------------
def generate_regex_pattern(parsed: ParsedFormat) -> tuple[str, int]:
    """Build the anchored line regex; assign each field its capture index.

    All ``%t`` fields capture (their values are combined into one
    timestamp); other skipped fields are non-capturing.
    """
    out = ["^"]
    fmt = parsed.original_format_str
    pos = 0
    n = len(fmt)
    field_idx = 0
    next_capture = 1

    while pos < n:
        c = fmt[pos]
        if c == '"':
            out.append('"')
            pos += 1
            continue
        if c == "%" and field_idx < len(parsed.fields):
            f = parsed.fields[field_idx]
            # advance past the directive text (raw span covers stripped
            # %400,501 / %!200 status conditions too)
            if f.raw_end > pos:
                pos = f.raw_end
            elif f.modifier:
                close = fmt.find("}", pos)
                if f.directive.startswith("%^"):
                    pos = close + 4  # }^ti / }^to
                else:
                    pos = close + 2  # }X
            else:
                pos += len(f.directive)

            # Possessive quantifiers where the class is provably disjoint
            # from what follows ([^\]] before \], [^"] before ", \s before
            # any non-space token): identical match semantics, no
            # backtracking state — ~15% faster on the Java regex engine
            # (python's re supports them from 3.11 for the driver probe).
            if f.directive == "%t":
                if f.timestamp_type == TsFormat.APACHE_DEFAULT:
                    out.append(r"\[([^\]]++)\]")
                else:
                    ts_regex = {
                        TsFormat.EPOCH_SEC: r"\d+",
                        TsFormat.EPOCH_MSEC: r"\d+",
                        TsFormat.EPOCH_USEC: r"\d+",
                        TsFormat.FRAC_MSEC: r"\d{3}",
                        TsFormat.FRAC_USEC: r"\d{6}",
                    }.get(f.timestamp_type) or strftime_to_regex(f.strftime_format)
                    out.append("(" + ts_regex + ")")
                f.capture_index = next_capture
                next_capture += 1
                field_idx += 1
                continue

            if f.is_quoted:
                # possessive only when the closing quote follows directly
                # (a multi-directive quoted region like "%r %>s" still
                # needs backtracking between its [^"]* spans)
                regex_expr = '[^"]*+' if pos < n and fmt[pos] == '"' else '[^"]*'
            else:
                # \S+ stays greedy: a following non-space literal (e.g.
                # the ':' in '%h:%p') legitimately backtracks into it
                regex_expr = r"\S+"
            if not f.should_skip:
                out.append("(" + regex_expr + ")")
                f.capture_index = next_capture
                next_capture += 1
            else:
                out.append("(?:" + regex_expr + ")")
                f.capture_index = None
            field_idx += 1
        elif c in (" ", "\t"):
            # possessive \s++ is the default (~15% faster, no
            # backtracking state) — EXCEPT when the next field is a
            # strftime %t whose regex can itself start with whitespace
            # (%e's [\s\d] pad, a leading literal space): the reference
            # emits backtracking \s+ (:624) and parses ' 5/Oct/...',
            # so the possessive would unsoundly eat the pad here
            j = pos
            while j < n and fmt[j] in (" ", "\t"):
                j += 1
            possessive = True
            if j < n and fmt[j] == "%" and field_idx < len(parsed.fields):
                nf = parsed.fields[field_idx]
                if nf.directive == "%t" and nf.timestamp_type == TsFormat.STRFTIME:
                    head = strftime_to_regex(nf.strftime_format)
                    if head.startswith(("[\\s", "\\s")):
                        possessive = False
            out.append(r"\s++" if possessive else r"\s+")
            pos += 1
            while pos < n and fmt[pos] in (" ", "\t"):
                pos += 1
        elif c == "[":
            out.append(r"\[")
            pos += 1
        elif c == "]":
            out.append(r"\]")
            pos += 1
        else:
            out.append(_escape_literal(c))
            pos += 1

    return "".join(out), next_capture - 1


# ---------------------------------------------------------------------------
# Schema generation  (reference :650-709)
# ---------------------------------------------------------------------------
def generate_schema(parsed: ParsedFormat, include_raw_columns: bool) -> list[tuple[str, str]]:
    """Return ordered (name, type) pairs; types are engine-neutral strings."""
    cols: list[tuple[str, str]] = []
    for f in parsed.fields:
        if f.should_skip:
            continue
        if f.directive == "%t":
            cols.append((f.column_name, TIMESTAMP))
        elif f.directive in _REQUEST_DIRECTIVES:
            if not f.skip_method:
                cols.append(("method", VARCHAR))
            if not f.skip_path:
                cols.append(("path", VARCHAR))
            if not f.skip_query_string:
                cols.append(("query_string", VARCHAR))
            if not f.skip_protocol:
                cols.append(("protocol", VARCHAR))
        else:
            cols.append((f.column_name, f.type))
    cols.append(("log_file", VARCHAR))
    if include_raw_columns:
        cols.append(("line_number", BIGINT))
        cols.append(("parse_error", BOOLEAN))
        cols.append(("raw_line", VARCHAR))
    return cols


# ---------------------------------------------------------------------------
# Collision resolution  (reference :859-1215)
# ---------------------------------------------------------------------------
def resolve_column_name_collisions(parsed: ParsedFormat) -> None:
    fields = parsed.fields

    # Step 0: %r sub-columns suppressed by individual %m/%U/%q/%H
    r_idx = None
    has_m = has_u = has_q = has_h = False
    for i, f in enumerate(fields):
        if f.directive in _REQUEST_DIRECTIVES:
            r_idx = i
        elif f.directive == "%m":
            has_m = True
        elif f.directive in _PATH_DIRECTIVES:
            has_u = True
        elif f.directive == "%q":
            has_q = True
        elif f.directive == "%H":
            has_h = True
    if r_idx is not None:
        rf = fields[r_idx]
        rf.skip_method = has_m
        rf.skip_path = has_u
        rf.skip_query_string = has_q
        rf.skip_protocol = has_h

    # Step 0.5: group consecutive %t directives (begin/end split groups)
    group_id = 0
    in_group = False
    group_is_end = False
    for i, f in enumerate(fields):
        if f.directive == "%t":
            start_new = not in_group or f.is_end_timestamp != group_is_end
            if start_new:
                if in_group:
                    group_id += 1
                in_group = True
                group_is_end = f.is_end_timestamp
                f.timestamp_group_id = group_id
                g = TimestampGroup(field_indices=[i])
                parsed.timestamp_groups.append(g)
            else:
                f.timestamp_group_id = group_id
                f.should_skip = True  # combined into the group head's column
                g = parsed.timestamp_groups[-1]
                g.field_indices.append(i)
            if f.timestamp_type == TsFormat.APACHE_DEFAULT:
                g.has_plain_t = True
            elif f.timestamp_type in (TsFormat.EPOCH_SEC, TsFormat.EPOCH_MSEC, TsFormat.EPOCH_USEC):
                g.has_epoch_component = True
            elif f.timestamp_type in (TsFormat.FRAC_MSEC, TsFormat.FRAC_USEC):
                g.has_frac_component = True
            else:
                g.has_strftime_component = True
        else:
            if in_group:
                in_group = False
                group_id += 1

    # Step 0.6: begin/end rename — when both exist, end keeps `timestamp`,
    # begin becomes `timestamp_original`
    has_end = any(f.directive == "%t" and not f.should_skip and f.is_end_timestamp for f in fields)
    has_begin = any(
        f.directive == "%t" and not f.should_skip and not f.is_end_timestamp for f in fields
    )
    if has_end and has_begin:
        for f in fields:
            if f.directive == "%t" and not f.should_skip and not f.is_end_timestamp:
                f.column_name = "timestamp_original"

    # Step 1: collision map by column name (insertion order preserved)
    collision_map: dict[str, list[int]] = {}
    for i, f in enumerate(fields):
        collision_map.setdefault(f.column_name, []).append(i)

    # Step 2
    for column_name, idxs in collision_map.items():
        if len(idxs) <= 1:
            continue

        if column_name in ("duration", "duration_original"):
            best = idxs[0]
            best_p = duration_priority(fields[best].directive, fields[best].modifier)
            for i in idxs:
                p = duration_priority(fields[i].directive, fields[i].modifier)
                if p >= 0 and (best_p < 0 or p < best_p):
                    best_p = p
                    best = i
            for i in idxs:
                if i != best:
                    fields[i].should_skip = True
            continue

        if column_name == "process_id":
            best = idxs[0]
            for i in idxs:
                if fields[i].directive == "%P" and fields[i].modifier == "":
                    best = i
                    break
            else:
                for i in idxs:
                    if fields[i].directive == "%P" and fields[i].modifier == "pid":
                        best = i
                        break
            for i in idxs:
                if i != best:
                    fields[i].should_skip = True
            continue

        if column_name == "server_port":
            best = idxs[0]
            for i in idxs:
                if fields[i].directive == "%p" and fields[i].modifier == "":
                    best = i
                    break
            else:
                for i in idxs:
                    if fields[i].directive == "%p" and fields[i].modifier == "canonical":
                        best = i
                        break
            for i in idxs:
                if i != best:
                    fields[i].should_skip = True
            continue

        if column_name == "bytes":
            for i in idxs[1:]:
                fields[i].should_skip = True
            continue

        by_directive: dict[str, list[int]] = {}
        for i in idxs:
            by_directive.setdefault(fields[i].directive, []).append(i)

        # Case A: duplicates of the same directive -> name, name_2, name_3 …
        if len(by_directive) == 1:
            for counter, i in enumerate(idxs[1:], start=2):
                fields[i].column_name = f"{column_name}_{counter}"
            continue

        # Case B: different directives with the same name -> priority suffixes
        ranked = sorted(
            idxs,
            key=lambda i: (
                DIRECTIVE_DEFS[fields[i].directive].collision_priority
                if fields[i].directive in DIRECTIVE_DEFS
                else 999
            ),
        )
        for rank, i in enumerate(ranked):
            f = fields[i]
            d = DIRECTIVE_DEFS.get(f.directive)
            if rank == 0:
                f.column_name = column_name
            elif d is not None and d.collision_suffix:
                f.column_name = column_name + d.collision_suffix
            else:
                prio = d.collision_priority if d is not None else 999
                f.column_name = f"{column_name}_{prio}"

        # number duplicates that remain after suffixing (x_in, x_in_2, …)
        name_counts: dict[str, int] = {}
        for i in ranked:
            f = fields[i]
            cnt = name_counts.get(f.column_name, 0) + 1
            name_counts[f.column_name] = cnt
            if cnt > 1:
                f.column_name = f"{f.column_name}_{cnt}"


# ---------------------------------------------------------------------------
# Auto-detection  (reference :1217-1269)
# ---------------------------------------------------------------------------
def detect_format(sample_lines: list[str]) -> tuple[str, ParsedFormat]:
    """Try combined, then common; a format wins when it matches ≥ half of
    the sampled lines. Returns (format_type, parsed_format) with
    format_type in {'combined','common','unknown'}."""
    if not sample_lines:
        return "unknown", ParsedFormat(original_format_str="")
    half = len(sample_lines) // 2
    for name, fmt in (("combined", COMBINED_FORMAT), ("common", COMMON_FORMAT)):
        parsed = parse_format_string(fmt)
        matches = sum(1 for ln in sample_lines if ln and parsed.parse_line(ln) is not None)
        if matches > 0 and matches >= half:
            return name, parsed
    return "unknown", ParsedFormat(original_format_str="")
