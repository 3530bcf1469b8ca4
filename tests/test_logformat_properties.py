"""Property-based tests (hypothesis) for the LogFormat compiler.

The reference ships no property tests; these harden the most
invariant-heavy driver-side component — the format compiler — against
arbitrary directive combinations (the space its 28 sqllogictest files
sample by hand):

- compilation never crashes on any directive combination;
- output column names are unique after collision resolution;
- capture indices are consistent with the generated regex;
- the generated regex compiles and round-trips a synthetic line built
  from directive-appropriate values.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_httpd_log_spark.sources.logformat import (
    generate_schema,
    parse_format_string,
)

# the full single-letter directive space plus modifier forms
_SIMPLE = [
    "%h", "%a", "%A", "%l", "%u", "%t", "%r", "%m", "%U", "%q", "%H",
    "%p", "%k", "%X", "%P", "%D", "%T", "%s", "%>s", "%<s", "%v", "%V",
    "%B", "%b", "%I", "%O", "%S", "%f", "%L", "%R",
]
_MODIFIED = [
    "%{c}h", "%{c}a", "%{canonical}p", "%{local}p", "%{remote}p",
    "%{pid}P", "%{tid}P", "%{hextid}P", "%{us}T", "%{ms}T", "%{s}T",
    "%{sec}t", "%{msec}t", "%{usec}t", "%{msec_frac}t", "%{usec_frac}t",
    "%{User-Agent}i", "%{Referer}i", "%{Content-Length}i", "%{Age}o",
    "%{Max-Forwards}i", "%{Set-Cookie}o", "%{SESSIONID}C", "%{PATH}e",
    "%{note}n", "%{X-Trail}^ti", "%{X-Trail}^to",
]

directive = st.sampled_from(_SIMPLE + _MODIFIED)
quoted = st.booleans()


@st.composite
def format_strings(draw):
    # at most one request-line directive: the reference's collision
    # resolver tracks a single %r field (ResolveColumnNameCollisions
    # step 0 keeps one r_field_idx) and its schema generator hardcodes
    # the four sub-column names, so duplicated %r yields duplicate
    # column names in the reference too — replicated, not "fixed"
    n = draw(st.integers(min_value=1, max_value=8))
    parts = []
    have_request = False
    for _ in range(n):
        d = draw(directive)
        if d == "%r":
            if have_request:
                continue
            have_request = True
        if draw(quoted):
            parts.append(f'"{d}"')
        else:
            parts.append(d)
    return " ".join(parts)


# directive-appropriate sample values (unquoted variants must not contain
# whitespace; quoted must not contain '"')
def _sample_value(d: str) -> str:
    if d.endswith("t") and "{" not in d:
        return "[10/Oct/2000:13:55:36 -0700]"
    if d in ("%{sec}t",):
        return "971211336"
    if d in ("%{msec}t",):
        return "971211336123"
    if d in ("%{usec}t",):
        return "971211336123456"
    if d in ("%{msec_frac}t",):
        return "123"
    if d in ("%{usec_frac}t",):
        return "123456"
    if d in ("%r",):
        return "GET /x?a=1 HTTP/1.1"
    if d in ("%D", "%T", "%{us}T", "%{ms}T", "%{s}T", "%p", "%k", "%P",
             "%{canonical}p", "%{local}p", "%{remote}p", "%{pid}P",
             "%{tid}P", "%s", "%>s", "%<s", "%B", "%b", "%I", "%O", "%S",
             "%{Content-Length}i", "%{Age}o", "%{Max-Forwards}i"):
        return "1234"
    if d == "%{hextid}P":
        return "7f9a"
    if d == "%X":
        return "+"
    return "val-x"


@given(format_strings())
@settings(max_examples=200, deadline=None, derandomize=True)
def test_compiler_invariants(fmt):
    parsed = parse_format_string(fmt)

    # regex compiles in python's dialect (the shared RE2/Java subset)
    compiled = re.compile(parsed.regex_pattern)

    # capture indices are 1..num_capture_groups over non-skipped fields
    idx = [f.capture_index for f in parsed.fields if f.capture_index is not None]
    assert all(1 <= i <= parsed.num_capture_groups for i in idx)
    assert len(set(idx)) == len(idx)
    assert compiled.groups == parsed.num_capture_groups

    # schema names unique (collision resolution's core contract).
    # Exception replicated from the reference: %r's four sub-columns are
    # hardcoded at schema time (GenerateSchema :667-686) and bypass the
    # name resolver (the %r field's own name is "request"), so e.g.
    # '%r %{PATH}e' legitimately emits two "path" columns there and here.
    has_request = any(f.directive in ("%r", "%>r", "%<r") for f in parsed.fields)
    request_names = {"method", "path", "query_string", "protocol"}
    for raw_mode in (False, True):
        names = [n for n, _t in generate_schema(parsed, raw_mode)]
        if has_request:
            names = [n for n in names if n not in request_names]
        assert len(set(names)) == len(names), names

    # types are from the engine-neutral set
    assert {t for _n, t in generate_schema(parsed, True)} <= {
        "string", "int", "bigint", "timestamp", "interval", "boolean",
    }


@given(format_strings())
@settings(max_examples=200, deadline=None, derandomize=True)
def test_synthetic_line_roundtrip(fmt):
    """A line assembled from directive-appropriate values must match the
    generated regex and yield one capture per capturing field."""
    parsed = parse_format_string(fmt)
    tokens = fmt.split(" ")
    vals = []
    for tok in tokens:
        if tok.startswith('"') and tok.endswith('"'):
            # quoting wraps the full field — %t keeps its brackets inside
            vals.append(f'"{_sample_value(tok[1:-1])}"')
        else:
            v = _sample_value(tok)
            if not v.startswith("["):
                # unquoted fields match \S+ — a one-token value
                v = v.replace(" ", "_")
            vals.append(v)
    line = " ".join(vals)
    groups = parsed.parse_line(line)
    assert groups is not None, (fmt, line, parsed.regex_pattern)
    assert len(groups) == parsed.num_capture_groups
