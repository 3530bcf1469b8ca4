"""Public column-function library for httpd-log analytics.

Everything here is a Catalyst expression builder (JVM-side, codegen'd —
no Python UDFs), usable on any DataFrame produced by `read_httpd_log`
or on arbitrary log-shaped tables. Mirrors the analytic idioms the
reference demonstrates in its README/docs queries
(/root/reference/README.md:97-122, docs/read_httpd_log.md:226-283)
as reusable building blocks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..sources.exprs import APACHE_TS_PATTERN, micros_to_interval, translate_strftime
from .udtf import ExplodePathSegments, ExplodeQueryParams, register_udtfs

__all__ = [
    "ExplodeQueryParams",
    "ExplodePathSegments",
    "register_udtfs",
    "apache_timestamp",
    "strftime_timestamp",
    "micros_to_interval",
    "status_class",
    "is_error",
    "is_bot",
    "ua_family",
    "url_path_depth",
    "path_extension",
    "query_param",
    "human_bytes",
    "ip_prefix",
    "interval_micros",
]


def apache_timestamp(col: Column) -> Column:
    """Parse an Apache CLF timestamp body `10/Oct/2000:13:55:36 -0700`
    (without brackets) to a UTC-normalized timestamp. Session timezone
    must be UTC for reference parity (get_spark pins it)."""
    return F.to_timestamp(col, APACHE_TS_PATTERN)


def strftime_timestamp(col: Column, strftime_fmt: str) -> Column:
    """Parse a strftime-formatted timestamp string (e.g. `%Y-%m-%d
    %H:%M:%S`) by translating the format to a Spark datetime pattern."""
    _, pattern, _ = translate_strftime(strftime_fmt)
    return F.to_timestamp(col, pattern)


def status_class(status: Column) -> Column:
    """HTTP status → '1xx'..'5xx' class label (NULL-safe)."""
    return F.when(
        status.isNotNull(), F.concat((status / 100).cast("int").cast("string"), F.lit("xx"))
    )


def is_error(status: Column) -> Column:
    """True for 4xx/5xx responses."""
    return status >= 400


def is_bot(user_agent: Column) -> Column:
    """Heuristic crawler detection on a User-Agent column."""
    return user_agent.rlike("(?i)(bot|crawler|spider|slurp|curl|wget)")


def ua_family(user_agent: Column) -> Column:
    """Coarse User-Agent family: bot / browser engine / cli / other.

    First-match-wins CASE chain (bots before browsers: crawler UAs often
    embed browser tokens). Pure regexps — stays in codegen."""
    ua = user_agent
    return (
        F.when(ua.isNull() | (ua == "-"), "unknown")
        .when(ua.rlike("(?i)(bot|crawler|spider|slurp)"), "bot")
        .when(ua.rlike("(?i)(curl|wget|python-requests|httpclient|libwww)"), "cli")
        .when(ua.rlike("(?i)edg(e|a|ios)?/"), "edge")
        .when(ua.rlike("(?i)(opr|opera)/"), "opera")
        .when(ua.rlike("(?i)chrome/"), "chrome")
        .when(ua.rlike("(?i)firefox/"), "firefox")
        .when(ua.rlike("(?i)safari/"), "safari")
        .when(ua.rlike("(?i)msie |trident/"), "ie")
        .otherwise("other")
    )


def url_path_depth(path: Column) -> Column:
    """Number of non-empty path segments: '/a/b/c.html' -> 3."""
    return F.size(F.filter(F.split(path, "/"), lambda s: s != ""))


def path_extension(path: Column) -> Column:
    """Lower-cased file extension of the request path, NULL when absent."""
    ext = F.regexp_extract(path, r"\.([A-Za-z0-9]+)$", 1)
    return F.when(ext != "", F.lower(ext))


def query_param(query_string: Column, name: str) -> Column:
    """Value of one query parameter from a `?a=1&b=2` query_string column
    (as produced by %r decomposition / %q), NULL when absent."""
    val = F.regexp_extract(query_string, r"[?&]" + name + r"=([^&]*)", 1)
    return F.when((query_string.isNotNull()) & (val != ""), val)


def human_bytes(n: Column) -> Column:
    """Bytes → human-readable '1.2 KiB' / '3.4 MiB' string."""
    kib, mib, gib = 1024.0, 1024.0**2, 1024.0**3
    return (
        F.when(n >= gib, F.concat(F.round(n / gib, 1).cast("string"), F.lit(" GiB")))
        .when(n >= mib, F.concat(F.round(n / mib, 1).cast("string"), F.lit(" MiB")))
        .when(n >= kib, F.concat(F.round(n / kib, 1).cast("string"), F.lit(" KiB")))
        .otherwise(F.concat(n.cast("string"), F.lit(" B")))
    )


def ip_prefix(ip: Column, octets: int = 3) -> Column:
    """First `octets` octets of an IPv4 address — coarse client grouping
    ('192.168.1.7' -> '192.168.1')."""
    return F.concat_ws(".", F.slice(F.split(ip, r"\."), 1, octets))


def interval_micros(interval: Column) -> Column:
    """DayTimeIntervalType → microseconds as BIGINT (the reference's
    INTERVAL columns normalized for arithmetic / oracle comparison).
    Casting an interval to BIGINT truncates to its end-field unit
    (seconds), so route through epoch-0 timestamp arithmetic instead."""
    return F.unix_micros(F.timestamp_micros(F.lit(0)) + interval)
