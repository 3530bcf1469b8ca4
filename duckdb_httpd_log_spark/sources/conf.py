"""`read_httpd_conf` — Apache httpd.conf LogFormat/CustomLog extractor.

Config files are small, so parsing is driver-side Python followed by
``spark.createDataFrame`` (the reference also parses everything eagerly
at bind: saygox/duckdb-httpd-log `src/httpd_conf_reader.cpp:210-248`).

Parity notes (src/httpd_conf_reader.cpp):
- tokenizer honors double quotes and backslash escapes (:9-60);
- line continuation via trailing backslash (:161-173);
- comments / empty lines skipped, directives case-insensitive (:179-198);
- `CustomLog` with a *quoted* second argument is an inline format; with a
  bare nickname reference it defines no format and is skipped (:92-134);
- `ErrorLog` lines are recognized but never produce entries (the
  reference dispatches them to a parser that rejects the directive,
  :196-197 vs :140-142);
- output schema: (log_type, format_type, nickname, format_string,
  config_file, line_number int32), empty nickname/format -> NULL
  (:230-247, :274-287).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from . import fs
from pyspark.sql.types import IntegerType, StringType, StructField, StructType


@dataclass
class ConfigEntry:
    log_type: str = ""
    format_type: str = ""
    nickname: str = ""
    format_string: str = ""
    config_file: str = ""
    line_number: int = 0


def tokenize_line(line: str) -> list[str]:
    tokens: list[str] = []
    cur: list[str] = []
    in_quotes = False
    escape_next = False
    for c in line:
        if escape_next:
            cur.append(c)
            escape_next = False
            continue
        if c == "\\":
            escape_next = True
            continue
        if c == '"':
            if in_quotes:
                tokens.append("".join(cur))
                cur.clear()
                in_quotes = False
            else:
                in_quotes = True
            continue
        if not in_quotes and c in (" ", "\t"):
            if cur:
                tokens.append("".join(cur))
                cur.clear()
            continue
        cur.append(c)
    if cur:
        tokens.append("".join(cur))
    return tokens


def _parse_directive_line(
    line: str, directive: str, config_file: str, line_number: int
) -> Optional[ConfigEntry]:
    entry = ConfigEntry(config_file=config_file, line_number=line_number)
    rest = line[len(directive) :]
    tokens = tokenize_line(rest)
    if not tokens:
        return None

    if directive == "LogFormat":
        entry.log_type = "access"
        entry.format_string = tokens[0]
        if len(tokens) >= 2 and "=" not in tokens[1]:
            entry.nickname = tokens[1]
            entry.format_type = "named"
        else:
            entry.format_type = "default"
        return entry

    if directive == "CustomLog":
        entry.log_type = "access"
        if len(tokens) < 2:
            return None
        # Inline format vs nickname reference: inspect the original line —
        # a second *quoted* argument is an inline format string.
        path_start = line.find('"')
        if path_start == -1:
            return None
        path_end = path_start + 1
        while path_end < len(line):
            if line[path_end] == '"' and line[path_end - 1] != "\\":
                break
            path_end += 1
        path_end += 1
        while path_end < len(line) and line[path_end] in (" ", "\t"):
            path_end += 1
        if path_end < len(line) and line[path_end] == '"':
            entry.format_string = tokens[1]
            entry.format_type = "inline"
            return entry
        return None  # nickname reference: defines no format

    if directive == "ErrorLogFormat":
        entry.log_type = "error"
        entry.format_string = tokens[0]
        entry.format_type = "default"
        return entry

    return None  # ErrorLog and anything else


_DIRECTIVES = ("LogFormat", "CustomLog", "ErrorLogFormat", "ErrorLog")


def parse_config_file(path: str, spark: Optional[SparkSession] = None) -> list[ConfigEntry]:
    """Parse one httpd.conf on any filesystem (local or scheme-qualified;
    conf files are small, so a whole-file read through fs.read_all is the
    right granularity)."""
    text = fs.read_all(spark, path).decode("utf-8", errors="replace")
    return parse_config_text(text, path)


def parse_config_text(text: str, path: str) -> list[ConfigEntry]:
    entries: list[ConfigEntry] = []
    line_number = 0
    continued = ""
    continued_start = 0
    for line in text.splitlines():
        line_number += 1
        if continued:
            continued += " " + line
        else:
            continued = line
            continued_start = line_number
        if continued.endswith("\\"):
            continued = continued[:-1]
            continue

        trimmed = continued.strip()
        continued = ""
        if not trimmed or trimmed.startswith("#"):
            continue

        upper = trimmed.upper()
        for d in _DIRECTIVES:
            if upper.startswith(d.upper() + " ") or upper.startswith(d.upper() + "\t"):
                entry = _parse_directive_line(trimmed, d, path, continued_start)
                if entry is not None:
                    entries.append(entry)
                break
    return entries


CONF_SCHEMA = StructType(
    [
        StructField("log_type", StringType()),
        StructField("format_type", StringType()),
        StructField("nickname", StringType()),
        StructField("format_string", StringType()),
        StructField("config_file", StringType()),
        StructField("line_number", IntegerType()),
    ]
)


def read_httpd_conf(spark: SparkSession, path: str) -> DataFrame:
    """Extract LogFormat/CustomLog/ErrorLogFormat definitions as a DataFrame."""
    files = fs.expand_paths(path, spark)
    rows = []
    for f in files:
        for e in parse_config_file(f, spark):
            rows.append(
                (
                    e.log_type,
                    e.format_type,
                    e.nickname or None,
                    e.format_string or None,
                    e.config_file,
                    e.line_number,
                )
            )
    return spark.createDataFrame(rows, CONF_SCHEMA)
