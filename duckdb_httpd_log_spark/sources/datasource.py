"""Spark 4 Python Data Source for Apache httpd access logs.

The SQL-facing twin of `read_httpd_log`: after
``spark.dataSource.register(HttpdLogDataSource)`` the logs are readable
with ``spark.read.format("httpd_log").option(...).load(path)``; a temp
view over that gives the same "table function in SQL" ergonomics as the
reference's ``read_httpd_log(...)``
(src/httpd_log_table_function.cpp:893-903). (Spark's ``CREATE TABLE ...
USING <python-source>`` currently does not forward OPTIONS to the
reader, so the view route is the supported SQL surface.)

Split of labor with the primary reader:
- `reader.read_httpd_log` is the throughput path — a pure-Catalyst
  regexp projection, whole-stage-codegen'd, splittable.
- this DataSource is the integration surface — one InputPartition per
  file (exactly the reference's one-reader-per-file parallelism model,
  src/httpd_log_multi_file_info.cpp:236-249), Python `re` parsing with
  the SAME compiled ParsedFormat, typed conversion in
  `pyconvert.py` mirroring the Catalyst expressions in `exprs.py`.

Bind-time work (glob expansion, sampling, format resolution, schema
generation) runs once on the driver in `schema()`, exactly where the
reference binds.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .logformat import generate_schema
from .pyconvert import build_row_converter, error_row, iter_log_lines
from .reader import _SPARK_TYPES, expand_paths, resolve_format


def _schema_ddl(schema: list[tuple[str, str]]) -> str:
    return ", ".join(f"{name} {_SPARK_TYPES[t]}" for name, t in schema)


def _parse_bool(v) -> bool:
    return str(v).lower() in ("1", "true", "yes")


class HttpdLogDataSource(DataSource):
    """``format("httpd_log")`` — options: path, format_type, format_str,
    conf, raw."""

    @classmethod
    def name(cls) -> str:
        return "httpd_log"

    def _bind(self):
        # .load(path) populates "path"; SQL CREATE TABLE surfaces the
        # location as "location" (and only at schema time also "path")
        path = self.options.get("path") or self.options.get("location")
        if not path:
            raise ValueError("httpd_log data source requires a path")
        # SQL (CREATE TABLE ... USING httpd_log) hands the location as a
        # file: URI; the python reader wants a plain local path
        if path.startswith("file:"):
            from urllib.parse import unquote, urlparse

            parsed_uri = urlparse(path)
            path = unquote(parsed_uri.path)
        files = expand_paths(path)
        parsed, _ftype, raw_mode = resolve_format(
            files,
            self.options.get("format_type"),
            self.options.get("format_str"),
            self.options.get("conf"),
            _parse_bool(self.options.get("raw", "false")),
        )
        if not files:
            raise ValueError("No files found for httpd log reading")
        return files, parsed, raw_mode

    def schema(self) -> str:
        files, parsed, raw_mode = self._bind()
        return _schema_ddl(generate_schema(parsed, raw_mode))

    def reader(self, schema) -> "HttpdLogReader":
        return HttpdLogReader(*self._bind())


class HttpdLogReader(DataSourceReader):
    def __init__(self, files, parsed, raw_mode):
        self.files = files
        self.parsed = parsed
        self.raw_mode = raw_mode

    def partitions(self) -> list[InputPartition]:
        # one partition per file: the reference's parallelism unit
        return [InputPartition(f) for f in self.files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        fname = partition.value
        parsed, raw = self.parsed, self.raw_mode
        convert = build_row_converter(parsed)
        compiled = parsed.compiled
        for line_number, line in iter_log_lines(fname):
            if not line:
                continue  # empty lines advance the counter, emit no row
            m = compiled.match(line) if compiled else None
            if m is not None and m.end() == len(line):
                row = convert(m.groups())
                if raw:
                    yield (*row, fname, line_number, False, line)
                else:
                    yield (*row, fname)
            elif raw:
                yield (*error_row(parsed), fname, line_number, True, line)
