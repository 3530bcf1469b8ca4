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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    SimpleDataSourceStreamReader,
    StringContains,
)

from .logformat import generate_schema
from .pyconvert import build_row_converter, error_row, iter_log_lines
from .reader import _SPARK_TYPES, expand_paths, resolve_format

# filters we evaluate executor-side before rows cross the Arrow boundary
# (on by-value-comparable columns only — timestamps/intervals stay with
# Spark to avoid tz-representation mismatches)
_PUSHABLE_TYPES = {"string", "int", "bigint", "boolean"}


def _eval_filter(f, v) -> bool:
    if isinstance(f, IsNull):
        return v is None
    if isinstance(f, IsNotNull):
        return v is not None
    if v is None:
        return False
    if isinstance(f, EqualTo):
        return v == f.value
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, In):
        return v in f.value
    if isinstance(f, StringContains):
        return f.value in v
    return True


def _schema_ddl(schema: list[tuple[str, str]]) -> str:
    return ", ".join(f"{name} {_SPARK_TYPES[t]}" for name, t in schema)


def _parse_bool(v) -> bool:
    return str(v).lower() in ("1", "true", "yes")


_VF_TOKEN = r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*(>=|<=|=|>|<)\s*(-?\d+)\s*"
_VF_IN = r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+IN\s*\(([^)]*)\)\s*"


def parse_value_filter(expr: str, int_cols: set) -> list[tuple]:
    """Parse the streaming ``value_filter`` option: AND-joined integer
    conjuncts of shape ``col <cmp> n`` or ``col IN (a, b, ...)`` over
    the format's int/bigint columns. Returns [(col, kind, payload)]
    with kind 'iv' -> (lo, hi) closed interval (None = open side) or
    'in' -> frozenset. Raises on anything else — the option is a
    visible-semantics contract (like line_filter), so a silently
    ignored conjunct would change results."""
    import re

    out: list[tuple] = []
    for part in re.split(r"(?i)\s+AND\s+", expr.strip()):
        m = re.fullmatch(_VF_IN, part, re.IGNORECASE)
        if m:
            col = m.group(1)
            vals = frozenset(int(v) for v in m.group(2).split(","))
            if col not in int_cols or not vals:
                raise ValueError(f"value_filter: '{col}' is not an int column")
            out.append((col, "in", vals))
            continue
        m = re.fullmatch(_VF_TOKEN, part)
        if not m:
            raise ValueError(
                f"value_filter: cannot parse conjunct {part!r} "
                "(supported: col >=|>|<=|<|= n, col IN (a, b))"
            )
        col, op, n = m.group(1), m.group(2), int(m.group(3))
        if col not in int_cols:
            raise ValueError(f"value_filter: '{col}' is not an int column")
        iv = {
            ">=": (n, None),
            ">": (n + 1, None),
            "<=": (None, n),
            "<": (None, n - 1),
            "=": (n, n),
        }[op]
        out.append((col, "iv", iv))
    return out


def _vf_required_intervals(conjuncts: list[tuple]) -> dict:
    """{col: (lo, hi)} hull the colstats prune consults (IN becomes its
    hull — over-approximation is sound for pruning)."""
    req: dict = {}
    for col, kind, payload in conjuncts:
        lo, hi = payload if kind == "iv" else (min(payload), max(payload))
        lo0, hi0 = req.get(col, (None, None))
        if lo is not None:
            lo0 = lo if lo0 is None else max(lo0, lo)
        if hi is not None:
            hi0 = hi if hi0 is None else min(hi0, hi)
        req[col] = (lo0, hi0)
    return req


def _vf_row_ok(conjuncts: list[tuple], row, idx: dict) -> bool:
    """Row-level evaluation — NULL fails every conjunct (int comparison
    semantics, identical in Python and Spark for int values)."""
    for col, kind, payload in conjuncts:
        v = row[idx[col]]
        if v is None:
            return False
        if kind == "in":
            if v not in payload:
                return False
        else:
            lo, hi = payload
            if (lo is not None and v < lo) or (hi is not None and v > hi):
                return False
    return True


class HttpdLogDataSource(DataSource):
    """``format("httpd_log")`` — options: path, format_type, format_str,
    conf, raw, line_filter (pre-regex substring skip, batch + stream;
    ignored in raw mode), value_filter (stream only: AND-joined int
    conjuncts with line_filter-style visible semantics, consulting the
    per-file column-stats sidecar to skip whole files per trigger)."""

    @classmethod
    def name(cls) -> str:
        return "httpd_log"

    def _path(self) -> str:
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
        return path

    def _bind(self, allow_empty: bool = False):
        files = expand_paths(self._path())
        parsed, _ftype, raw_mode = resolve_format(
            files,
            self.options.get("format_type"),
            self.options.get("format_str"),
            self.options.get("conf"),
            _parse_bool(self.options.get("raw", "false")),
        )
        if not files and not allow_empty:
            raise ValueError("No files found for httpd log reading")
        return files, parsed, raw_mode

    def schema(self) -> str:
        # streaming may start on an empty directory: schema is derivable
        # without files whenever the format is explicit (format_str /
        # format_type) — exactly the cases resolve_format never samples
        explicit = self.options.get("format_str") or self.options.get("format_type")
        _files, parsed, raw_mode = self._bind(allow_empty=bool(explicit))
        return _schema_ddl(generate_schema(parsed, raw_mode))

    def reader(self, schema) -> "HttpdLogReader":
        return HttpdLogReader(*self._bind(), self.options.get("line_filter"))

    def simpleStreamReader(self, schema) -> "HttpdLogStreamReader":
        explicit = self.options.get("format_str") or self.options.get("format_type")
        _files, parsed, raw_mode = self._bind(allow_empty=bool(explicit))
        return HttpdLogStreamReader(
            self._path(),
            parsed,
            raw_mode,
            self.options.get("line_filter"),
            self.options.get("value_filter"),
            self.options.get("colstats_dir"),
        )


_ARROW_BATCH_ROWS = 8192

_PY_TYPES = {
    "string": "StringType",
    "int": "IntegerType",
    "bigint": "LongType",
    "timestamp": "TimestampType",
    "interval": "DayTimeIntervalType",
    "boolean": "BooleanType",
}


def _arrow_schema(schema: list[tuple[str, str]]):
    """pyarrow schema matching Spark's arrow mapping for our type set —
    built without a SparkSession (executors have none)."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import to_arrow_schema

    struct = T.StructType(
        [T.StructField(name, getattr(T, _PY_TYPES[t])()) for name, t in schema]
    )
    return to_arrow_schema(struct)


class HttpdLogReader(DataSourceReader):
    def __init__(self, files, parsed, raw_mode, line_filter=None):
        self.files = files
        self.parsed = parsed
        self.raw_mode = raw_mode
        # same contract as read_httpd_log's line_filter=: a substring
        # needle checked BEFORE the parse regex (visible semantics —
        # false positives are NOT re-filtered); ignored in raw mode,
        # whose per-file line numbers must count every line
        self.line_filter = None if raw_mode else (line_filter or None)
        self.pushed: list[tuple[object, int]] = []  # (filter, row index)

    def pushFilters(self, filters):
        """Partial pushdown: supported predicates are ALSO applied
        executor-side in `read` (rows drop before the Arrow transfer),
        but every filter is returned so Spark re-verifies above the scan
        — pushdown here is a row-volume optimization, never a
        correctness dependency."""
        schema = generate_schema(self.parsed, self.raw_mode)
        index = {name: i for i, (name, _t) in enumerate(schema)}
        types = dict(schema)
        supported = (EqualTo, GreaterThan, LessThan, In, IsNull, IsNotNull, StringContains)
        for f in filters:
            attr = getattr(f, "attribute", None)
            if (
                isinstance(f, supported)
                and attr is not None
                and len(attr) == 1
                and attr[0] in index
                and types[attr[0]] in _PUSHABLE_TYPES
            ):
                self.pushed.append((f, index[attr[0]]))
            yield f

    def partitions(self) -> list[InputPartition]:
        # one partition per file: the reference's parallelism unit.
        # log_file is file-constant, so a pushed equality/IN/contains
        # filter on it prunes WHOLE FILES here — the datasource twin of
        # the main reader's listing prune. Only filter classes whose
        # Python evaluation is exactly Spark's string semantics qualify
        # (EqualTo / In / StringContains — ordered comparisons are
        # excluded: Python code-point order vs UTF8String byte order
        # can disagree outside ASCII). Spark re-verifies every filter
        # above the scan, so this is row-identical by construction.
        schema = generate_schema(self.parsed, self.raw_mode)
        names = [n for n, _t in schema]
        if "log_file" in names:
            lf_idx = names.index("log_file")
            flt = [
                f
                for f, i in self.pushed
                if i == lf_idx and isinstance(f, (EqualTo, In, StringContains))
            ]
            if flt:
                return [
                    InputPartition(fn)
                    for fn in self.files
                    if all(_eval_filter(f, fn) for f in flt)
                ]
        return [InputPartition(f) for f in self.files]

    def read(self, partition: InputPartition):
        """Yield pyarrow RecordBatches (Spark 4 accepts them from python
        sources directly): columnar transfer beats per-row pickling by a
        wide margin on this path."""
        import pyarrow as pa

        fname = partition.value
        parsed, raw, pushed = self.parsed, self.raw_mode, self.pushed
        convert = build_row_converter(parsed)
        compiled = parsed.compiled
        schema = generate_schema(parsed, raw)
        arrow_schema = _arrow_schema(schema)
        ncols = len(schema)
        buf: list[list] = [[] for _ in range(ncols)]

        def flush():
            arrays = [
                pa.array(buf[i], type=arrow_schema.field(i).type) for i in range(ncols)
            ]
            for col in buf:
                col.clear()
            return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)

        lf = self.line_filter
        for line_number, line in iter_log_lines(fname):
            if not line:
                continue  # empty lines advance the counter, emit no row
            if lf is not None and lf not in line:
                continue  # needle miss: the line never reaches the regex
            m = compiled.match(line) if compiled else None
            if m is not None and m.end() == len(line):
                row = convert(m.groups())
                if raw:
                    row = (*row, fname, line_number, False, line)
                else:
                    row = (*row, fname)
            elif raw:
                row = (*error_row(parsed), fname, line_number, True, line)
            else:
                continue
            if all(_eval_filter(f, row[i]) for f, i in pushed):
                for i, v in enumerate(row):
                    buf[i].append(v)
                if len(buf[0]) >= _ARROW_BATCH_ROWS:
                    yield flush()
        if buf[0]:
            yield flush()


class HttpdLogStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch streaming over a log directory/glob:
    ``spark.readStream.format("httpd_log")`` — the SQL-facing streaming
    twin of `streaming.log_stream.read_httpd_log_stream`.

    Discovery model mirrors the reference's unit of work (whole files,
    one reader per file, src/httpd_log_multi_file_info.cpp:236-249): the
    offset is the sorted set of files already emitted; each micro-batch
    parses files that appeared since. Files are treated as immutable
    once they appear (the standard log-rotation contract); offsets are
    JSON dicts so a restarted query replays deterministically via
    readBetweenOffsets.

    This simple reader prefetches on the driver — right for control-rate
    streams (the SQL surface, tailing a host's rotated logs). The
    executor-parallel path for high-rate firehoses remains
    `read_httpd_log_stream` (readStream.text + the codegen'd projection).
    """

    def __init__(
        self,
        path: str,
        parsed,
        raw_mode: bool,
        line_filter=None,
        value_filter=None,
        colstats_dir=None,
    ):
        self.path = path
        self.parsed = parsed
        self.raw_mode = raw_mode
        # r9 verdict item 5: the streaming source gets the same
        # pre-regex substring skip as the batch paths (ignored in raw
        # mode — line numbers must count every line)
        self.line_filter = None if raw_mode else (line_filter or None)
        self.convert = build_row_converter(parsed)
        self.schema_cols = generate_schema(parsed, raw_mode)
        # STREAMING COLSTATS (r13 verdict item 6): value_filter is an
        # AND of int conjuncts with line_filter-style VISIBLE semantics
        # (rows failing it never appear). Its payoff: per trigger, a
        # CLOSED file whose cached per-file min/max (the colstats
        # sidecar, keyed on a fresh (mtime, size) + this reader's
        # format/line_filter fingerprint) cannot satisfy the conjuncts
        # is never opened. Growing files fail the stale-check and are
        # always read; replay consistency needs no prune bookkeeping
        # because a prunable file contributes zero post-filter rows
        # whether or not it is opened. Stats are GATHERED here too, as
        # a side effect of each full-file read (stat taken BEFORE the
        # read: a grow race yields superset stats — sound), so a
        # restarted or second query over a rotated directory skips the
        # cold files outright.
        self.int_cols = {n for n, t in self.schema_cols if t in ("int", "bigint")}
        if value_filter and raw_mode:
            raise ValueError("value_filter is not supported in raw mode")
        self.vf = (
            parse_value_filter(value_filter, self.int_cols) if value_filter else None
        )
        self.vf_req = _vf_required_intervals(self.vf) if self.vf else {}
        self.col_idx = {n: i for i, (n, _t) in enumerate(self.schema_cols)}
        # disk-backed sidecar (see colstats.py): the stream runner is a
        # fresh process per query and only ever reads NEW files, so the
        # prune's real payoff — cold-starting an alerting query over a
        # rotated directory's history — needs stats that outlive the
        # process. Opt-in; None keeps the in-memory cache only.
        self.colstats_dir = colstats_dir
        import hashlib

        self.colstats_fp = hashlib.md5(
            f"{parsed.regex_pattern}\x00{self.line_filter or ''}".encode()
        ).hexdigest()

    def _stat_sig(self, fname: str):
        import os

        try:
            st = os.stat(fname)
            return (st.st_mtime, st.st_size)
        except OSError:
            return None  # remote/pyarrow paths: never pruned, never gathered

    def _prunable(self, fname: str) -> bool:
        """True when fresh cached stats prove no row of ``fname`` can
        pass the value_filter — the file is skipped without opening."""
        if not self.vf:
            return False
        from . import colstats as CS

        import os

        sig = self._stat_sig(fname)
        if sig is None:
            return False
        key = os.path.abspath(fname)
        ent = CS._COLSTATS.get((self.colstats_fp, key))
        if ent is None and self.colstats_dir:
            ent = CS.load_persisted(self.colstats_dir, self.colstats_fp, key)
        if ent is None or tuple(ent[0]) != sig:
            return False
        return CS._disjoint(ent[1], self.vf_req)

    def _gather_begin(self, fname: str):
        """(sig, accumulator) to thread through a full-file read, or
        None when stats cannot be keyed (unstattable path)."""
        if not self.int_cols or self.raw_mode:
            return None
        sig = self._stat_sig(fname)
        if sig is None:
            return None
        return (sig, {c: (None, None) for c in self.int_cols})

    def _gather_commit(self, fname: str, acc) -> None:
        import os

        from . import colstats as CS

        sig, stats = acc
        key = os.path.abspath(fname)
        CS._COLSTATS[(self.colstats_fp, key)] = (sig, stats)
        if self.colstats_dir:
            CS.persist(self.colstats_dir, self.colstats_fp, key, sig, stats)

    def initialOffset(self) -> dict:
        return {"files": []}

    def _rows_for(self, fname: str):
        parsed, raw, convert = self.parsed, self.raw_mode, self.convert
        compiled = parsed.compiled
        lf = self.line_filter
        vf, idx = self.vf, self.col_idx
        # stats accumulate over EVERY parsed row (pre-value_filter):
        # the sidecar describes the file under this format/line_filter
        # fingerprint, not under any particular query's conjuncts
        acc = self._gather_begin(fname)
        stats = acc[1] if acc else None
        for line_number, line in iter_log_lines(fname):
            if not line:
                continue
            if lf is not None and lf not in line:
                continue  # pre-regex needle skip (never in raw mode)
            m = compiled.match(line) if compiled else None
            if m is not None and m.end() == len(line):
                row = convert(m.groups())
                if stats is not None:
                    for c in stats:
                        v = row[idx[c]]
                        if v is not None:
                            lo, hi = stats[c]
                            stats[c] = (
                                v if lo is None or v < lo else lo,
                                v if hi is None or v > hi else hi,
                            )
                if vf is not None and not _vf_row_ok(vf, row, idx):
                    continue
                if raw:
                    yield (*row, fname, line_number, False, line)
                else:
                    yield (*row, fname)
            elif raw:
                yield (*error_row(parsed), fname, line_number, True, line)
        if acc is not None:
            # full file consumed — commit under the sig statted BEFORE
            # the read (grow race -> superset stats -> sound to prune)
            self._gather_commit(fname, acc)

    def _rows_for_files(self, files: list[str]) -> list:
        # materialized list, not a generator: Spark's simple-reader
        # wrapper caches the prefetched batch with copy.copy(iterator),
        # which generators don't support
        out: list = []
        for fname in files:
            out.extend(self._rows_for(fname))
        return out

    def read(self, start: dict):
        seen = set(start.get("files", []))
        current = expand_paths(self.path)
        new = [f for f in current if f not in seen]
        # streaming colstats prune: closed files whose fresh-keyed
        # stats cannot satisfy the value_filter are never opened; they
        # still advance the offset (immutable-once-seen contract, and
        # replay stays row-identical — a prunable file has zero
        # post-filter rows either way)
        opened = [f for f in new if not self._prunable(f)]
        end = {"files": sorted(seen | set(new))}
        return iter(self._rows_for_files(opened)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("files", []))
        replay = [f for f in end.get("files", []) if f not in seen]
        return iter(self._rows_for_files(replay))

    def commit(self, end: dict) -> None:
        pass
