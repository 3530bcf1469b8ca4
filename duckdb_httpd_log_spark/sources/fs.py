"""Bind-time filesystem abstraction (local fast path + Hadoop FileSystem).

The reference routes ALL bind-time I/O through DuckDB's FileSystem
abstraction — glob expansion via the MultiFile layer
(saygox/duckdb-httpd-log `src/httpd_log_multi_file_info.cpp:90-109`) and
compression auto-detect inside the file opener
(`src/httpd_log_buffered_reader.cpp:6`) — so `read_httpd_log` works on
any filesystem the host has registered (s3://, hdfs://, ...), not just
the driver's local disk.

The Spark-native equivalent of that abstraction is Hadoop's
`FileSystem` API, reached driver-side through the JVM gateway: any URI
scheme the *executors* can scan (`file:`, `hdfs:`, `s3a:`, `gs:`,
`abfs:`, `wasb:`, ...) resolves driver-side through the very same
`Path.getFileSystem(hadoopConf)` call, so bind-time sampling and glob
expansion automatically agree with what the cluster can read — no
second credential/config path to keep in sync.

Scheme routing:
- no scheme  -> plain-Python `os`/`glob`/`open` (no JVM round-trips);
- any scheme (including `file:`) -> Hadoop FileSystem via the gateway.
"""

from __future__ import annotations

import glob as _glob
import os
import re
from typing import Optional, Sequence, Union

from pyspark.sql import SparkSession

PathLike = Union[str, Sequence[str]]

# URI scheme per RFC 3986 (single-letter "schemes" are Windows drive
# letters, not schemes — require >= 2 chars like Hadoop's Path does).
# `://` is optional: Hadoop canonicalizes file URIs to `file:/path`.
_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]+):")

_GLOB_CHARS = "*?[{"


def scheme_of(path: str) -> Optional[str]:
    m = _SCHEME_RE.match(path)
    return m.group(1).lower() if m else None


def has_scheme(path: str) -> bool:
    return scheme_of(path) is not None


def _session_or_none(spark: Optional[SparkSession]) -> Optional[SparkSession]:
    return spark or SparkSession.getActiveSession()


# pyarrow URI schemes differ from Hadoop's for two filesystems
_PA_SCHEME_MAP = {"s3a": "s3", "gs": "gcs"}


def _pyarrow_fs(path: str):
    """(pyarrow FileSystem, fs-relative path, original scheme) — the
    session-less fallback used where no JVM gateway exists (Python
    DataSource planning, streaming python workers)."""
    import pyarrow.fs as pafs

    scheme = scheme_of(path)
    uri = re.sub(
        r"^([A-Za-z][A-Za-z0-9+.\-]+):",
        lambda m: _PA_SCHEME_MAP.get(m.group(1).lower(), m.group(1)) + ":",
        path,
    )
    fs, rel = pafs.FileSystem.from_uri(uri)
    return fs, rel, scheme


def _pa_uri(scheme: str, fs_path: str) -> str:
    """Rebuild a scheme-qualified URI from a pyarrow fs-relative path
    (local paths are absolute: file:///...; object stores are
    bucket-relative: s3a://bucket/key)."""
    return f"{scheme}://{fs_path}"


def _expand_remote_pyarrow(pattern: str) -> list[str]:
    """Glob/dir/file expansion through pyarrow.fs. Globs are resolved by
    recursively listing the deepest non-glob directory prefix and
    fnmatch-ing each path — fnmatch's `*` spans path separators (unlike
    Hadoop's), which is harmless for the log-glob shapes this serves."""
    import fnmatch

    import pyarrow.fs as pafs

    scheme = scheme_of(pattern)
    if not any(ch in pattern for ch in _GLOB_CHARS):
        fs, rel, _ = _pyarrow_fs(pattern)
        info = fs.get_file_info(rel)
        if info.type == pafs.FileType.NotFound:
            return []
        if info.type == pafs.FileType.Directory:
            sel = pafs.FileSelector(rel, recursive=True)
            return [
                _pa_uri(scheme, i.path)
                for i in fs.get_file_info(sel)
                if i.type == pafs.FileType.File
            ]
        return [_pa_uri(scheme, info.path)]
    # base = everything up to the last '/' before the first glob char
    first_glob = min(pattern.index(c) for c in _GLOB_CHARS if c in pattern)
    base = pattern[:first_glob].rsplit("/", 1)[0]
    fs, rel, _ = _pyarrow_fs(base)
    info = fs.get_file_info(rel)
    if info.type != pafs.FileType.Directory:
        return []
    sel = pafs.FileSelector(rel, recursive=True)
    # compare fs-relative paths (leading slashes normalized away so the
    # same fnmatch works for local absolute and bucket-relative paths)
    rel_pattern = _SCHEME_RE.sub("", pattern).lstrip("/")
    out = []
    for i in fs.get_file_info(sel):
        if i.type == pafs.FileType.File and fnmatch.fnmatch(i.path.lstrip("/"), rel_pattern):
            out.append(_pa_uri(scheme, i.path))
    return out


def _fs_for(spark: SparkSession, path: str):
    """(jvm, hadoop FileSystem, hadoop Path) for a URI."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, jpath


def _list_files_recursive(fs, jpath) -> list[str]:
    out: list[str] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        out.append(st.getPath().toString())
    return out


def expand_remote(spark: Optional[SparkSession], pattern: str) -> list[str]:
    """Expand one scheme-qualified pattern (glob / directory / file) into
    full URIs, mirroring the local `expand_paths` semantics: directories
    recurse, globs expand (glob hits that are directories recurse too),
    missing paths yield []. With no SparkSession in reach (Python
    DataSource planning / streaming workers have no JVM gateway) the
    expansion falls back to pyarrow.fs."""
    spark = _session_or_none(spark)
    if spark is None:
        return _expand_remote_pyarrow(pattern)
    _jvm, fs, jpath = _fs_for(spark, pattern)
    files: list[str] = []
    if any(ch in pattern for ch in _GLOB_CHARS):
        statuses = fs.globStatus(jpath)
        if statuses is not None:
            for st in statuses:
                if st.isDirectory():
                    files.extend(_list_files_recursive(fs, st.getPath()))
                else:
                    files.append(st.getPath().toString())
    else:
        if fs.exists(jpath):
            st = fs.getFileStatus(jpath)
            if st.isDirectory():
                files.extend(_list_files_recursive(fs, jpath))
            else:
                files.append(st.getPath().toString())
    return files


def _expand_local(p: str) -> list[str]:
    files: list[str] = []
    if os.path.isdir(p):
        for root, _dirs, names in os.walk(p):
            files.extend(os.path.join(root, f) for f in sorted(names))
    elif any(ch in p for ch in "*?["):
        files.extend(sorted(_glob.glob(p, recursive=True)))
    elif os.path.exists(p):
        files.append(p)
    return files


def expand_paths(path: PathLike, spark: Optional[SparkSession] = None) -> list[str]:
    """Expand glob patterns / directories into a sorted, deduped file
    list. Scheme-less patterns use plain Python (no JVM); anything with
    a URI scheme resolves through Hadoop's FileSystem (same code path
    the executors will scan with). Mixed lists are fine."""
    patterns = [path] if isinstance(path, str) else list(path)
    files: list[str] = []
    for p in patterns:
        if has_scheme(p):
            files.extend(expand_remote(spark, p))
        else:
            files.extend(_expand_local(p))
    return sorted(dict.fromkeys(files))


def read_head(spark: Optional[SparkSession], path: str, n: int) -> bytes:
    """First <= n bytes of a file on any filesystem (local: plain open)."""
    if not has_scheme(path):
        with open(path, "rb") as fh:
            return fh.read(n)
    spark = _session_or_none(spark)
    if spark is None:
        fs, rel, _ = _pyarrow_fs(path)
        with fs.open_input_stream(rel) as stream:
            return stream.read(n)
    jvm, fs, jpath = _fs_for(spark, path)
    stream = fs.open(jpath)
    try:
        # commons-io is on Spark's classpath; BoundedInputStream caps the
        # read so a multi-GB remote file costs one ranged request, and
        # toByteArray returns byte[] which py4j hands back as bytes.
        bounded = jvm.org.apache.commons.io.input.BoundedInputStream(stream, n)
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(bounded)
        return bytes(data)
    finally:
        stream.close()


def read_all(spark: Optional[SparkSession], path: str) -> bytes:
    """Whole file as bytes (for small config files on any filesystem)."""
    if not has_scheme(path):
        with open(path, "rb") as fh:
            return fh.read()
    spark = _session_or_none(spark)
    if spark is None:
        fs, rel, _ = _pyarrow_fs(path)
        with fs.open_input_stream(rel) as stream:
            return stream.read()
    jvm, fs, jpath = _fs_for(spark, path)
    stream = fs.open(jpath)
    try:
        return bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(stream))
    finally:
        stream.close()
