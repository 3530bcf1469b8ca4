"""Property tests for the bind-time filesystem layer and hive-partition
key extraction — pure Python, no SparkSession."""

import string

from hypothesis import given
from hypothesis import strategies as st

from duckdb_httpd_log_spark.sources import fs as FS
from duckdb_httpd_log_spark.sources.reader import _hive_partition_keys

SCHEMES = ["s3a", "hdfs", "gs", "abfs", "wasb", "file", "s3"]


@given(st.sampled_from(SCHEMES), st.text(alphabet=string.ascii_lowercase + "/.-_", min_size=1))
def test_scheme_roundtrip(scheme, rest):
    assert FS.scheme_of(f"{scheme}://{rest}") == scheme


@given(st.text(alphabet=string.ascii_lowercase + string.digits + "/.-_ ", min_size=0))
def test_plain_paths_never_have_scheme(path):
    # paths without a colon can never be classified as remote
    if ":" not in path:
        assert FS.scheme_of(path) is None
        assert FS.scheme_of("/" + path) is None


@given(st.sampled_from(string.ascii_uppercase))
def test_drive_letters_are_not_schemes(letter):
    assert FS.scheme_of(f"{letter}:/logs/x.log") is None
    assert FS.scheme_of(f"{letter}:\\logs\\x.log") is None


@given(
    st.lists(
        st.tuples(
            st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=5),
            st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=5),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda kv: kv[0],
    ),
    st.integers(min_value=1, max_value=4),
)
def test_hive_keys_extracted_in_order(kvs, nfiles):
    segs = "/".join(f"{k}={v}" for k, v in kvs)
    files = [f"/base/{segs}/part{i}.log" for i in range(nfiles)]
    assert _hive_partition_keys(files) == [k for k, _v in kvs]


def test_hive_keys_mismatch_raises():
    import pytest

    with pytest.raises(ValueError, match="differ"):
        _hive_partition_keys(["/b/date=1/x.log", "/b/host=a/y.log"])


def test_hive_keys_none_raises():
    import pytest

    with pytest.raises(ValueError, match="no key=value"):
        _hive_partition_keys(["/plain/dir/x.log"])
