import os

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")

# Shared scale-factor dir for tests that read the driver-generated
# parquet tables; overridable so the suite runs wherever the data
# lives (r7 ADVICE: the dtype-parity contract hardcoded this path).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from duckdb_httpd_log_spark import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


def data(*parts: str) -> str:
    return os.path.join(DATA, *parts)
