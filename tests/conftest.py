import os

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="session")
def spark():
    from duckdb_httpd_log_spark import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


def data(*parts: str) -> str:
    return os.path.join(DATA, *parts)
