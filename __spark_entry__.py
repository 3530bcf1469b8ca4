"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query on sf0.001; `queries()` exposes
every implemented operator from SURVEY.md §2 (plus the training-data
pipeline operators) as (spark, sf_dir) -> DataFrame callables;
`oracle_sql()` gives the DuckDB-equivalent SQL for each SQL-expressible
entry. Implementations live in the duckdb_httpd_log_spark package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb_httpd_log_spark.operators  # noqa: F401  (registers queries)
from duckdb_httpd_log_spark.plans.registry import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qd = REGISTRY["q01_pricing_summary"]
    return qd.spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.spark_fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only check)."""
    return {name: qd.oracle_sql for name, qd in REGISTRY.items() if qd.oracle_sql is not None}
