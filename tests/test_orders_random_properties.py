"""Randomized oracle parity for the orders-only analytics family.

Completes the randomized matrix (tpch joins / docs / events /
embeddings / orders): random order streams per seed — price ties by
construction (drawn from a small price grid), cents-rounding-edge
values, skewed and single-order customers, month-boundary and
duplicated dates — with full row-set Spark == DuckDB parity for every
orders-only registry entry (auto-selected, so new operators inherit
the sweep). Deterministic seeds, so failures replay."""

import random
import re

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY, TABLES

from .oracle_check import row_set

_OTHER_TABLES = [t for t in TABLES if t != "orders"]

_ORDER_QUERIES = sorted(
    name
    for name, qd in REGISTRY.items()
    if qd.oracle_sql
    and re.search(r"\borders\b", qd.oracle_sql)
    and not any(re.search(rf"\b{t}\b", qd.oracle_sql) for t in _OTHER_TABLES)
)

SEEDS = [3, 43]

PRICES = [0.0, 0.005, 50.0, 100.0, 100.0, 2499.99, 99999999.99]


def _gen_orders(rng: random.Random):
    n_cust = rng.randint(2, 12)
    n_orders = rng.randint(15, 80)
    rows = []
    for k in range(1, n_orders + 1):
        day = rng.randint(0, 900)
        rows.append(
            (
                k,
                rng.randint(1, n_cust),
                rng.choice(["F", "O", "P"]),
                rng.choice(PRICES + [round(rng.uniform(1, 50000), 2)]),
                f"{2023 + day // 365}-{1 + (day // 31) % 12:02d}-{1 + day % 28:02d}"
                f" {rng.choice([0, 12]):02d}:00:00",
                rng.choice(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
                ),
            )
        )
    return rows


@pytest.fixture(scope="module", params=SEEDS)
def random_orders_dir(request, tmp_path_factory, spark):
    rng = random.Random(request.param)
    d = tmp_path_factory.mktemp(f"rand_ord_{request.param}")
    spark.createDataFrame(
        _gen_orders(rng),
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, ds string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "cast(ds as timestamp) as o_orderdate", "o_orderpriority",
    ).coalesce(1).write.parquet(str(d / "orders.parquet"))
    return str(d)


def test_autoselection_found_the_family():
    assert len(_ORDER_QUERIES) >= 15, _ORDER_QUERIES


@pytest.mark.parametrize("name", _ORDER_QUERIES)
def test_random_orders_parity(spark, random_orders_dir, name):
    qd = REGISTRY[name]
    srows = [tuple(r) for r in qd.spark_fn(spark, random_orders_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM"
        f" read_parquet('{random_orders_dir}/orders.parquet/*.parquet')"
    )
    orows = con.execute(qd.oracle_sql).fetchall()
    assert row_set(srows) == row_set(orows), name
