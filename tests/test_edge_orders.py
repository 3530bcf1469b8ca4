"""Oracle parity for order/time-series operators on an ADVERSARIAL
orders corpus: price ties (positional-quantile tie-breaks), zero and
huge prices (integer-cents range), a single-day date span (gap-fill
degenerate spine), month-boundary orders (LTV month arithmetic), and
revenue concentrated in one customer (Pareto crossing at row 1).

Queries auto-selected: every registry entry whose oracle reads only
the `orders` table."""

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

_ORDERS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
    (1, 1, "F", 100.0, "2024-01-31 00:00:00", "1-URGENT"),   # month boundary
    (2, 1, "F", 100.0, "2024-02-01 00:00:00", "1-URGENT"),   # tie with 1
    (3, 1, "O", 100.0, "2024-02-29 00:00:00", "2-HIGH"),     # leap day, tie
    (4, 2, "O", 0.0, "2024-02-15 00:00:00", "2-HIGH"),       # zero price
    (5, 2, "F", 99999999.99, "2024-02-15 12:00:00", "3-MEDIUM"),  # huge price
    (6, 3, "O", 0.005, "2024-02-15 13:00:00", "3-MEDIUM"),   # cents rounding edge
    (7, 4, "F", 50.0, "2024-02-15 14:00:00", "1-URGENT"),    # single-order cust
]


@pytest.fixture(scope="module")
def ord_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("edge_ord")
    df = spark.createDataFrame(
        [(k, c, st, p, dt, pr) for k, c, st, p, dt, pr in _ORDERS],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, ds string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "cast(ds as timestamp) as o_orderdate", "o_orderpriority",
    )
    df.coalesce(1).write.parquet(str(d / "orders.parquet"))
    return str(d)


def test_autoselection_found_the_family():
    assert len(_ORDER_QUERIES) >= 4, _ORDER_QUERIES


@pytest.mark.parametrize("name", _ORDER_QUERIES)
def test_edge_orders_oracle_parity(spark, ord_dir, name):
    qd = REGISTRY[name]
    sdf = qd.spark_fn(spark, ord_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{ord_dir}/orders.parquet/*.parquet')"
    )
    orel = con.execute(qd.oracle_sql)
    ocols = [c[0].lower() for c in orel.description]
    orows = [tuple(r) for r in orel.fetchall()]
    assert scols == ocols, (scols, ocols)
    assert len(srows) == len(orows), (name, len(srows), len(orows))
    s, o = row_set(srows), row_set(orows)
    assert s == o, (
        name,
        [x for x in s if x not in set(o)][:3],
        [x for x in o if x not in set(s)][:3],
    )
