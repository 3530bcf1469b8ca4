"""Oracle parity for the multi-table relational queries on an
ADVERSARIAL TPC-H micro-corpus: a region with no nations, a nation
with no customers/suppliers, a customer with no orders, discount 0 and
max, quantity/acctbal ties, negative balances, same-timestamp
shipdates — the shapes where join types (left/semi/anti), grouping
(ROLLUP/CUBE NULL rows), and tie-breaks diverge.

Queries auto-selected: every registry entry whose oracle touches only
the seven TPC-H tables (no events/documents/embeddings)."""

import re

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY

from .oracle_check import row_set

_TPCH = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
_NON_TPCH = ["events", "documents", "embeddings"]

_TPCH_QUERIES = sorted(
    name
    for name, qd in REGISTRY.items()
    if qd.oracle_sql
    and any(re.search(rf"\b{t}\b", qd.oracle_sql) for t in _TPCH)
    and not any(re.search(rf"\b{t}\b", qd.oracle_sql) for t in _NON_TPCH)
)

_REGION = [(0, "EMPTYREG"), (1, "EUROPE"), (2, "ASIA")]  # region 0 has no nations
_NATION = [(0, "FRANCE", 1), (1, "GERMANY", 1), (2, "JAPAN", 2), (3, "GHOSTLAND", 2)]
_CUSTOMER = [
    # custkey, name, nationkey, acctbal, mktsegment
    (1, "cust#1", 0, 100.0, "BUILDING"),
    (2, "cust#2", 0, 100.0, "BUILDING"),   # acctbal tie with 1
    (3, "cust#3", 1, -50.0, "MACHINERY"),  # negative balance
    (4, "cust#4", 2, 0.0, "MACHINERY"),    # no orders
]
_SUPPLIER = [
    (1, "supp#1", 0, 10.0),
    (2, "supp#2", 2, -1.0),  # nation 1/3 have no suppliers
]
_PART = [
    (1, "green anodized thing", "Brand#1", "SMALL ANODIZED", 1, 100.0),
    (2, "red polished thing", "Brand#2", "LARGE POLISHED", 50, 0.01),
]
_ORDERS = [
    (1, 1, "F", 100.0, "2024-01-01 00:00:00", "1-URGENT"),
    (2, 1, "O", 200.0, "2024-01-02 00:00:00", "2-HIGH"),
    (3, 2, "F", 300.0, "2024-01-03 00:00:00", "2-HIGH"),
    (4, 3, "O", 400.0, "2024-02-01 00:00:00", "3-MEDIUM"),
]
_LINEITEM = [
    # orderkey, partkey, suppkey, linenumber, qty, extprice, discount, tax, rf, ls, shipdate
    (1, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "R", "F", "2024-01-05 00:00:00"),
    (1, 2, 2, 2, 50.0, 0.5, 0.1, 0.08, "A", "F", "2024-01-05 00:00:00"),  # ship tie
    (2, 1, 1, 1, 50.0, 5000.0, 0.1, 0.0, "N", "O", "2024-01-10 00:00:00"),  # qty tie
    (3, 2, 2, 1, 3.0, 30.0, 0.05, 0.02, "R", "F", "2024-02-15 00:00:00"),
    (4, 1, 1, 1, 7.0, 700.0, 0.0, 0.05, "N", "O", "2024-03-01 00:00:00"),
]


@pytest.fixture(scope="module")
def tpch_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("edge_tpch")
    specs = {
        "region": (_REGION, "r_regionkey int, r_name string"),
        "nation": (_NATION, "n_nationkey int, n_name string, n_regionkey int"),
        "customer": (
            _CUSTOMER,
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
        ),
        "supplier": (_SUPPLIER, "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"),
        "part": (
            _PART,
            "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
        ),
    }
    for t, (rows, schema) in specs.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d / f"{t}.parquet"))
    spark.createDataFrame(
        _ORDERS,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double,"
        " ds string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "cast(ds as timestamp) as o_orderdate", "o_orderpriority",
    ).coalesce(1).write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        _LINEITEM,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, ds string",
    ).selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "cast(ds as timestamp) as l_shipdate",
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_autoselection_found_the_family():
    assert len(_TPCH_QUERIES) >= 20, _TPCH_QUERIES


@pytest.mark.parametrize("name", _TPCH_QUERIES)
def test_edge_tpch_oracle_parity(spark, tpch_dir, name):
    qd = REGISTRY[name]
    sdf = qd.spark_fn(spark, tpch_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    con = duckdb.connect()
    for t in _TPCH:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tpch_dir}/{t}.parquet/*.parquet')"
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
