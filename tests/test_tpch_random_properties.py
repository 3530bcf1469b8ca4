"""Randomized oracle parity for the round-8 fact-join family.

The fixed adversarial corpus (test_edge_tpch.py) pins known divergence
shapes; this sweep generates RANDOM mini TPC-H tables per seed —
skewed keys, duplicate timestamps, boundary quantities/discounts,
orphan keys — and requires Spark == DuckDB on the full row set for
every round-8 join query. Random data reaches tie-break and
rounding-boundary classes a hand-built corpus misses (text_bm25_search
found the DECIMAL-literal class exactly this way: one boundary row at
each scale). Deterministic seeds, so failures replay."""

import random

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY

from .oracle_check import row_set

# AUTO-SELECTED like test_edge_tpch.py: every registry entry whose
# oracle touches only the seven TPC-H tables — the whole relational
# family inherits the randomized sweep, not just the fact-join queries
# it started with.
import re as _re

_TPCH = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
_NON_TPCH = ["events", "documents", "embeddings"]

QUERIES = sorted(
    name
    for name, qd in REGISTRY.items()
    if qd.oracle_sql
    and any(_re.search(rf"\b{t}\b", qd.oracle_sql) for t in _TPCH)
    and not any(_re.search(rf"\b{t}\b", qd.oracle_sql) for t in _NON_TPCH)
)

SEEDS = [11, 23, 47]


def _gen_tables(rng: random.Random):
    n_nations = rng.randint(2, 6)
    nation = [(k, f"NATION_{k}", k % 2) for k in range(n_nations)]
    region = [(0, "R0"), (1, "R1")]
    n_supp = rng.randint(2, 8)
    supplier = [
        (k, f"supp#{k}", rng.randrange(n_nations), round(rng.uniform(-100, 100), 2))
        for k in range(1, n_supp + 1)
    ]
    n_cust = rng.randint(3, 15)
    customer = [
        (
            k,
            f"cust#{k}",
            rng.randrange(n_nations),
            round(rng.uniform(-500, 9999), 2),
            rng.choice(["BUILDING", "MACHINERY", "AUTOMOBILE"]),
        )
        for k in range(1, n_cust + 1)
    ]
    n_parts = rng.randint(2, 8)
    part = [
        (
            k,
            f"part {k}",
            f"Brand#{rng.randint(1, 3)}",
            rng.choice(["SMALL ANODIZED", "LARGE POLISHED"]),
            rng.randint(1, 50),
            round(rng.uniform(0.01, 2000), 2),
        )
        for k in range(1, n_parts + 1)
    ]
    n_orders = rng.randint(5, 40)
    orders = []
    for k in range(1, n_orders + 1):
        # orphan custkeys (beyond n_cust) exercise dropped join rows
        ck = rng.randint(1, n_cust + 2)
        day = rng.randint(0, 2500)
        orders.append(
            (
                k,
                ck,
                rng.choice(["F", "O", "P"]),
                round(rng.uniform(10, 400000), 2),
                f"{1995 + day // 365}-{1 + (day // 31) % 12:02d}-{1 + day % 28:02d} 00:00:00",
                rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]),
            )
        )
    lineitem = []
    for ok in range(1, n_orders + 1):
        for ln in range(1, rng.randint(1, 5) + 1):
            day = rng.randint(0, 2800)
            lineitem.append(
                (
                    ok,
                    rng.randint(1, n_parts),
                    rng.randint(1, n_supp),
                    ln,
                    float(rng.randint(1, 50)),  # boundary quantities incl. 1 and 50
                    round(rng.uniform(0.5, 90000), 2),
                    rng.choice([0.0, 0.01, 0.05, 0.1]),
                    rng.choice([0.0, 0.08]),
                    rng.choice(["R", "A", "N"]),
                    rng.choice(["F", "O"]),
                    f"{1995 + day // 365}-{1 + (day // 31) % 12:02d}-{1 + day % 28:02d} 00:00:00",
                )
            )
    return {
        "region": (region, "r_regionkey int, r_name string"),
        "nation": (nation, "n_nationkey int, n_name string, n_regionkey int"),
        "supplier": (
            supplier,
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        ),
        "customer": (
            customer,
            "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
            " c_mktsegment string",
        ),
        "part": (
            part,
            "p_partkey long, p_name string, p_brand string, p_type string,"
            " p_size int, p_retailprice double",
        ),
        "orders": (
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, ds string, o_orderpriority string",
        ),
        "lineitem": (
            lineitem,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
            " l_quantity double, l_extendedprice double, l_discount double,"
            " l_tax double, l_returnflag string, l_linestatus string, ds string",
        ),
    }


@pytest.fixture(scope="module", params=SEEDS)
def random_tpch_dir(request, tmp_path_factory, spark):
    rng = random.Random(request.param)
    d = tmp_path_factory.mktemp(f"rand_tpch_{request.param}")
    for t, (rows, schema) in _gen_tables(rng).items():
        df = spark.createDataFrame(rows, schema)
        if "ds string" in schema:
            ts_col = "o_orderdate" if t == "orders" else "l_shipdate"
            cols = [c for c in df.columns if c != "ds"] + [
                f"cast(ds as timestamp) as {ts_col}"
            ]
            # keep the reference column ORDER (ds sits mid-schema)
            order = [
                c if c != "ds" else f"cast(ds as timestamp) as {ts_col}"
                for c in df.columns
            ]
            df = df.selectExpr(*order)
        df.coalesce(1).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", QUERIES)
def test_random_tpch_parity(spark, random_tpch_dir, name):
    qd = REGISTRY[name]
    srows = [tuple(r) for r in qd.spark_fn(spark, random_tpch_dir).collect()]
    con = duckdb.connect()
    for t in ["region", "nation", "supplier", "customer", "part", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{random_tpch_dir}/{t}.parquet/*.parquet')"
        )
    orows = con.execute(qd.oracle_sql).fetchall()
    assert row_set(srows) == row_set(orows), name
