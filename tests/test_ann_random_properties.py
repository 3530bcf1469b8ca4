"""Randomized oracle parity for the trained-index ANN family.

The other randomized sweeps exclude ANN/kmeans because their
N_QUERIES/TOP_K/nlist contracts degenerate on a 12-vector corpus;
this module generates a REAL-SCALE random corpus (hundreds of
vectors, the same regime the sf0.001 driver gate runs) so the full
trained chain — md5-seeded kmeans, round-6 distance ties, probe
lists, banded LSH — executes end-to-end on data it has never seen.
One seed (the chain is the expensive part; the seed exercises every
contract), full row-set parity. Also covers dq_skew_report, the one
mixed-table query outside every other sweep."""

import random

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY

from .oracle_check import row_set

DIM = 64

ANN_QUERIES = [
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_radius_search",
    "ann_knn_graph",
    "ann_recall_eval",
    "ann_ivf_topk",
    "ann_ivf_probe_curve",
    "ann_lsh_trained_topk",
    "ann_pq_topk",
    "ann_filtered_topk",
    "kmeans_update_step",
    "kmeans_train",
    "dedup_embedding",
    "emb_threshold_curve",
]

SEED = 97


@pytest.fixture(scope="module")
def random_ann_dir(tmp_path_factory, spark):
    rng = random.Random(SEED)
    n = 600
    rows = []
    for i in range(n):
        if i % 37 == 0 and i > 0:
            vec = rows[i - 1][1]  # near-dup pressure: exact duplicates
        else:
            vec = [float(f"{rng.gauss(0, 1):.6g}") for _ in range(DIM)]
        rows.append((i, vec, rng.randint(0, 9)))
    d = tmp_path_factory.mktemp("rand_ann")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ANN_QUERIES)
def test_random_ann_parity(spark, random_ann_dir, name):
    qd = REGISTRY[name]
    srows = [tuple(r) for r in qd.spark_fn(spark, random_ann_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{random_ann_dir}/embeddings.parquet/*.parquet')"
    )
    orows = con.execute(qd.oracle_sql).fetchall()
    assert row_set(srows) == row_set(orows), name


@pytest.fixture(scope="module")
def random_mixed_dir(tmp_path_factory, spark):
    from .test_events_random_properties import _gen_events
    from .test_orders_random_properties import _gen_orders
    from .test_tpch_random_properties import _gen_tables

    rng = random.Random(SEED + 1)
    d = tmp_path_factory.mktemp("rand_mixed")
    spark.createDataFrame(
        _gen_events(rng),
        "event_id long, ds string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "cast(ds as timestamp) as ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    spark.createDataFrame(
        _gen_orders(rng),
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, ds string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "cast(ds as timestamp) as o_orderdate", "o_orderpriority",
    ).coalesce(1).write.parquet(str(d / "orders.parquet"))
    rows, schema = _gen_tables(random.Random(SEED + 2))["lineitem"]
    df = spark.createDataFrame(rows, schema)
    order = [
        c if c != "ds" else "cast(ds as timestamp) as l_shipdate"
        for c in df.columns
    ]
    df.selectExpr(*order).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_random_mixed_dq_skew_report(spark, random_mixed_dir):
    """dq_skew_report is the one query outside every per-family sweep
    (it reads events + lineitem + orders together)."""
    qd = REGISTRY["dq_skew_report"]
    srows = [tuple(r) for r in qd.spark_fn(spark, random_mixed_dir).collect()]
    con = duckdb.connect()
    for t in ["events", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{random_mixed_dir}/{t}.parquet/*.parquet')"
        )
    orows = con.execute(qd.oracle_sql).fetchall()
    assert row_set(srows) == row_set(orows)
