"""Randomized oracle parity for the embedding-QA family.

test_edge_embeddings.py pins hand-built extreme vectors; this sweep
draws RANDOM float32 corpora per seed — mixed magnitudes, duplicate
vectors, skewed label sizes, exact-zero components — and requires
full row-set Spark == DuckDB parity for every embeddings-only registry
entry outside the trained-index family (same exclusion and rationale
as the edge suite: ANN/kmeans probing contracts assume a real-scale
corpus; the sf0.001/sf0.01 oracle sweep covers them). Deterministic
seeds, so failures replay."""

import random
import re

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY, TABLES

from .oracle_check import row_set

DIM = 64
_SKIP_PREFIX = ("ann_", "kmeans_")
_SKIP = ("dedup_embedding", "emb_threshold_curve")
_OTHER = [t for t in TABLES if t != "embeddings"]

_EMB_QUERIES = sorted(
    name
    for name, qd in REGISTRY.items()
    if qd.oracle_sql
    and re.search(r"\bembeddings\b", qd.oracle_sql)
    and not any(re.search(rf"\b{t}\b", qd.oracle_sql) for t in _OTHER)
    and not name.startswith(_SKIP_PREFIX)
    and name not in _SKIP
)

SEEDS = [7, 31]


def _gen_vectors(rng: random.Random):
    n = rng.randint(20, 60)
    rows = []
    for i in range(n):
        kind = rng.random()
        scale = rng.choice([1e-4, 0.25, 1.0, 50.0])
        if kind < 0.1 and rows:
            vec = rows[rng.randrange(len(rows))][1]  # exact duplicate
        elif kind < 0.2:
            vec = [0.0] * DIM
            vec[rng.randrange(DIM)] = rng.choice([-1.0, 1.0]) * scale
        else:
            vec = [
                float(f"{rng.uniform(-1, 1) * scale:.6g}") if rng.random() > 0.05 else 0.0
                for _ in range(DIM)
            ]
        rows.append((i, vec, rng.randint(0, 4)))
    return rows


@pytest.fixture(scope="module", params=SEEDS)
def random_emb_dir(request, tmp_path_factory, spark):
    rng = random.Random(request.param)
    d = tmp_path_factory.mktemp(f"rand_emb_{request.param}")
    spark.createDataFrame(
        _gen_vectors(rng), "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_autoselection_found_the_family():
    assert len(_EMB_QUERIES) >= 6, _EMB_QUERIES


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_random_emb_parity(spark, random_emb_dir, name):
    qd = REGISTRY[name]
    srows = [tuple(r) for r in qd.spark_fn(spark, random_emb_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{random_emb_dir}/embeddings.parquet/*.parquet')"
    )
    orows = con.execute(qd.oracle_sql).fetchall()
    assert row_set(srows) == row_set(orows), name
