"""Oracle parity for embedding operators on an ADVERSARIAL vector
corpus: the zero vector (norm 0), exact duplicates, constant
dimensions (quantization step 0), extreme magnitudes, and sign
flips — the shapes where norm divisions, quantization guards, and
argmin tie-breaks quietly diverge between engines."""

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY

from .oracle_check import row_set

DIM = 64


def _vec(fill, special=None):
    v = [fill] * DIM
    for idx, val in (special or {}).items():
        v[idx] = val
    return [float(x) for x in v]


_VECS = [
    (0, _vec(0.0), 0),                                  # zero vector: norm 0
    (1, _vec(0.5), 0),                                  # constant vector
    (2, _vec(0.5), 0),                                  # exact duplicate of 1
    (3, _vec(-0.5), 1),                                 # sign flip of 1
    (4, _vec(0.0, {0: 1.0}), 1),                        # one-hot
    (5, _vec(0.0, {0: -1.0}), 1),                       # negated one-hot
    (6, _vec(1e6), 2),                                  # extreme magnitude
    (7, _vec(1e-6), 2),                                 # tiny magnitude
    (8, _vec(0.1, {i: 0.9 for i in range(0, DIM, 2)}), 2),
    (9, _vec(0.25, {63: 4.0}), 3),                      # outlier tail dim
    (10, _vec(0.25), 3),
    (11, _vec(0.25), 3),                                # duplicate of 10
]

# AUTO-SELECTED: every registry query whose oracle reads only the
# embeddings table runs here, EXCEPT the ANN/kmeans family — their
# N_QUERIES/TOP_K/nlist contracts assume a corpus far larger than 12
# vectors (probing/seeding degenerates, though parity itself holds at
# real scale factors, where the full oracle sweep covers them).
import re as _re

from duckdb_httpd_log_spark.plans.registry import TABLES as _TABLES

_SKIP = ("ann_", "kmeans_", "dedup_embedding", "emb_threshold_curve")
_OTHER = [t for t in _TABLES if t != "embeddings"]
_EMB_QUERIES = sorted(
    name
    for name, qd in REGISTRY.items()
    if qd.oracle_sql
    and _re.search(r"\bembeddings\b", qd.oracle_sql)
    and not any(_re.search(rf"\b{t}\b", qd.oracle_sql) for t in _OTHER)
    and not name.startswith(_SKIP[:2]) and name not in _SKIP[2:]
)


@pytest.fixture(scope="module")
def emb_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("edge_emb")
    df = spark.createDataFrame(
        [(i, v, lab) for i, v, lab in _VECS],
        "vec_id long, embedding array<float>, label int",
    )
    df.coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_edge_embeddings_oracle_parity(spark, emb_dir, name):
    qd = REGISTRY[name]
    sdf = qd.spark_fn(spark, emb_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{emb_dir}/embeddings.parquet/*.parquet')"
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
