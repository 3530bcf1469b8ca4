"""Randomized oracle parity for the heavy document operators.

test_edge_oracle.py pins a fixed hostile corpus (unicode, empty docs,
exact dups); this sweep generates RANDOM corpora per seed — Zipfian
token draws, duplicated spans across docs, repeated tokens, single-
and sub-window-length docs, skewed sources — and requires full
row-set Spark == DuckDB parity for the round-8 text additions plus
the span-dedup family they extend. Random corpora reach count-tie and
quantization-boundary rows a hand corpus misses (the BM25
DECIMAL-literal divergence surfaced on exactly one boundary row per
scale). Deterministic seeds, so failures replay."""

import random

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY

from .oracle_check import row_set

# AUTO-SELECTED: every registry entry whose oracle reads only the
# documents table — the whole text/dedup/multimodal-on-docs family
# inherits the randomized sweep; new operators join automatically.
import re as _re

from duckdb_httpd_log_spark.plans.registry import TABLES as _TABLES

_OTHER = [t for t in _TABLES if t != "documents"]
QUERIES = sorted(
    name
    for name, qd in REGISTRY.items()
    if qd.oracle_sql
    and _re.search(r"\bdocuments\b", qd.oracle_sql)
    and not any(_re.search(rf"\b{t}\b", qd.oracle_sql) for t in _OTHER)
)

SEEDS = [5, 19]

# small vocabulary -> high collision rate: shared windows, count ties,
# and BM25 terms all occur naturally
VOCAB = [
    "hash", "join", "stream", "scan", "sort", "merge", "group", "agg",
    "key", "row", "col", "map", "a", "b", "the",
]


def _gen_docs(rng: random.Random):
    shared_span = " ".join(rng.choices(VOCAB, k=16))  # straddles window bounds
    docs = []
    n_docs = rng.randint(12, 30)
    for i in range(n_docs):
        kind = rng.random()
        if kind < 0.1:
            text = rng.choice(VOCAB)  # single token (below every window)
        elif kind < 0.2:
            text = " ".join([rng.choice(VOCAB)] * rng.randint(2, 30))  # repetition
        elif kind < 0.45:
            # plant the shared span at a random offset
            head = rng.choices(VOCAB, k=rng.randint(0, 9))
            tail = rng.choices(VOCAB, k=rng.randint(0, 9))
            text = " ".join(head + [shared_span] + tail)
        else:
            text = " ".join(rng.choices(VOCAB, k=rng.randint(5, 60)))
        docs.append(
            (
                i,
                text,
                rng.choice(["en", "es"]),
                rng.choice(["src0", "srcA", "srcB"]),
                len(text),
            )
        )
    return docs


@pytest.fixture(scope="module", params=SEEDS)
def random_docs_dir(request, tmp_path_factory, spark):
    rng = random.Random(request.param)
    d = tmp_path_factory.mktemp(f"rand_docs_{request.param}")
    spark.createDataFrame(
        _gen_docs(rng),
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", QUERIES)
def test_random_docs_parity(spark, random_docs_dir, name):
    qd = REGISTRY[name]
    srows = [tuple(r) for r in qd.spark_fn(spark, random_docs_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{random_docs_dir}/documents.parquet/*.parquet')"
    )
    orows = con.execute(qd.oracle_sql).fetchall()
    assert row_set(srows) == row_set(orows), name
