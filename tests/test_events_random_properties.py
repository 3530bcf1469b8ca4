"""Randomized oracle parity for the events/time-series family.

test_edge_events.py pins a fixed adversarial corpus; this sweep
generates RANDOM event streams per seed — second-resolution timestamp
ties by construction (drawn from a small grid), bursty users, orphan
users, NULL/malformed props, value extremes — and requires full
row-set Spark == DuckDB parity for every events-only registry entry
(auto-selected, so new operators inherit the sweep). Deterministic
seeds, so failures replay."""

import random
import re

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY, TABLES

from .oracle_check import row_set

_OTHER_TABLES = [t for t in TABLES if t != "events"]

_EVENT_QUERIES = sorted(
    name
    for name, qd in REGISTRY.items()
    if qd.oracle_sql
    and re.search(r"\bevents\b", qd.oracle_sql)
    and not any(re.search(rf"\b{t}\b", qd.oracle_sql) for t in _OTHER_TABLES)
)

SEEDS = [13, 59]

TYPES = ["view", "click", "signup", "purchase", "error"]


def _gen_events(rng: random.Random):
    n_users = rng.randint(3, 10)
    n_events = rng.randint(30, 120)
    rows = []
    for i in range(n_events):
        # coarse grid (hours + a few minute slots) -> frequent exact ties
        day = rng.randint(1, 20)
        hour = rng.randint(0, 23)
        minute = rng.choice([0, 15, 30, 59])
        second = rng.choice([0, 0, 30])
        ts = f"2024-03-{day:02d} {hour:02d}:{minute:02d}:{second:02d}"
        value = rng.choice(
            [None, 0.0, -5.5, 1.0, 9.99, 185.22, 1e9, round(rng.uniform(0, 500), 2)]
        )
        props = rng.choice(
            [None, "{}", "not json", '{"k": %d}' % rng.randint(-5, 99)]
        )
        rows.append((i, ts, rng.randint(1, n_users), rng.choice(TYPES), value, props))
    return rows


@pytest.fixture(scope="module", params=SEEDS)
def random_events_dir(request, tmp_path_factory, spark):
    rng = random.Random(request.param)
    d = tmp_path_factory.mktemp(f"rand_ev_{request.param}")
    spark.createDataFrame(
        _gen_events(rng),
        "event_id long, ds string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "cast(ds as timestamp) as ts", "user_id", "event_type",
        "value", "props",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_autoselection_found_the_family():
    assert len(_EVENT_QUERIES) >= 30, _EVENT_QUERIES


@pytest.mark.parametrize("name", _EVENT_QUERIES)
def test_random_events_parity(spark, random_events_dir, name):
    qd = REGISTRY[name]
    srows = [tuple(r) for r in qd.spark_fn(spark, random_events_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{random_events_dir}/events.parquet/*.parquet')"
    )
    orows = con.execute(qd.oracle_sql).fetchall()
    assert row_set(srows) == row_set(orows), name
