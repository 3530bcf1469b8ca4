"""Oracle parity for event/time-series operators on an ADVERSARIAL
events corpus: timestamp ties, a single-event orphan user, sessions
crossing day boundaries, value extremes (0, negative, 1e9), NULL
values, empty/malformed/NULL JSON props — the shapes where window
tie-breaks, gap arithmetic, and JSON extraction quietly diverge.

Queries are AUTO-SELECTED: every registry entry whose oracle SQL reads
only the `events` table runs here, so new events operators inherit the
adversarial check without editing this file."""

import re

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY, TABLES

from .oracle_check import row_set

_OTHER_TABLES = [t for t in TABLES if t != "events"]


def _events_only() -> list:
    names = []
    for name, qd in REGISTRY.items():
        sql = qd.oracle_sql
        if not sql or not re.search(r"\bevents\b", sql):
            continue
        if any(re.search(rf"\b{t}\b", sql) for t in _OTHER_TABLES):
            continue
        names.append(name)
    return sorted(names)


_EVENT_QUERIES = _events_only()

_TS0 = "2024-03-01 00:00:00"

_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (0, "2024-03-01 00:00:00", 1, "view", 1.0, '{"k": 1}'),          # orphan user
    (1, "2024-03-01 10:00:00", 2, "view", 0.0, '{"k": 0}'),          # tie block ↓
    (2, "2024-03-01 10:00:00", 2, "click", -5.5, '{"k": -3}'),
    (3, "2024-03-01 10:00:00", 2, "view", 1e9, '{"k": 99}'),
    (4, "2024-03-01 23:59:59", 3, "signup", 10.0, "{}"),             # missing k
    (5, "2024-03-02 00:00:01", 3, "purchase", 20.0, "not json"),     # malformed
    (6, "2024-03-02 00:30:00", 3, "view", None, None),               # NULLs
    (7, "2024-03-02 12:00:00", 3, "error", 7.0, '{"k": 7}'),
    (8, "2024-03-02 12:00:30", 3, "error", 8.0, '{"k": 8}'),
    (9, "2024-03-02 12:01:00", 3, "error", 9.0, '{"k": 9}'),         # error burst
    (10, "2024-03-09 12:00:00", 2, "view", 2.5, '{"k": 2}'),         # week later (dow baseline)
    (11, "2024-03-16 12:00:00", 2, "view", 3.5, '{"k": 2}'),
]


@pytest.fixture(scope="module")
def ev_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("edge_ev")
    df = spark.createDataFrame(
        [
            (i, ts, u, et, v, p)
            for i, ts, u, et, v, p in _EVENTS
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).selectExpr(
        "event_id", "cast(ts_s as timestamp) as ts", "user_id", "event_type", "value", "props"
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def test_autoselection_found_the_family():
    # guard: the auto-detector must keep catching the events surface
    assert len(_EVENT_QUERIES) >= 12, _EVENT_QUERIES


@pytest.mark.parametrize("name", _EVENT_QUERIES)
def test_edge_events_oracle_parity(spark, ev_dir, name):
    qd = REGISTRY[name]
    sdf = qd.spark_fn(spark, ev_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{ev_dir}/events.parquet/*.parquet')"
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
