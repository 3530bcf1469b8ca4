"""Audit: every oracle SQL must be DuckDB-thread-count-invariant.

The driver's correctness gate runs the oracle SQL on ITS DuckDB build
with ITS thread configuration. Any query whose result depends on
aggregate accumulation order (an unquantized double SUM, an unordered
array_agg, a LIMIT under a non-total order) would hash differently
across thread counts — red on the driver, green locally, and
impossible to iterate on. This sweep runs all registered oracles at
threads=1 and threads=8 and diffs full-repr row sets.

Result at HEAD (sf0.01): 229/229 bit-identical — the scaled-integer /
floor-form discipline leaves no order-dependent float accumulation in
any hashed surface.

    python tools/thread_invariance_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_all(sf: str, threads: int) -> dict[str, list[str]]:
    import duckdb

    from duckdb_httpd_log_spark.plans.registry import REGISTRY, TABLES

    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    out = {}
    for name, qd in REGISTRY.items():
        if qd.oracle_sql:
            rows = con.execute(qd.oracle_sql).fetchall()
            out[name] = sorted(repr(r) for r in rows)
    return out


def main() -> None:
    import duckdb_httpd_log_spark.operators  # noqa: F401

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    a = run_all(sf, 1)
    b = run_all(sf, 8)
    diff = [n for n in a if a[n] != b[n]]
    print(f"queries: {len(a)}  thread-count-sensitive: {diff}")
    if diff:
        sys.exit(1)


if __name__ == "__main__":
    main()
