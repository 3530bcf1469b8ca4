"""Pandas-dtype parity audit: the driver canonicalizes results through
pandas (proven in r5 by q50's `TypeError: unhashable type: 'list'` from
the driver's pandas sort_values). DuckDB's .df() maps HUGEINT — the
result type of sum(BIGINT)/sum(INTEGER) — to float64, while Spark's
sum(long) stays int64. fetchall()-based comparison (tests/
oracle_check.py) sees Python ints on both sides and can NEVER catch
this; a pandas-level value hash sees 5 vs 5.0 and flips red.

Runs every registered query on both engines at sf0.01 and reports any
column whose pandas dtype differs between spark.toPandas() and
duckdb .df().

Usage: python tools/dtype_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from duckdb_httpd_log_spark import get_spark
    from duckdb_httpd_log_spark.plans.registry import REGISTRY, TABLES
    import duckdb_httpd_log_spark.operators  # noqa: F401

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    mismatches = []
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        if qd.oracle_sql is None:
            continue
        try:
            sdf = qd.spark_fn(spark, sf_dir).toPandas()
            odf = con.execute(qd.oracle_sql).df()
        except Exception as e:  # pragma: no cover - diagnostic tool
            print(f"{name:30s} ERROR {type(e).__name__}: {e}")
            mismatches.append(name)
            continue
        sdt = {c.lower(): str(d) for c, d in sdf.dtypes.items()}
        odt = {c.lower(): str(d) for c, d in odf.dtypes.items()}
        bad, benign = {}, {}
        for c in set(sdt) | set(odt):
            a, b = sdt.get(c), odt.get(c)
            if a == b:
                continue
            # same classes the CI contract allows (driver-green proven):
            # int-width (int32 `5` and int64 `5` canonicalize identically
            # — orders_seasonality_index) and datetime unit ([ns] vs [us]
            # — q43_interval_window). int-vs-float is NEVER benign.
            ka = (a or "").rstrip("0123456789[]nsu")
            kb = (b or "").rstrip("0123456789[]nsu")
            if a and b and ka == kb and ka in ("int", "uint", "datetime"):
                benign[c] = (a, b)
            else:
                bad[c] = (a, b)
        if benign:
            print(f"{name:30s} benign-width {benign}")
        if bad:
            mismatches.append(name)
            print(f"{name:30s} DTYPE-MISMATCH {bad}")
    if mismatches:
        print("MISMATCHES:", sorted(mismatches))
        sys.exit(1)
    print("all dtypes match (width/unit-level differences reported as benign)")


if __name__ == "__main__":
    main()
