"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark AND its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and an
order-insensitive value hash (values canonicalized: floats rounded,
NULLs normalized). Usage:

    python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr = shortest round-trip string: distinguishes last-ulp
        # divergence the driver's hash would catch. The old ":.6g" hid
        # exactly the boundary flips that made r2-r4 rows red (local
        # green, driver red). Integral floats KEEP their ".0" so a
        # DOUBLE column on one side vs BIGINT on the other (a schema
        # parity bug) also fails locally. Local MATCH now means
        # bit-exact, type-exact values.
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    import decimal

    if isinstance(v, decimal.Decimal):
        # Deliberately NOT coerced to float: the driver's hash
        # distinguishes Decimal from double (r1: text_language_id /
        # text_quality hash-mismatched on decimal(17,4) vs DOUBLE).
        # A Decimal here should be treated as a parity bug.
        return f"DECIMAL:{v}"
    return str(v)


def row_set(rows):
    return sorted("|".join(canon(v) for v in row) for row in rows)


def main():
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from duckdb_httpd_log_spark import get_spark
    from duckdb_httpd_log_spark.plans.registry import REGISTRY, TABLES
    import duckdb_httpd_log_spark.operators  # noqa: F401  (registers queries)

    # ORACLE_MASTER / ORACLE_PARTS override the session shape so the
    # replica can also prove partition-count invariance (the driver's
    # session is local[32]/32; results must not depend on parallelism)
    spark = get_spark(
        master=os.environ.get("ORACLE_MASTER", "local[8]"),
        shuffle_partitions=int(os.environ.get("ORACLE_PARTS", "8")),
    )
    if os.environ.get("ORACLE_FORCE_SCALE"):
        # prove every oracle THROUGH the scale machinery (two-phase
        # rank, sliced time windows) — the size-adaptive dispatches
        # would otherwise pick the naive window at oracle scale
        spark.conf.set("spark.graft.distrank.naiveMaxBytes", "0")
        spark.conf.set("spark.graft.timewin.naiveMaxBytes", "0")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    matched = 0
    rows_only = 0
    for name, qd in REGISTRY.items():
        if only and name not in only:
            continue
        sdf = qd.spark_fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = [c.lower() for c in sdf.columns]
        if qd.oracle_sql is None:
            rows_only += 1
            print(f"{name:28s} rows-only: {len(srows)} rows")
            continue
        orel = con.execute(qd.oracle_sql)
        ocols = [d[0].lower() for d in orel.description]
        orows = [tuple(r) for r in orel.fetchall()]
        ok_cols = scols == ocols
        ok_count = len(srows) == len(orows)
        ok_vals = row_set(srows) == row_set(orows)
        status = "MATCH" if (ok_cols and ok_count and ok_vals) else "MISMATCH"
        if status == "MATCH":
            matched += 1
        print(f"{name:28s} {status}  spark={len(srows)} duckdb={len(orows)} cols_ok={ok_cols}")
        if status == "MISMATCH":
            failures.append(name)
            if not ok_cols:
                print(f"    spark cols:  {scols}\n    duckdb cols: {ocols}")
            if ok_cols:
                s, o = row_set(srows), row_set(orows)
                sset, oset = set(s), set(o)
                for x in list(sset - oset)[:3]:
                    print(f"    spark-only:  {x}")
                for x in list(oset - sset)[:3]:
                    print(f"    duckdb-only: {x}")
    # ORACLE_SUMMARY=<path>: write a machine-readable sweep summary so
    # the round-close gate can stamp CLOSE-TIME truth into
    # docs/OPERATORS.md (the driver count there lags a round by
    # construction — r9 verdict item 3)
    summary_path = os.environ.get("ORACLE_SUMMARY")
    if summary_path and not only:
        import datetime
        import json

        with open(summary_path, "w") as fh:
            json.dump(
                {
                    "matched": matched,
                    "mismatched": len(failures),
                    "rows_only": rows_only,
                    "sf_dir": sf_dir,
                    "utc": datetime.datetime.now(datetime.timezone.utc)
                    .strftime("%Y-%m-%d %H:%MZ"),
                },
                fh,
                indent=1,
            )
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all MATCH")


if __name__ == "__main__":
    main()
