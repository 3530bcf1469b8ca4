"""r14 gate: flag registry queries whose physical plan carries an
expensive expression inside a Join condition (a threshold filter on
a derived column pushed into the join re-evaluates the expression per
probed row — see the dedup_minhash_lsh/dedup_jaccard_prefix
array_intersect case fixed this round).

Exits 1 on any finding (wired into tools/round_close.py).

    python tools/join_cond_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXPENSIVE = re.compile(
    r"array_intersect|array_union|array_except|aggregate\(|transform\(|"
    r"filter\(lambda|exists\(|sort_array|collect_list|collect_set|"
    r"regexp|split\(|sha2|md5|xxhash64|explode|zip_with|str_to_map"
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    from duckdb_httpd_log_spark import get_spark
    import duckdb_httpd_log_spark.operators  # noqa: F401
    from duckdb_httpd_log_spark.plans.registry import REGISTRY

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    flagged = 0
    errors = 0
    for name, qd in sorted(REGISTRY.items()):
        if names and name not in names:
            continue
        try:
            df = qd.spark_fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            # plan-build failure = gate failure, not a skip (r14 ADVICE)
            errors += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
            continue
        for m in re.finditer(r"Join condition: (.+)", plan):
            cond = m.group(1)
            hit = EXPENSIVE.search(cond)
            if hit:
                flagged += 1
                print(f"{name}: {hit.group(0)} in join condition: {cond[:160]}", flush=True)
                break
    print(f"done; {flagged} flagged, {errors} plan-build errors", flush=True)
    return 1 if (flagged or errors) else 0


if __name__ == "__main__":
    sys.exit(main())
