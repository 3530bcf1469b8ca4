"""One-off r14 audit: find queries whose physical plan evaluates the
same Python UDF more than once (guide section 4.4 filter-on-UDF-column
duplication: a Filter referencing a UDF-computed column makes Catalyst
evaluate the UDF below the filter AND again in the projection).

For every registry query, capture explain('formatted') and extract the
UDF names inside ArrowEvalPython/BatchEvalPython nodes; report any
query where one UDF name appears in more than one node.

    python tools/arrow_dup_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    from duckdb_httpd_log_spark import get_spark
    import duckdb_httpd_log_spark.operators  # noqa: F401
    from duckdb_httpd_log_spark.plans.registry import REGISTRY

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    node_re = re.compile(r"\((\d+)\) (ArrowEvalPython|BatchEvalPython)")
    # detail blocks look like: "(12) ArrowEvalPython\nInput ...\nArguments: [cosine_of(ea#...)#...], ..."
    flagged = 0
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
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
            continue
        # collect per-node UDF names from the details section
        udf_nodes: list[tuple[str, str]] = []  # (node_id, udf_names_key)
        for m in re.finditer(
            r"\((\d+)\) (ArrowEvalPython|BatchEvalPython)\s*\n(.*?)(?=\n\(\d+\) |\Z)",
            plan,
            re.S,
        ):
            nid, _kind, body = m.groups()
            arg = re.search(r"Arguments: \[(.*?)\]", body, re.S)
            fn_names = sorted(set(re.findall(r"(\w+)\(", arg.group(1)))) if arg else []
            udf_nodes.append((nid, ",".join(fn_names)))
        by_fn: dict[str, list[str]] = {}
        for nid, key in udf_nodes:
            by_fn.setdefault(key, []).append(nid)
        dups = {k: v for k, v in by_fn.items() if len(v) > 1 and k}
        if dups:
            flagged += 1
            print(f"{name}: DUPLICATED UDF NODES {dups}", flush=True)
    print(f"done; {flagged} flagged", flush=True)


if __name__ == "__main__":
    main()
