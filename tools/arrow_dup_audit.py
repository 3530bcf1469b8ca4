"""r14 gate: find queries whose physical plan evaluates the same
Python UDF EXPRESSION more than once (guide section 4.4
filter-on-UDF-column duplication: a Filter referencing a UDF-computed
column makes Catalyst evaluate the UDF below the filter AND again in
the projection).

For every registry query, capture explain('formatted') and extract the
full UDF call expressions (function + argument attribute ids) inside
ArrowEvalPython/BatchEvalPython nodes; flag any query where the SAME
call expression appears in more than one node. Two applications of one
kernel over DIFFERENT inputs (e.g. the ANN corpus-side and query-side
bucket assignments) carry different argument ids and do not flag.

Exits 1 on any finding (wired into tools/round_close.py).

    python tools/arrow_dup_audit.py [sf_dir] [name ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
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
            # a query that cannot even build its plan is a regression this
            # gate must not silently skip (r14 ADVICE)
            errors += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
            continue
        # collect per-node UDF CALL EXPRESSIONS (function name + argument
        # attributes incl. expr ids; the trailing result id is stripped).
        # The Arguments list holds one UDF call per top-level comma, so
        # split on those instead of a no-nested-parens regex (which was
        # blind to kernels invoked over nested expressions — r14 ADVICE)
        by_call: dict[str, list[str]] = {}
        for m in re.finditer(
            r"\((\d+)\) (ArrowEvalPython|BatchEvalPython)\s*\n(.*?)(?=\n\(\d+\) |\Z)",
            plan,
            re.S,
        ):
            nid, _kind, body = m.groups()
            arg = re.search(r"Arguments: \[(.*?)\](?:,|\s*$)", body, re.S)
            if not arg:
                continue
            for call in _split_top_level(arg.group(1)):
                if "(" not in call:
                    continue
                key = re.sub(r"#\d+$", "", re.sub(r"\s+", " ", call.strip()))
                by_call.setdefault(key, []).append(nid)
        dups = {k: v for k, v in by_call.items() if len(set(v)) > 1}
        if dups:
            flagged += 1
            print(f"{name}: DUPLICATED UDF EXPRESSIONS {dups}", flush=True)
    print(f"done; {flagged} flagged, {errors} plan-build errors", flush=True)
    return 1 if (flagged or errors) else 0


def _split_top_level(text: str) -> list[str]:
    """Split an Arguments payload on commas not inside parentheses/brackets,
    so each piece is one full (possibly nested) UDF call expression."""
    out: list[str] = []
    depth = 0
    cur: list[str] = []
    for ch in text:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


if __name__ == "__main__":
    sys.exit(main())
