"""Round-close gate: the builder's own regression checks, one command.

Runs, in order (r7 verdict stretch item 8 — make the scale assert part
of the builder's gate instead of waiting for a judge read):

  1. `scale_rehearsal --assert`    — 10x wall-clock ratio ceilings on
                                     the 5-query core slate (exit 1 on
                                     a super-linear regression);
  2. plan-reuse audit              — no registry query executes a
                                     duplicated Join/Window/Arrow
                                     subtree without a pin or runtime
                                     exchange reuse (exit 1 otherwise);
  3. thread-invariance audit       — every oracle bit-identical at
                                     DuckDB threads=1 vs 8;
  4. executing dtype audit         — pandas-kind parity on every
                                     oracle at sf0.01 (int-vs-float
                                     gates, width/unit reported);
  5. local oracle sweep            — the full registry vs DuckDB at
                                     sf0.01, summary written for the
                                     close-time stamp;
  6. operator-index regeneration   — docs/OPERATORS.md counts match
                                     the registry at HEAD, plus the
                                     close-time sweep line from step 5.

Record the output in the round-close commit message. Bench and the
full pytest suite stay separate (they have their own artifacts).

    python tools/round_close.py
"""

from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = [
    ("scale-rehearsal --assert", [sys.executable, "tools/scale_rehearsal.py", "--assert"]),
    # plan-reuse sweep (r12 verdict item 1): every registry query's
    # analyzed plan checked for fan-out duplicated Join/Window/Arrow
    # subtrees, runtime-confirmed against the final adaptive plan's
    # reuse markers; exits 1 on any non-allowlisted double-compute
    ("plan-reuse audit", [sys.executable, "tools/plan_reuse_audit.py"]),
    # r14 defect classes, made permanent gates: duplicated Python-UDF
    # expressions (guide 4.4 filter-on-UDF-column pushdown) and
    # expensive expressions inside Join conditions
    ("arrow duplicate-eval audit", [sys.executable, "tools/arrow_dup_audit.py"]),
    ("join-condition expense audit", [sys.executable, "tools/join_cond_audit.py"]),
    # over-2x adjudication (r12 verdict item 3): every duckdb_over2x
    # bench entry needs a recorded non-defect disposition
    ("over2x adjudication gate", [sys.executable, "tools/over2x_gate.py"]),
    ("thread-invariance audit", [sys.executable, "tools/thread_invariance_audit.py"]),
    ("executing dtype audit", [sys.executable, "tools/dtype_audit.py"]),
    # full-registry local oracle sweep; writes the close-time summary
    # that the index regen below stamps into docs/OPERATORS.md (the
    # driver count there lags a round by construction)
    ("local oracle sweep", [sys.executable, "tests/oracle_check.py"]),
    ("operator index regen", [sys.executable, "tools/gen_operator_index.py"]),
]


def main() -> int:
    env = dict(os.environ)
    env["ORACLE_SUMMARY"] = os.path.join(ROOT, "docs", ".oracle_sweep_local.json")
    failures = []
    for name, cmd in STEPS:
        print(f"== {name} ==", flush=True)
        rc = subprocess.call(cmd, cwd=ROOT, env=env)
        if rc != 0:
            failures.append(name)
            print(f"FAILED: {name} (exit {rc})", flush=True)
    if failures:
        print(f"round-close gate FAILED: {failures}")
        return 1
    print("round-close gate: all checks hold")
    return 0


if __name__ == "__main__":
    sys.exit(main())
