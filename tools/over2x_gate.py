"""Over-2x adjudication gate (r12 verdict item 3).

Reads bench_full.json's ``duckdb_over2x`` list and requires every entry
to carry a disposition in tools/over2x_dispositions.json that is NOT a
plan defect:

- ``overhead`` / ``pair-join-constant`` / ``fixed-rN(...)`` — explained,
  passes;
- missing (``UNDISPOSITIONED``) — a new over-2x entry appeared since the
  last adjudication: inspect its plan, then either fix it or record the
  explanation. FAILS until then;
- ``plan-defect(...)`` — a recorded real defect. FAILS until the fix
  lands and the disposition is rewritten as ``fixed-rN``.

This is what keeps a q61-style silent double-compute from sitting
unexamined in the same list as fifteen explained ratios.

    python tools/over2x_gate.py [bench_full.json]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "bench_full.json")
    with open(bench_path) as fh:
        bench = json.load(fh)
    flagged = bench.get("duckdb_over2x", [])
    # resolve against the CURRENT dispositions file, not the snapshot
    # bench recorded at run time: adjudication happens after the run
    # (the snapshot documents what was known then; the gate asks
    # whether everything is adjudicated NOW)
    with open(os.path.join(ROOT, "tools", "over2x_dispositions.json")) as fh:
        known = json.load(fh)
    recorded = {n: known.get(n, "UNDISPOSITIONED") for n in flagged}
    bad = {
        n: d
        for n, d in recorded.items()
        if d == "UNDISPOSITIONED" or d.startswith("plan-defect")
    }
    for n, d in bad.items():
        print(f"OVER2X {n}: {d}")
    print(
        f"over2x gate: {len(flagged)} flagged, "
        f"{len(flagged) - len(bad)} dispositioned, {len(bad)} failing"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
