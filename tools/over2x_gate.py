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
    mover_bad = _mover_stage(bench)
    return 1 if (bad or mover_bad) else 0


def _mover_stage(bench: dict) -> dict:
    """Big-mover adjudication (r13 verdict item 3, prompted by the
    dedup_embedding 1.27->1.73 s same-code move): every entry >= 1 s
    on either board whose time moved > 30% vs the PREVIOUS board
    (bench_prev.json, kept by bench.py) must carry a disposition in
    tools/mover_dispositions.json — measured-noise entries record the
    re-measurement, real regressions record the plan finding. The 2x
    DuckDB anchor can't see a regression that stays under it; this
    stage can. Host-speed drift: when both boards carry calibration
    and the two primitives agree, the ratio is normalized by the
    median drift first (same rule as tools/bench_diff.py)."""
    prev_path = os.path.join(ROOT, "bench_prev.json")
    if not os.path.exists(prev_path):
        print("mover gate: no bench_prev.json yet (first run) — skipped")
        return {}
    with open(prev_path) as fh:
        prev_doc = json.load(fh)
    prev, cur = prev_doc.get("queries", {}), bench.get("queries", {})
    host = 1.0
    oc, nc = prev_doc.get("calibration"), bench.get("calibration")
    if oc and nc:
        drifts = [nc[k] / oc[k] for k in sorted(set(oc) & set(nc)) if oc.get(k)]
        if drifts and max(drifts) / min(drifts) <= 1.25:
            drifts.sort()
            host = drifts[len(drifts) // 2]
    movers = {}
    for n in sorted(set(prev) & set(cur)):
        if max(prev[n], cur[n]) < 1.0 or prev[n] <= 0:
            continue
        r = (cur[n] / prev[n]) / host
        if r > 1.3 or r < 1 / 1.3:
            movers[n] = r
    try:
        with open(os.path.join(ROOT, "tools", "mover_dispositions.json")) as fh:
            known = json.load(fh)
    except FileNotFoundError:
        known = {}
    bad = {n: r for n, r in movers.items() if n not in known}
    for n, r in sorted(bad.items(), key=lambda kv: -abs(kv[1] - 1)):
        print(f"MOVER {n}: {r:.2f}x vs prev board — UNDISPOSITIONED")
    print(
        f"mover gate: {len(movers)} moved >30% at >=1 s, "
        f"{len(movers) - len(bad)} dispositioned, {len(bad)} failing"
        + (f" (host drift {host:.2f}x normalized)" if host != 1.0 else "")
    )
    return bad


if __name__ == "__main__":
    sys.exit(main())
