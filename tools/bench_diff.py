"""Diff two bench_full.json boards (e.g. the current one vs a prior
round's via `git show <rev>:bench_full.json > /tmp/old.json`).

Prints per-query ratios sorted by regression, the shared-entry median
ratio (the round-over-round number the verdicts grade), and flags
entries beyond the noise band. This box's run-to-run variance is
~±20%, so the default flag threshold is 1.35x.

    python tools/bench_diff.py OLD.json [NEW.json] [--threshold 1.35]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument(
        "new",
        nargs="?",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench_full.json",
        ),
    )
    ap.add_argument("--threshold", type=float, default=1.35)
    args = ap.parse_args()

    with open(args.old) as fh:
        old_doc = json.load(fh)
    with open(args.new) as fh:
        new_doc = json.load(fh)
    old, new = old_doc["queries"], new_doc["queries"]

    # Host-speed normalization: when both boards carry the fixed-work
    # calibration block, report the host drift and divide it out of the
    # per-query ratios so code drift is judged on equal hardware terms.
    # The two primitives probe DIFFERENT axes (py_sha256 = one CPU
    # core; jvm_range_sum = JVM codegen + all-core parallelism); when
    # they disagree beyond the noise band, merging them manufactures a
    # drift neither measured — report both, normalize only on
    # agreement (r8: py 1.02x vs jvm 0.55x while the raw board was
    # flat — a merged 0.785x would have 'normalized' a flat board into
    # a fake 1.24x regression).
    host = None
    per_cal = {}
    oc, nc = old_doc.get("calibration"), new_doc.get("calibration")
    if oc and nc:
        per_cal = {
            k: nc[k] / oc[k] for k in sorted(set(oc) & set(nc)) if oc.get(k)
        }
        vals = list(per_cal.values())
        if vals and max(vals) / min(vals) <= 1.25:
            host = statistics.median(vals)

    shared = sorted(set(old) & set(new))
    ratios = {
        k: (new[k] / old[k] if old[k] > 0 else float("inf")) for k in shared
    }
    med = statistics.median(ratios.values())
    tot_old = sum(old[k] for k in shared)
    tot_new = sum(new[k] for k in shared)

    print(f"shared entries: {len(shared)}")
    print(f"total {tot_old:.1f}s -> {tot_new:.1f}s ({tot_new / tot_old:.3f}x)")
    print(f"median per-query ratio: {med:.3f}x")
    if per_cal:
        print(
            "calibration ratios: "
            + ", ".join(f"{k} {r:.3f}x" for k, r in per_cal.items())
        )
    if host:
        print(
            f"host calibration drift: {host:.3f}x -> "
            f"host-normalized median ratio: {med / host:.3f}x"
        )
        ratios = {k: r / host for k, r in ratios.items()}
    elif per_cal:
        print(
            "calibration primitives DISAGREE (>1.25x spread) — raw "
            "ratios reported, no host normalization applied"
        )
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"dropped entries: {', '.join(only_old)}")
    if only_new:
        print(f"new entries: {', '.join(f'{k} ({new[k]:.2f}s)' for k in only_new)}")

    regress = [(k, r) for k, r in ratios.items() if r > args.threshold]
    improve = [(k, r) for k, r in ratios.items() if r < 1 / args.threshold]
    if regress:
        print(f"\nregressions > {args.threshold}x:")
        for k, r in sorted(regress, key=lambda kv: -kv[1]):
            print(f"  {k:30s} {old[k]:7.3f}s -> {new[k]:7.3f}s  ({r:.2f}x)")
    if improve:
        print(f"\nimprovements > {args.threshold}x:")
        for k, r in sorted(improve, key=lambda kv: kv[1]):
            print(f"  {k:30s} {old[k]:7.3f}s -> {new[k]:7.3f}s  ({r:.2f}x)")


if __name__ == "__main__":
    main()
