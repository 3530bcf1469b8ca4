"""Regenerate tools/mover_dispositions.json for the current board pair.

Compares bench_full.json vs bench_prev.json exactly like
tools/over2x_gate.py's mover stage (>=1 s on either board, >30% move,
calibration-normalized when the primitives agree), then writes a
disposition per mover:

- names listed in FIXED (touched this round, with interleaved A/B
  evidence in OPTIMIZATION_r14.md) get their fixed-r14 note;
- everything else gets the host-state note built from the two boards'
  calibration primitives (zero code change on those paths this round).

Run AFTER bench.py has produced the close board. DRY-RUN BY DEFAULT
(r14 ADVICE): the templated host-state note must be inspected — any
unexplained mover on a path this round touched must be investigated,
not templated away — so writing tools/mover_dispositions.json requires
an explicit --write.

    python tools/gen_mover_dispositions.py [--write]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# queries this round changed, with the A/B-backed explanation
FIXED = {
    "emb_outlier_filter": (
        "fixed-r15(pin): m/cen/dist pinned, 18->0 scans / 40->10 Exchanges; "
        "interleaved A/B 2.85->1.16 s (OPTIMIZATION_r15.md #1)"
    ),
    "events_funnel_dropoff": (
        "fixed-r15(pin): v/c/counts pinned, 36->0 scans / 76->2 Exchanges; "
        "interleaved A/B 1.59->0.75 s (OPTIMIZATION_r15.md #2)"
    ),
    "q17_funnel": (
        "fixed-r15(pin): v/c pinned, 12->2 scans; interleaved A/B "
        "0.97->0.61 s (OPTIMIZATION_r15.md #3)"
    ),
    "events_funnel_latency": (
        "fixed-r15(persist): v/c/lat persist-pinned (cache substitution, "
        "stats preserved); interleaved A/B 1.52->0.73 s (OPTIMIZATION_r15.md #4)"
    ),
    "dedup_clusters": (
        "fixed-r15(lp): pre-partitioned pinned edges + seeded round 1; "
        "kernel A/B -16..-20%, consumer flat at sf0.1 (OPTIMIZATION_r15.md #5)"
    ),
    "dedup_semantic_clusters": (
        "fixed-r15(lp): pre-partitioned pinned edges + seeded round 1; "
        "interleaved A/B 5.77->4.32 s (OPTIMIZATION_r15.md #5)"
    ),
    "dedup_keep_best": (
        "fixed-r15(lp): same LP kernel (isolated A/B -16..-20%); composite "
        "noise-bound on this host, plans identical (OPTIMIZATION_r15.md #5)"
    ),
    "pipeline_dedup_account": (
        "fixed-r15(lp): pre-partitioned pinned edges + seeded round 1; "
        "interleaved A/B 2.87->2.43 s (OPTIMIZATION_r15.md #5)"
    ),
    "kmeans_train": (
        "fixed-r15(jobs): in-loop model collect without posexplode/ORDER BY "
        "(one fewer sampling job per iteration); A/B neutral (OPTIMIZATION_r15.md #6)"
    ),
    "corpus_tfidf_pairs": (
        "fixed-r15(partition): wts materialized pre-partitioned on the term "
        "key; local plan BHJ either way, A/B neutral-positive (OPTIMIZATION_r15.md #7)"
    ),
    "text_lm_score": (
        "fixed-r15(pin): tokenized projection pinned, 6->0 scans; "
        "A/B 1.62->1.49 s (OPTIMIZATION_r15.md #8)"
    ),
    "text_ccnet_bucket": (
        "fixed-r15(materialize): scored frame persisted for the two-phase "
        "rank + inherits the lm_score pin, 8->2 scans (OPTIMIZATION_r15.md #9)"
    ),
    "text_dsir_weights": (
        "fixed-r15(derive): totals from the pinned count table, 8->2 scans / "
        "18->10 Exchanges; A/B 0.91->0.81 s (OPTIMIZATION_r15.md #10)"
    ),
    "text_heaps_law": (
        "fixed-r15(pin): docs_n/mx pinned, 8->2 scans; A/B 1.86->1.74 s "
        "(OPTIMIZATION_r15.md #11)"
    ),
    "text_winnow_dedup": (
        "fixed-r15(pin): fps persist-pinned (3 consumers re-ran the winnowing "
        "pipeline); count A/B 1.01-1.11->0.48-0.50 s (OPTIMIZATION_r15.md #12; "
        "landed after the close board, which still shows the pre-pin time)"
    ),
}


def main() -> int:
    dry = "--write" not in sys.argv  # inspect-first default (r14 ADVICE)
    with open(os.path.join(ROOT, "bench_full.json")) as fh:
        cur_doc = json.load(fh)
    with open(os.path.join(ROOT, "bench_prev.json")) as fh:
        prev_doc = json.load(fh)
    prev, cur = prev_doc.get("queries", {}), cur_doc.get("queries", {})
    oc, nc = prev_doc.get("calibration", {}), cur_doc.get("calibration", {})
    host = 1.0
    drift_note = "no calibration on one side"
    if oc and nc:
        drifts = sorted(nc[k] / oc[k] for k in sorted(set(oc) & set(nc)) if oc.get(k))
        if drifts and drifts[-1] / drifts[0] <= 1.25:
            host = drifts[len(drifts) // 2]
            drift_note = f"normalized by median calibration drift {host:.2f}x"
        else:
            pairs = ", ".join(
                f"{k} {nc[k] / oc[k]:.2f}x" for k in sorted(set(oc) & set(nc)) if oc.get(k)
            )
            drift_note = f"calibration primitives disagree ({pairs}) so no normalization"
    out = {}
    for n in sorted(set(prev) & set(cur)):
        if max(prev[n], cur[n]) < 1.0 or prev[n] <= 0:
            continue
        r = (cur[n] / prev[n]) / host
        if not (r > 1.3 or r < 1 / 1.3):
            continue
        if n in FIXED:
            out[n] = (
                f"{FIXED[n]}; board move {r:.2f}x ({prev[n]:.2f}->{cur[n]:.2f} s)"
            )
        else:
            out[n] = (
                f"cross-board artifact: zero code change on this path this round; "
                f"{prev[n]:.2f}->{cur[n]:.2f} s ({r:.2f}x) where the prev board is the "
                f"DRIVER'S CPUS=8 scaling board (BENCH_r14_c8 overwrote bench_full.json "
                f"at round start) and this board is the r15 close at CPUS=32 — the pair "
                f"differs by core count and host, not by plan "
                f"(jvm_range_sum_s {oc.get('jvm_range_sum_s')} vs {nc.get('jvm_range_sum_s')}); "
                f"{drift_note} (OPTIMIZATION_r15.md #Round-close)"
            )
        print(f"{n}: {r:.2f}x ({prev[n]:.2f}->{cur[n]:.2f} s) {'FIXED' if n in FIXED else 'host'}")
    print(f"{len(out)} movers")
    if dry:
        print("dry-run (default): pass --write to persist mover_dispositions.json")
    if not dry:
        with open(os.path.join(ROOT, "tools", "mover_dispositions.json"), "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
