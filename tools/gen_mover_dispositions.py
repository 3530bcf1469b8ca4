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
    "dedup_keep_best": (
        "fixed-r14(lp): label_propagation union+min rounds, window sizes; "
        "interleaved A/B 3.94->2.59 s (OPTIMIZATION_r14.md #7)"
    ),
    "pipeline_dedup_account": (
        "fixed-r14(lp): label_propagation union+min rounds, window sizes; "
        "interleaved A/B 3.24->2.52 s (OPTIMIZATION_r14.md #7)"
    ),
    "dedup_semantic_clusters": (
        "fixed-r14(lp): label_propagation union+min rounds, window sizes; "
        "interleaved A/B 4.53->3.82 s (OPTIMIZATION_r14.md #7)"
    ),
    "dedup_clusters": (
        "fixed-r14(lp): label_propagation union+min rounds, window sizes; "
        "A/B neutral at sf0.1, SMJ 2->0 (OPTIMIZATION_r14.md #7)"
    ),
    "dedup_jaccard_prefix": (
        "fixed-r14(barrier): array_intersect out of the join condition; "
        "interleaved A/B 4.5-5.1->3.7-3.9 s (OPTIMIZATION_r14.md #8)"
    ),
    "dedup_minhash_lsh": (
        "fixed-r14(barrier): array_intersect out of the join condition; "
        "A/B neutral at sf0.1, one intersection per pair (OPTIMIZATION_r14.md #8)"
    ),
    "dedup_embedding": (
        "fixed-r14(arrow): cosine kernel single-evaluation pin; A/B neutral "
        "at sf0.1, ArrowEvalPython 2->1 on the verify (OPTIMIZATION_r14.md #6)"
    ),
    "emb_threshold_curve": (
        "fixed-r14(arrow): inherits dedup_embedding's cosine single-evaluation "
        "pin (OPTIMIZATION_r14.md #6)"
    ),
    "ann_lsh_topk": "fixed-r14(arrow): bucket kernel single-evaluation pin (OPTIMIZATION_r14.md #6)",
    "ann_ivf_topk": "fixed-r14(arrow): cell kernel single-evaluation pin (OPTIMIZATION_r14.md #6)",
    "ann_radius_search": "fixed-r14(arrow): bucket kernel single-evaluation pin (OPTIMIZATION_r14.md #6)",
    "ann_knn_graph": "fixed-r14(arrow): bucket kernel single-evaluation pin (OPTIMIZATION_r14.md #6)",
    "ann_lsh_trained_topk": "fixed-r14(arrow): bucket kernel single-evaluation pin (OPTIMIZATION_r14.md #6)",
    "ann_recall_eval": "fixed-r14(arrow): composes ann_lsh_topk's pinned kernel (OPTIMIZATION_r14.md #6)",
    "emb_knn_consistency": "fixed-r14(arrow): composes ann_knn_graph's pinned kernel (OPTIMIZATION_r14.md #6)",
    # inherited first-session r14 fixes (kept from the previous regen)
    "bpe_train": (
        "fixed-r14(fold): K merge rounds folded driver-side over the collected "
        "<=2000-row vocab, 13 jobs->2; interleaved A/B 2.67->1.20 s"
    ),
    "dedup_minhash_eval": (
        "fixed-r14(pin): exact/cands pinned, 34->14 Exchanges; interleaved A/B 3.38->3.29 s"
    ),
    "emb_pca_power_step": (
        "fixed-r14(pin): m/u pinned, 50->12 Exchanges / 26->0 scans; interleaved A/B 1.09->1.04 s"
    ),
    "emb_pca_power_train": (
        "fixed-r14(pin): m/u1/u2 pinned, 134->12 Exchanges / 38->0 scans; interleaved A/B 3.63->2.19 s"
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
                f"host-state recovery: zero code change on this path this round; "
                f"{prev[n]:.2f}->{cur[n]:.2f} s ({r:.2f}x) where the prev board was the "
                f"interrupted session's host-contaminated close board "
                f"(jvm_range_sum_s {oc.get('jvm_range_sum_s')} vs healthy "
                f"{nc.get('jvm_range_sum_s')}); {drift_note}; fresh board matches the "
                f"r13 healthy-board band (OPTIMIZATION_r14.md #Round-close)"
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
