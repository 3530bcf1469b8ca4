"""Per-file COLUMN-STATS pruning for non-time value predicates.

``status >= 500`` or ``bytes > 10_000_000`` on a rotated-log fleet
used to open every file: needles cover eq/IN/LIKE and time ranges, and
the listing prune covers file-constant columns, but nothing knew the
VALUE RANGES inside each file. This module gives the scan the same
trick parquet row-group statistics give Catalyst: per-file min/max for
the verbatim INTEGER/BIGINT columns (status, bytes, ports — the ops-
dashboard filter shapes), gathered once per file VERSION and consulted
at filter time to drop whole files whose range cannot satisfy a
conjunct.

Soundness bar (identical to the mtime bound's):

- Stats are keyed on a fresh ``(mtime, size)`` stat taken BEFORE the
  gathering scan. If the file grows between stat and scan, the stats
  describe MORE data than the key claims — a superset interval is
  still sound to prune with. Append-only rewrite races inside the
  stat's 1 s mtime resolution are outside the contract, same as the
  documented mtime bound.
- At prune time every file's CURRENT ``(mtime, size)`` is re-statted
  (one os.stat — the colstats path only engages for local listings,
  exactly like the log_file listing prune); a stale key means the
  stats are never consulted for that file.
- Only top-level CONJUNCTS of shape ``col <cmp> int-literal`` / ``col
  IN (...)`` prune, and NULL rows can never satisfy such a conjunct,
  so min/max over non-null values decides. A file with no qualifying
  rows at all (empty, or every value NULL) is prunable for any such
  conjunct.

Gathering policy (``spark.graft.pushdown.colStats``):

- ``auto`` (default): SECOND-TOUCH — a file's stats are computed the
  second time a prunable filter touches it, never the first. One-shot
  queries pay nothing; a dashboard's second refresh onward prunes. On
  a rotating fleet only the newest file is ever un-statted (old files
  keep their cached entry — their (mtime, size) never changes).
- ``eager``: compute on first touch (for workloads known to repeat).
- ``false``: off.

The gathering pass itself is one projection-pruned scan of ONLY the
files missing stats, aggregated per file (groupBy(log_file) min/max of
every verbatim int column at once — one pass amortizes across future
predicates on any of them). At 100 TB this is the index-build trade:
a narrow one-time scan per file version buys every later query a
listing-time skip of that file.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import functions as F

# path -> ((mtime, size), {col: (lo, hi)});  (None, None) = the file has
# no non-NULL value for the column (prunable under any interval)
_COLSTATS: dict[str, tuple] = {}
# second-touch counters for the auto policy; insert-capped like
# fs._MTIME_HINTS (entries for rotated files persist, bounded memory)
_TOUCH: dict[str, int] = {}
_CAP = 1_000_000

_INT_CMP = {
    "GreaterThan",
    "GreaterThanOrEqual",
    "LessThan",
    "LessThanOrEqual",
    "EqualTo",
    "EqualNullSafe",
}
_FLIP = {
    "GreaterThan": "LessThan",
    "GreaterThanOrEqual": "LessThanOrEqual",
    "LessThan": "GreaterThan",
    "LessThanOrEqual": "GreaterThanOrEqual",
    "EqualTo": "EqualTo",
    "EqualNullSafe": "EqualNullSafe",
}


def _stat_sig(path: str) -> Optional[tuple]:
    try:
        st = os.stat(path)
        return (st.st_mtime, st.st_size)
    except OSError:
        return None


def cond_int_intervals(cond, int_cols: set) -> dict[str, tuple]:
    """Intersected required interval per verbatim-int column from the
    top-level conjuncts of ``cond``: {col: (lo, hi)} with None = open.
    Over-approximates (IN becomes its hull); unrecognized conjuncts are
    simply ignored — both directions are sound for pruning."""
    from .pushdown import _INT_TYPES, _attr_name, _children, _flatten_and, _literal, _simple

    req: dict[str, tuple] = {}

    def merge(name: str, lo, hi) -> None:
        lo0, hi0 = req.get(name, (None, None))
        if lo is not None:
            lo0 = lo if lo0 is None else max(lo0, lo)
        if hi is not None:
            hi0 = hi if hi0 is None else min(hi0, hi)
        req[name] = (lo0, hi0)

    for c in _flatten_and(cond):
        s = _simple(c)
        if s in _INT_CMP:
            l, r = _children(c)
            for a, b, flipped in ((l, r, False), (r, l, True)):
                name = _attr_name(a)
                if name is None or name not in int_cols:
                    continue
                val, dt = _literal(b)
                if val is None or dt not in _INT_TYPES:
                    continue
                v = int(str(val))
                op = _FLIP[s] if flipped else s
                if op == "GreaterThan":
                    merge(name, v + 1, None)
                elif op == "GreaterThanOrEqual":
                    merge(name, v, None)
                elif op == "LessThan":
                    merge(name, None, v - 1)
                elif op == "LessThanOrEqual":
                    merge(name, None, v)
                else:  # EqualTo / EqualNullSafe
                    merge(name, v, v)
                break
        elif s == "In":
            kids = _children(c)
            name = _attr_name(kids[0])
            if name is None or name not in int_cols:
                continue
            vals = []
            ok = True
            for k in kids[1:]:
                val, dt = _literal(k)
                if val is None or dt not in _INT_TYPES:
                    ok = False
                    break
                vals.append(int(str(val)))
            if ok and vals:
                merge(name, min(vals), max(vals))
    return req


def _disjoint(stats: dict, req: dict) -> bool:
    """True when some required interval cannot be met by the file."""
    for col, (rlo, rhi) in req.items():
        if col not in stats:
            continue
        slo, shi = stats[col]
        if slo is None:  # no non-NULL value in the file for this column
            return True
        if rlo is not None and shi < rlo:
            return True
        if rhi is not None and slo > rhi:
            return True
    return False


def _gather(rebuild, missing: list, cols: set) -> dict:
    """One narrow scan over the files missing stats; per-file min/max of
    every verbatim int column. ``missing`` = [(bind_path, visible, sig)]."""
    frame = rebuild([], [b for b, _v, _s in missing])
    aggs = []
    for c in sorted(cols):
        aggs.append(F.min(c).alias(f"lo_{c}"))
        aggs.append(F.max(c).alias(f"hi_{c}"))
    rows = frame.groupBy("log_file").agg(*aggs).collect()
    by_v = {r["log_file"]: r for r in rows}
    out: dict = {}
    for b, v, sig in missing:
        r = by_v.get(v)
        if r is None:  # no parseable row in the file at all
            stats = {c: (None, None) for c in cols}
        else:
            stats = {c: (r[f"lo_{c}"], r[f"hi_{c}"]) for c in cols}
        _COLSTATS[b] = (sig, stats)
        out[b] = stats
    return out


def stats_for(rebuild, pairs: list, cols: set, policy: str) -> dict:
    """Fresh-keyed stats for the listing: {bind_path: {col: (lo, hi)}}.
    Every returned entry was validated against a stat taken NOW; files
    without fresh stats are simply absent (never pruned). May run the
    gathering scan per the policy."""
    fresh: dict = {}
    missing: list = []
    for b, v in pairs:
        sig = _stat_sig(b)
        if sig is None:
            continue
        ent = _COLSTATS.get(b)
        if ent is not None and ent[0] == sig:
            fresh[b] = ent[1]
        else:
            missing.append((b, v, sig))
    if missing and policy in ("auto", "eager"):
        if policy == "auto":
            due = []
            for b, v, sig in missing:
                t = _TOUCH.get(b, 0) + 1
                if len(_TOUCH) < _CAP or b in _TOUCH:
                    _TOUCH[b] = t
                if t >= 2:
                    due.append((b, v, sig))
            missing = due
        if missing:
            fresh.update(_gather(rebuild, missing, cols))
    return fresh
