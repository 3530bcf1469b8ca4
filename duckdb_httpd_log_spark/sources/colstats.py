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
  — one os.stat for local listings, one Hadoop listStatus per parent
  directory for scheme-qualified listings (s3a/hdfs/viewfs/...; see
  fs.file_sigs — batched so a 1000-file rotated dir costs one LIST
  RPC, not 1000 HEADs); a stale key means the stats are never
  consulted for that file.
- The prune decision is taken at ``.filter()`` time against that
  fresh stat; like every listing-prune tier, the decision is BAKED
  into the returned plan. A pruned DataFrame re-EXECUTED much later,
  after a file was appended with newly-qualifying rows, still
  excludes that file — the mtime tier absorbs its analogous gap with
  a 2-day slack, but a value range has no slack dimension. Contract:
  derivation-to-action gaps are covered (the stat is fresh at filter
  time); filter-to-re-execution gaps are not — re-apply the filter
  (any dashboard refresh does) to re-validate against current keys.
- Only top-level CONJUNCTS of shape ``col <cmp> int-literal`` / ``col
  IN (...)`` prune, and NULL rows can never satisfy such a conjunct,
  so min/max over non-null values decides. A file with no qualifying
  rows at all (empty, or every value NULL) is prunable for any such
  conjunct.
- Stats describe the rows ONE READER CONFIGURATION produces: the same
  file parsed under a different format, conf, or line_filter yields
  different row sets, so the cache key carries the reader's config
  FINGERPRINT (regex + line_filter — see reader.py) alongside the
  path. Two readers over the same files share stats only when their
  row views provably agree.

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

from typing import Optional

from pyspark.sql import functions as F

# (reader-config fingerprint, path) -> ((mtime, size), {col: (lo, hi)});
# (None, None) = the file has no non-NULL value for the column (prunable
# under any interval). The fingerprint keeps a second reader with a
# different format/line_filter from reusing stats computed over a
# narrower row view (r13 ADVICE high).
_COLSTATS: dict[tuple, tuple] = {}
# second-touch counters for the auto policy; insert-capped like
# fs._MTIME_HINTS (entries for rotated files persist, bounded memory)
_TOUCH: dict[tuple, int] = {}
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


# --- persistent sidecar (streaming colstats, r14) ---------------------------
# A stream only ever reads NEW files, so an in-process cache can never
# serve its own prune: the payoff is COLD-START over a directory with
# history (a fresh alerting query over 10k rotated files skips every
# file whose range can't satisfy the value filter) — which crosses
# process boundaries. Opt-in via the datasource's colstats_dir option:
# one tiny JSON per (reader-fingerprint, file), written atomically
# (tmp + rename), validated against a fresh (mtime, size) stat before
# every use exactly like the in-memory entries.


def _persist_name(fp: str, path: str) -> str:
    import hashlib

    return hashlib.md5(f"{fp}\x00{path}".encode()).hexdigest() + ".json"


def load_persisted(dirpath: str, fp: str, path: str) -> Optional[tuple]:
    """((mtime, size), {col: (lo, hi)}) or None — NOT freshness-checked
    (callers compare the sig against a fresh stat, same as memory)."""
    import json
    import os

    try:
        with open(os.path.join(dirpath, _persist_name(fp, path))) as fh:
            doc = json.load(fh)
        sig = tuple(doc["sig"])
        stats = {c: (v[0], v[1]) for c, v in doc["stats"].items()}
        return (sig, stats)
    except (OSError, ValueError, KeyError, TypeError):
        return None


def persist(dirpath: str, fp: str, path: str, sig: tuple, stats: dict) -> None:
    import json
    import os
    import tempfile

    try:
        os.makedirs(dirpath, exist_ok=True)
        doc = {"path": path, "fp": fp, "sig": list(sig), "stats": stats}
        fd, tmp = tempfile.mkstemp(dir=dirpath, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(doc, fh)
        os.replace(tmp, os.path.join(dirpath, _persist_name(fp, path)))
    except OSError:
        pass  # persistence is an optimization — never fail the read


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


def _gather(rebuild, fp: str, missing: list, cols: set) -> dict:
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
        _COLSTATS[(fp, b)] = (sig, stats)
        out[b] = stats
    return out


def stats_for(
    spark, rebuild, fp: str, pairs: list, cols: set, policy: str
) -> dict:
    """Fresh-keyed stats for the listing: {bind_path: {col: (lo, hi)}}.
    Every returned entry was validated against a (mtime, size) signature
    taken NOW (fs.file_sigs — os.stat locally, batched Hadoop listStatus
    for scheme paths); files without fresh stats are simply absent
    (never pruned). ``fp`` is the reader-config fingerprint the cache is
    scoped by. May run the gathering scan per the policy."""
    from .fs import file_sigs

    sigs = file_sigs(spark, [b for b, _v in pairs])
    fresh: dict = {}
    missing: list = []
    for (b, v), sig in zip(pairs, sigs):
        if sig is None:
            continue
        ent = _COLSTATS.get((fp, b))
        if ent is not None and ent[0] == sig:
            fresh[b] = ent[1]
        else:
            missing.append((b, v, sig))
    if missing and policy in ("auto", "eager"):
        if policy == "auto":
            due = []
            for b, v, sig in missing:
                t = _TOUCH.get((fp, b), 0) + 1
                if len(_TOUCH) < _CAP or (fp, b) in _TOUCH:
                    _TOUCH[(fp, b)] = t
                if t >= 2:
                    due.append((b, v, sig))
            missing = due
        if missing:
            fresh.update(_gather(rebuild, fp, missing, cols))
    return fresh
