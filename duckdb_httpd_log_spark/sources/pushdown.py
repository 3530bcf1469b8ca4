"""Automatic raw-line pre-filter pushdown for the log scan.

``line_filter=`` (reader.py) lets a caller hand the scan a substring
needle that runs as a vectorized byte scan BEFORE the parse regex.
This module derives that needle AUTOMATICALLY from an ordinary typed
filter placed on the scan result — ``read_httpd_log(...).filter(
col("status") == 500)`` — so the optimization needs no user opt-in:

1. ``read_httpd_log`` returns a ``LineFilterableFrame`` (a DataFrame
   subclass; every other method is inherited unchanged);
2. its ``filter``/``where`` analyzes the predicate via the ANALYZED
   catalyst plan (the resolved expression tree — Column objects no
   longer expose ``expr()`` in Spark 4) and extracts substring needles
   that are SOUND: `typed-predicate holds ⇒ raw line contains needle`;
3. on success the scan is re-issued with the needles pushed below the
   parse (reader._read_fast applies them to the raw ``value`` column),
   and the original typed predicate still runs on top — so false
   positives of the byte scan are removed and the result is
   value-identical to the un-pushed plan, only cheaper: lines failing
   the needle never reach the regex.

Soundness per leaf:
- string equality / Contains / StartsWith / EndsWith / LIKE-segments /
  IN on a VERBATIM string column (a regex capture emitted unchanged;
  excludes %X's remapped close/keepalive/aborted values, timestamp,
  interval and boolean columns, log_file, and hive partition keys):
  the typed value is a substring of the raw line, so the literal (or
  each literal LIKE segment) must appear verbatim.
- integer equality / IN on an int/bigint column: any token Spark's
  try_cast maps to value v contains the canonical digit string of
  |v| ("0500" contains "500", "-0500" contains "500"). Literal 0 is
  skipped — the %b byte-count family maps "-" to 0 without a "0" in
  the raw line.
Conjunctions push every derivable conjunct; disjunctions push only if
every branch is derivable (as an OR-of-contains group); anything else
falls back to the unmodified plan. CNF across OR-of-ANDs distributes.

Cited parity anchor: the reference parses every line unconditionally
(src/httpd_log_file_reader.cpp); this pushdown is beyond-reference,
motivated by its TODO-free single-pass design — the only way to beat
"parse everything" is to not parse non-matching lines at all.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from pyspark.sql import functions as F
from pyspark.sql.classic.dataframe import DataFrame

# CNF: AND over groups, OR within a group
Needles = List[List[str]]

_INT_TYPES = {"int", "bigint", "smallint", "tinyint"}


def _simple(e) -> str:
    return e.getClass().getSimpleName()


def _children(e):
    cs = e.children()
    return [cs.apply(i) for i in range(cs.size())]


def _unwrap_cast(e):
    while _simple(e) in ("Cast", "AnsiCast", "TryCast"):
        e = _children(e)[0]
    return e


def _attr_name(e) -> Optional[str]:
    e = _unwrap_cast(e)
    if _simple(e) == "AttributeReference":
        return e.name()
    return None


def _literal(e):
    """(python value, simple dtype) for a Literal, else (None, None)."""
    e = _unwrap_cast(e)
    if _simple(e) != "Literal" or e.value() is None:
        return None, None
    return e.value(), e.dataType().simpleString()


def _int_needle(v) -> Optional[str]:
    try:
        iv = int(str(v))
    except (TypeError, ValueError):
        return None
    if iv == 0:
        return None  # "-" parses to 0 for byte counts: no "0" in the raw line
    return str(abs(iv))


def _eq_needles(left, right, verbatim_str, verbatim_int) -> Optional[Needles]:
    for a, b in ((left, right), (right, left)):
        name = _attr_name(a)
        if name is None:
            continue
        val, dt = _literal(b)
        if val is None:
            continue
        if name in verbatim_str and dt == "string":
            s = str(val)
            return [[s]] if s else None
        if name in verbatim_int and dt in _INT_TYPES:
            n = _int_needle(val)
            return [[n]] if n else None
    return None


def _like_segments(pattern: str, escape: str = "\\") -> List[str]:
    segs, cur, i = [], [], 0
    while i < len(pattern):
        c = pattern[i]
        if c == escape and i + 1 < len(pattern):
            cur.append(pattern[i + 1])
            i += 2
            continue
        if c in ("%", "_"):
            if cur:
                segs.append("".join(cur))
                cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        segs.append("".join(cur))
    return [s for s in segs if s]


def _or_merge(a: Needles, b: Needles) -> Needles:
    # (A1∧A2) ∨ (B1∧B2) distributes to ∧ over all (Ai ∨ Bj)
    return [ga + gb for ga in a for gb in b]


def derive_needles(e, verbatim_str, verbatim_int) -> Optional[Needles]:
    cls = _simple(e)
    if cls == "And":
        l, r = _children(e)
        dl = derive_needles(l, verbatim_str, verbatim_int)
        dr = derive_needles(r, verbatim_str, verbatim_int)
        if dl and dr:
            return dl + dr
        return dl or dr
    if cls == "Or":
        l, r = _children(e)
        dl = derive_needles(l, verbatim_str, verbatim_int)
        dr = derive_needles(r, verbatim_str, verbatim_int)
        if dl and dr:
            return _or_merge(dl, dr)
        return None
    if cls in ("EqualTo", "EqualNullSafe"):
        l, r = _children(e)
        return _eq_needles(l, r, verbatim_str, verbatim_int)
    if cls in ("Contains", "StartsWith", "EndsWith"):
        l, r = _children(e)
        name = _attr_name(l)
        val, dt = _literal(r)
        if name in verbatim_str and dt == "string" and val is not None:
            s = str(val)
            return [[s]] if s else None
        return None
    if cls == "Like":
        l, r = _children(e)
        name = _attr_name(l)
        val, dt = _literal(r)
        if name in verbatim_str and dt == "string" and val is not None:
            # honor LIKE ... ESCAPE 'x': parsing the pattern with the
            # wrong escape char would derive a WRONG needle (e.g.
            # `a!%' ESCAPE '!'` means literal "a%", not prefix "a!")
            # and silently drop matching rows from the pushed scan.
            try:
                esc = str(e.escapeChar())
            except Exception:
                return None
            if len(esc) != 1:
                return None
            segs = _like_segments(str(val), esc)
            return [[s] for s in segs] or None
        return None
    if cls == "In":
        kids = _children(e)
        name = _attr_name(kids[0])
        if name is None:
            return None
        group: List[str] = []
        for lit in kids[1:]:
            val, dt = _literal(lit)
            if val is None:
                return None
            if name in verbatim_str and dt == "string" and str(val):
                group.append(str(val))
            elif name in verbatim_int and dt in _INT_TYPES:
                n = _int_needle(val)
                if n is None:
                    return None
                group.append(n)
            else:
                return None
        return [group] if group else None
    return None


def apply_cnf(df: DataFrame, cnf: Needles) -> DataFrame:
    """AND of OR-of-contains over the raw ``value`` column."""
    for group in cnf:
        pred = F.col("value").contains(group[0])
        for n in group[1:]:
            pred = pred | F.col("value").contains(n)
        df = df.filter(pred)
    return df


class LineFilterableFrame(DataFrame):
    """read_httpd_log's fast-path result: a plain DataFrame whose
    ``filter``/``where`` additionally attempts the raw-line Contains
    pushdown. Every derived transformation returns a plain DataFrame,
    so the pushdown applies exactly where it is sound: predicates
    placed directly on the scan result."""

    def __new__(cls, *args, **kwargs):
        # the classic DataFrame.__new__ hard-codes the (jdf, sql_ctx)
        # ctor shape and invokes __init__ itself; bypass it
        return object.__new__(cls)

    def __init__(
        self,
        df: DataFrame,
        rebuild: Callable[[Needles], DataFrame],
        verbatim_str: set,
        verbatim_int: set,
    ):
        super().__init__(df._jdf, df.sparkSession)
        self._lf_rebuild = rebuild
        self._lf_str = verbatim_str
        self._lf_int = verbatim_int

    def filter(self, condition):  # type: ignore[override]
        plain = super().filter(condition)
        try:
            jplan = plain._jdf.queryExecution().analyzed()
            if _simple(jplan) != "Filter":
                return plain
            cond = jplan.condition()
            cnf = derive_needles(cond, self._lf_str, self._lf_int)
            if not cnf:
                return plain
            rebuilt = self._lf_rebuild(cnf)
            return rebuilt.filter(F.expr(cond.sql()))
        except Exception:
            # introspection is best-effort: any surprise keeps the
            # unmodified (still-correct) plan
            return plain

    where = filter
