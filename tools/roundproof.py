"""One-shot mechanical sweep: make every quantization engine-proof.

``round(x, k)`` is not portable across SQL engines: Spark rounds the
double's exact BigDecimal expansion HALF_UP, DuckDB builds differ in
how they resolve ties/last-ulp boundaries (CORRECTNESS_r01-r04: every
red row this project ever had was a round() boundary flip). The
portable form is ``floor(x * 10^k + 0.5) / 10^k`` — floor plus the
four IEEE-754 basic operations, all of which are correctly rounded by
spec and therefore bit-identical on ANY engine.

This script rewrites, in ``duckdb_httpd_log_spark/operators/*.py``:
  1. code:   ``F.round(``      -> ``fround(``  (helper in plans.registry
              with the floor-form semantics and the same call shape);
  2. string literals (oracle SQL and F.expr SQL alike):
              ``round(EXPR, k)`` -> ``floor((EXPR) * 10^k.0 + 0.5) / 10^k.0``
              ``round(EXPR)``    -> ``floor((EXPR) + 0.5)``

Comments/docstrings are left untouched. Anything it cannot rewrite
mechanically (non-literal scale, unbalanced parens) is reported for a
manual pass. Intended to be run once and audited via git diff; kept in
tools/ as the executable record of the transform.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

OPS = Path(__file__).resolve().parent.parent / "duckdb_httpd_log_spark" / "operators"


def segments(text: str):
    """Yield (start, end, kind) spans; kind in {code, string, comment}."""
    i, n = 0, len(text)
    out = []
    while i < n:
        c = text[i]
        if c == "#":
            j = text.find("\n", i)
            j = n if j == -1 else j
            out.append((i, j, "comment"))
            i = j
        elif c in "\"'":
            # string start (possibly triple); include any r/f/b prefix in
            # the span start for clarity (not needed for rewriting)
            q = text[i : i + 3]
            if q == c * 3:
                j = text.find(q, i + 3)
                j = n if j == -1 else j + 3
            else:
                j = i + 1
                while j < n:
                    if text[j] == "\\":
                        j += 2
                        continue
                    if text[j] == c or text[j] == "\n":
                        j += 1
                        break
                    j += 1
            out.append((i, j, "string"))
            i = j
        else:
            j = i
            while j < n and text[j] not in "#\"'":
                j += 1
            out.append((i, j, "code"))
            i = j
    return out


def split_top_level(s: str) -> list[str]:
    """Split on top-level commas, respecting (), [] and '...' quotes."""
    parts, depth, q, start = [], 0, None, 0
    i = 0
    while i < len(s):
        c = s[i]
        if q:
            if c == q:
                q = None
        elif c in "'\"":
            q = c
        elif c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return parts


def rewrite_sql(s: str, warn: list[str]) -> str:
    """Rewrite every round( call in an SQL-ish string to floor form."""
    out = []
    i = 0
    pat = re.compile(r"round\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(s, i)
        if not m:
            out.append(s[i:])
            break
        if m.start() > 0 and (s[m.start() - 1].isalnum() or s[m.start() - 1] in "._"):
            out.append(s[i : m.end()])
            i = m.end()
            continue
        # paren-match from m.end()-1
        depth, j, q = 1, m.end(), None
        while j < len(s) and depth:
            c = s[j]
            if q:
                if c == q:
                    q = None
            elif c in "'\"":
                q = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        if depth:
            warn.append(f"unbalanced parens in string: ...{s[m.start():m.start()+60]!r}")
            out.append(s[i : m.end()])
            i = m.end()
            continue
        inner = rewrite_sql(s[m.end() : j - 1], warn)  # recurse into nested round()
        args = split_top_level(inner)
        out.append(s[i : m.start()])
        if len(args) == 1:
            out.append(f"floor(({inner.strip()}) + 0.5)")
        elif len(args) == 2 and re.fullmatch(r"\s*\d+\s*", args[1]):
            k = int(args[1])
            # scientific literal: DOUBLE in both Spark SQL and DuckDB.
            # (a `10000.0` literal is DECIMAL in Spark SQL, and
            # BIGINT-floor / DECIMAL yields DECIMAL — a driver-hash
            # schema bug the first sweep hit.)
            scale = f"1e{k}"
            out.append(f"floor(({args[0].strip()}) * {scale} + 0.5) / {scale}")
        else:
            warn.append(f"non-literal scale: round({inner[:80]!r})")
            out.append(s[m.start() : j])
        i = j
    return "".join(out)


def process(path: Path) -> None:
    text = path.read_text()
    warn: list[str] = []
    pieces = []
    for a, b, kind in segments(text):
        seg = text[a:b]
        if kind == "code":
            seg = seg.replace("F.round(", "fround(")
            for m in re.finditer(r"(?<![\w.])round\s*\(", seg):
                warn.append(f"bare python round( in code near: {seg[m.start():m.start()+60]!r}")
        elif kind == "string" and re.search(r"round\s*\(", seg, re.IGNORECASE):
            seg = rewrite_sql(seg, warn)
        pieces.append(seg)
    new = "".join(pieces)
    if "fround(" in new and "fround" not in text:
        # extend the registry import line
        new, cnt = re.subn(
            r"from \.\.plans\.registry import ([^\n]*)",
            lambda m: "from ..plans.registry import "
            + (m.group(1) if "fround" in m.group(1) else "fround, " + m.group(1)),
            new,
            count=1,
        )
        if not cnt:
            warn.append("could not add fround import")
    if new != text:
        path.write_text(new)
        print(f"rewrote {path.name}")
    for w in warn:
        print(f"  WARN {path.name}: {w}")


if __name__ == "__main__":
    targets = sys.argv[1:] or sorted(OPS.glob("*.py"))
    for p in targets:
        process(Path(p))
