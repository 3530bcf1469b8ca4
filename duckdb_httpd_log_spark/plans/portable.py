"""Engine-portable transcendental functions as pinned SQL expression
forms.

Why this exists (CORRECTNESS_r05 post-mortem): libm's ln/exp are NOT
correctly rounded — IEEE-754 only mandates correct rounding for the
basic ops (+, -, *, /, sqrt, floor, int<->double casts). Two healthy
engines can disagree by 1 ulp on ln(x), and with ~1e5 quantized
c*ln(c) terms per query some term always lands inside the ulp band of
a floor(x*1e6 + 0.5) boundary, flipping the driver's value hash.
The floor-form quantization (plans/registry.fround) fixed tie
RESOLUTION but cannot fix divergent INPUTS.

The escape: define the operators' semantics via fixed polynomials
built ONLY from correctly-rounded basic ops, emitted as one canonical
SQL string that both Spark (via F.expr) and the DuckDB oracle parse
into the same arithmetic DAG. Same expression tree + correctly-rounded
ops = bit-identical doubles on ANY IEEE engine. The ~1e-10
approximation error vs true ln is irrelevant: both engines make the
SAME error, and the polynomial *defines* the operator.

pln(k) — natural log of a positive BIGINT expression:
    e = length(bin(k)) - 1            (floor(log2 k), exact via the
                                       binary-string trick; both
                                       engines' bin() render BIGINT
                                       as minimal binary digits)
    m = k / 2^e  in [1, 2)            (2^e via BIGINT << — exact)
    z = (m-1)/(m+1)  in [0, 1/3)
    ln k = e*LN2 + 2z*(1 + z^2/3 + z^4/5 + ... + z^16/17)
    truncation error <= 2*(1/3)^19/19 ~ 9.1e-11.

pexp(x) — e^x for |x| <= ~85. OUTSIDE that range the engines DIVERGE
HARD: |n| > 124 makes |b| = |n - a| exceed 62, and DuckDB raises
Out of Range on BIGINT << past 62 while the JVM wraps the shift
mod 64 — so an out-of-domain input is an oracle ERROR, not a shared
saturation (tests/test_portable.py pins this). Callers must prove the
bound: the two registry call sites are events_attribution_decay
(x = -d_us·DECAY_RATE, d_us <= 24 h in µs -> |x| <= 2.8) and
text_lm_score's perplexity (x = -avg bigram logprob; per-bigram
|ln(c_ab/c_w)| <= ln(corpus tokens) ~ 28 even at 1e12 tokens):
    n = round(x / LN2)  (floor form), r = x - n*LN2, |r| <= 0.3466
    e^x = 2^a * 2^b * P(r),  a = clamp(n, ±62), b = n - a
    P(r) = Taylor to r^11/11!, truncation error ~ 6e-15.

Both dialect primitives were verified identical on Spark 4.1 and
DuckDB: length(bin(CAST(k AS BIGINT))), CAST(1 AS BIGINT) << e,
floor, GREATEST/LEAST, CASE WHEN, arithmetic and casts.

Usage pattern: stage the integer argument as a plain CTE/withColumn
column first (the argument snippet is textually repeated ~17x), then
splice pln("col") verbatim into BOTH the oracle SQL f-string and
F.expr(...) on the Spark side, so the two surfaces cannot drift.
"""

from __future__ import annotations

import math


def dlit(x: float) -> str:
    """Shortest-exact DOUBLE literal. The exponent suffix matters:
    DuckDB parses bare decimal literals as DECIMAL (where literal *
    literal arithmetic overflows and promotion rules differ), while
    e-notation literals are DOUBLE in both engines."""
    r = repr(x)
    return r if ("e" in r or "E" in r) else r + "e0"


# Shortest-exact reprs; these literals ARE the semantics.
LN2 = dlit(math.log(2.0))  # 0.6931471805599453e0
LOG2E = dlit(1.0 / math.log(2.0))  # 1.4426950408889634e0

# atanh-series coefficients 1/(2i+1), i = 1..8
_LN_COEFFS = [dlit(1.0 / k) for k in (3, 5, 7, 9, 11, 13, 15, 17)]
# exp Taylor coefficients 1/k!, k = 2..11
_EXP_COEFFS = [dlit(1.0 / math.factorial(k)) for k in range(2, 12)]


def pln(k: str) -> str:
    """SQL for ln(k), k a positive-BIGINT expression (ideally a bare
    column name — it is repeated many times in the expansion)."""
    e = f"(length(bin(CAST({k} AS BIGINT))) - 1)"
    p2 = f"CAST(CAST(1 AS BIGINT) << {e} AS DOUBLE)"
    m = f"(CAST({k} AS DOUBLE) / {p2})"
    z = f"(({m} - 1.0e0) / ({m} + 1.0e0))"
    zz = f"({z} * {z})"
    # Horner over z^2: 2z*(1 + zz*(1/3 + zz*(1/5 + ...)))
    acc = _LN_COEFFS[-1]
    for c in reversed(_LN_COEFFS[:-1]):
        acc = f"({c} + {zz} * {acc})"
    poly = f"(2.0e0 * {z} * (1.0e0 + {zz} * {acc}))"
    return f"(CAST({e} AS DOUBLE) * {LN2} + {poly})"


def pln_stages(k: str, prefix: str) -> tuple[list[tuple[str, str]], str]:
    """Staged-column form of pln(k): ([(col, sql), ...], value_col).

    Same arithmetic DAG as pln(k) computed through named intermediate
    columns instead of macro substitution, so the values are
    bit-identical (every step is the identical correctly-rounded op
    sequence — tests/test_portable.py::test_pln_stages_bit_identical
    sweeps it) while the expression trees shrink ~5x. The macro form
    cost a flat ~0.3-0.7 s of Catalyst analysis/codegen per query on
    the r6 bench board (dp_noisy_counts 3.1x, token_bigram_pmi 2.1x
    vs r5); Spark's CollapseProject keeps this staging because z/zz
    are referenced more than once and are not cheap to duplicate.

    Use: chain the (col, sql) pairs with .withColumn on the Spark side
    and `SELECT *, <sql> AS <col>` sub-selects (or CTE steps) in the
    oracle SQL, then reference the returned value column.
    """
    e, m, z, zz, v = (f"{prefix}_{s}" for s in ("e", "m", "z", "zz", "ln"))
    acc = _LN_COEFFS[-1]
    for c in reversed(_LN_COEFFS[:-1]):
        acc = f"({c} + {zz} * {acc})"
    return (
        [
            (e, f"(length(bin(CAST({k} AS BIGINT))) - 1)"),
            (m, f"(CAST({k} AS DOUBLE) / CAST(CAST(1 AS BIGINT) << {e} AS DOUBLE))"),
            (z, f"(({m} - 1.0e0) / ({m} + 1.0e0))"),
            (zz, f"({z} * {z})"),
            (
                v,
                f"(CAST({e} AS DOUBLE) * {LN2}"
                f" + (2.0e0 * {z} * (1.0e0 + {zz} * {acc})))",
            ),
        ],
        v,
    )


def with_stages(df, stages: list[tuple[str, str]]):
    """Add all stage columns in ONE select via lateral column aliases.

    A .withColumn chain pays a full Catalyst analysis round per stage
    (25 stages cost ~0.5 s of flat per-query overhead at any data
    size — token_bigram_pmi's residual r7 gap vs its r5 macro form was
    exactly this). Spark resolves references to earlier aliases in the
    same SELECT list (lateral column aliases, rewritten internally to
    nested Projects), so one selectExpr analyzes once and produces the
    identical op DAG — bit-equality is swept by
    tests/test_portable.py::test_with_stages_bit_identical.
    """
    return df.selectExpr("*", *[f"{sql} AS {col}" for col, sql in stages])


def stage_subselects(inner: str, stages: list[tuple[str, str]]) -> str:
    """Wrap an inner `SELECT ... FROM ...` in one nested sub-select per
    stage column — the SQL mirror of a Spark .withColumn chain."""
    out = inner
    for col, sql in stages:
        out = f"SELECT *, {sql} AS {col} FROM ({out})"
    return out


def pln_ratio(a: str, b: str) -> str:
    """SQL for ln(a/b) of two positive-BIGINT expressions, defined as
    pln(a) - pln(b) (the definition; NOT ln of the double quotient)."""
    return f"({pln(a)} - {pln(b)})"


def pexp(x: str) -> str:
    """SQL for e^x, x a DOUBLE expression (ideally a bare column name).
    Valid ONLY for |x| <= ~85: beyond that DuckDB raises on the <<
    while the JVM wraps it mod 64 (see module docstring) — every call
    site must carry a proof of its input bound. Defense-in-depth on
    top of those proofs (r6 ADVICE): the emitted expression guards the
    domain itself with 0.0/0.0 — NULL on BOTH engines (verified: both
    return NULL for double zero-over-zero) — so a future out-of-bound
    call site degrades identically on the two surfaces instead of
    DuckDB erroring while the JVM silently wraps the shift."""
    n = f"CAST(floor(({x}) * {LOG2E} + 0.5e0) AS BIGINT)"
    r = f"(({x}) - CAST({n} AS DOUBLE) * {LN2})"
    a = f"GREATEST(CAST(-62 AS BIGINT), LEAST(CAST(62 AS BIGINT), {n}))"
    b = f"({n} - {a})"
    pow2a = _pow2(a)
    pow2b = _pow2(b)
    # Taylor Horner: 1 + r*(1 + r*(1/2 + r*(1/6 + ...)))
    acc = _EXP_COEFFS[-1]
    for c in reversed(_EXP_COEFFS[:-1]):
        acc = f"({c} + {r} * {acc})"
    poly = f"(1.0e0 + {r} * (1.0e0 + {r} * {acc}))"
    body = f"(({pow2a} * {pow2b}) * {poly})"
    return (
        f"(CASE WHEN abs({x}) > 85.0e0 THEN (0.0e0 / 0.0e0) "
        f"ELSE {body} END)"
    )


def _pow2(m: str) -> str:
    """SQL for 2^m, m a BIGINT expression in [-62, 62]."""
    return (
        f"(CASE WHEN {m} >= 0 THEN CAST(CAST(1 AS BIGINT) << {m} AS DOUBLE) "
        f"ELSE 1.0e0 / CAST(CAST(1 AS BIGINT) << (0 - {m}) AS DOUBLE) END)"
    )
