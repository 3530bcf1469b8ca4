"""Cross-engine bit-equality proof for the portable transcendental
forms (plans/portable.py).

The contract these tests pin: pln/pexp are built ONLY from IEEE-754
correctly-rounded basic ops, emitted as ONE SQL string parsed by both
Spark and DuckDB, so the two engines must produce BIT-IDENTICAL
doubles — not merely close ones. This is what makes the entropy/PMI/
KL/PSI query family immune to cross-build libm variance (the
CORRECTNESS_r05 red-row disease).
"""

from __future__ import annotations

import math
import struct

import pytest

from duckdb_httpd_log_spark.plans.portable import LN2, LOG2E, pexp, pln, pln_ratio

K_SWEEP = (
    list(range(1, 2000))
    + [2**i for i in range(1, 63)]
    + [2**i - 1 for i in range(2, 63)]
    + [2**i + 1 for i in range(2, 62)]
    + [10**i for i in range(1, 18)]
    + [9007199254740993, 2**63 - 1, 123456789012345, 999999937]
)

X_SWEEP = [i / 7.3 - 85.0 for i in range(1241)] + [0.0, -0.0, 1e-9, -1e-9, 80.0, -80.0, 84.9, -84.9]


def _bits(v: float) -> bytes:
    return struct.pack("<d", v)


def _duck(sql: str, rows, decl: str):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT unnest(?) AS {decl}", [rows])
    return [r[0] for r in con.execute(f"SELECT {sql} FROM t ORDER BY {decl}").fetchall()]


def test_pinned_literals():
    # the literals ARE the semantics; a repr change is a contract change
    # e-notation forces DOUBLE parsing in both engines (bare decimal
    # literals are DECIMAL in DuckDB, with different promotion rules)
    assert LN2 == "0.6931471805599453e0"
    assert LOG2E == "1.4426950408889634e0"


def test_pln_bit_identical_across_engines(spark):
    from pyspark.sql import functions as F

    duck = _duck(pln("k"), K_SWEEP, "k")
    sdf = (
        spark.createDataFrame([(k,) for k in K_SWEEP], "k long")
        .select("k", F.expr(pln("k")).alias("v"))
        .orderBy("k")
    )
    sv = [r.v for r in sdf.collect()]
    assert len(duck) == len(sv) == len(K_SWEEP)
    bad = [(k, d, s) for k, d, s in zip(sorted(K_SWEEP), duck, sv) if _bits(d) != _bits(s)]
    assert not bad, bad[:5]


def test_pln_accuracy_vs_libm():
    duck = _duck(pln("k"), K_SWEEP, "k")
    err = max(abs(v - math.log(k)) for k, v in zip(sorted(K_SWEEP), duck))
    assert err < 5e-10, err


def test_pexp_bit_identical_across_engines(spark):
    from pyspark.sql import functions as F

    duck = _duck(pexp("x"), X_SWEEP, "x")
    sdf = (
        spark.createDataFrame([(x,) for x in X_SWEEP], "x double")
        .select("x", F.expr(pexp("x")).alias("v"))
        .orderBy("x")
    )
    sv = [r.v for r in sdf.collect()]
    bad = [(x, d, s) for x, d, s in zip(sorted(X_SWEEP), duck, sv) if _bits(d) != _bits(s)]
    assert not bad, bad[:5]


def test_pexp_accuracy_vs_libm():
    duck = _duck(pexp("x"), X_SWEEP, "x")
    err = max(
        abs(v - math.exp(x)) / max(math.exp(x), 1e-300)
        for x, v in zip(sorted(X_SWEEP), duck)
    )
    assert err < 1e-12, err


def test_pexp_out_of_domain_is_an_oracle_error_not_saturation():
    """|x| > ~86 pushes |b| = |n - a| past 62, where the engines
    DIVERGE on BIGINT <<: DuckDB raises Out of Range while the JVM
    wraps the shift mod 64. This pins the failure mode so nobody
    'fixes' a driver red by widening a call site's domain: an
    out-of-range pexp input means the ORACLE ERRORS — the cure is
    bounding the input (see the call-site proofs in portable.py),
    never relying on shared saturation."""
    import duckdb

    con = duckdb.connect()
    with pytest.raises(duckdb.OutOfRangeException):
        con.execute(f"SELECT {pexp('x')} FROM (SELECT -700.0e0 AS x) t").fetchone()


def test_pexp_call_site_inputs_are_bounded():
    """The two registry call sites' worst-case |x|, re-derived from the
    pinned constants — if someone widens a window or half-life, this
    recomputes the proof."""
    from duckdb_httpd_log_spark.operators.analytics import (
        DECAY_WINDOW_US,
        _DECAY_RATE,
    )

    # dlit strings ('3.2e-11', '0.69...e0') are valid float syntax
    worst_decay = DECAY_WINDOW_US * float(_DECAY_RATE)
    assert worst_decay < 85.0, worst_decay
    # text_lm_score: |x| = |avg per-bigram ln(c_ab/c_w)| <= ln(total
    # corpus tokens); even a 1e15-token corpus keeps it under 35
    assert math.log(1e15) < 85.0


def test_pln_ratio_is_difference_of_plns():
    import duckdb

    con = duckdb.connect()
    got = con.execute(f"SELECT {pln_ratio('7', '3')}, {pln('7')} - {pln('3')}").fetchone()
    assert _bits(got[0]) == _bits(got[1])
    assert abs(got[0] - math.log(7 / 3)) < 1e-9


def test_quantized_entropy_term_bit_identical(spark):
    """End-to-end shape of the entropy family: floor(c*pln(c)*1e6 + 0.5)
    must be the SAME INTEGER on both engines for every plausible count."""
    from pyspark.sql import functions as F

    ks = list(range(1, 5000))
    form = f"CAST(floor(CAST(k AS DOUBLE) * {pln('k')} * 1000000.0 + 0.5) AS BIGINT)"
    duck = _duck(form, ks, "k")
    sv = [
        r.v
        for r in spark.createDataFrame([(k,) for k in ks], "k long")
        .select("k", F.expr(form).alias("v"))
        .orderBy("k")
        .collect()
    ]
    assert duck == sv


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
