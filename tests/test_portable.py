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


def test_pexp_out_of_domain_is_null_on_both_engines(spark):
    """|x| > ~86 pushes |b| = |n - a| past 62, where the engines would
    DIVERGE on BIGINT << (DuckDB raises Out of Range, the JVM wraps
    the shift mod 64) — so pexp now emits its own abs(x) > 85 guard
    (r6 ADVICE): out-of-domain inputs produce NULL on BOTH engines
    (double 0.0/0.0 is NULL in DuckDB and non-ANSI Spark alike)
    instead of an engine-dependent error/garbage split. Call-site
    bound proofs remain the first line of defense; this pins the
    identical degraded behavior behind them."""
    import duckdb
    from pyspark.sql import functions as F

    con = duckdb.connect()
    for x in ("-700.0e0", "86.0e0", "700.0e0"):
        row = con.execute(f"SELECT {pexp('x')} FROM (SELECT {x} AS x) t").fetchone()
        assert row[0] is None, (x, row)
    sdf = spark.createDataFrame([(-700.0,), (86.0,), (700.0,)], "x double").select(
        F.expr(pexp("x")).alias("v")
    )
    assert [r.v for r in sdf.collect()] == [None, None, None]
    # in-domain boundary stays live on both engines
    assert con.execute(f"SELECT {pexp('x')} FROM (SELECT 85.0e0 AS x) t").fetchone()[0] is not None


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


def test_pln_stages_bit_identical(spark):
    """The staged-column form (pln_stages) must produce the exact bit
    pattern of the macro form (pln) on BOTH engines — it is the same
    arithmetic DAG computed through named intermediates, so any
    difference is a transcription bug in one of the two forms."""
    import duckdb
    from pyspark.sql import functions as F

    from duckdb_httpd_log_spark.plans.portable import pln_stages, stage_subselects

    stages, val = pln_stages("k", "p")

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS k", [K_SWEEP])
    staged_sql = stage_subselects("SELECT k FROM t", stages)
    duck_staged = [
        r[0]
        for r in con.execute(
            f"SELECT {val} FROM ({staged_sql}) ORDER BY k"
        ).fetchall()
    ]
    duck_macro = _duck(pln("k"), K_SWEEP, "k")

    sdf = spark.createDataFrame([(k,) for k in K_SWEEP], "k long")
    for col, sql in stages:
        sdf = sdf.withColumn(col, F.expr(sql))
    spark_staged = [r.v for r in sdf.select("k", F.col(val).alias("v")).orderBy("k").collect()]

    assert len(duck_staged) == len(duck_macro) == len(spark_staged) == len(K_SWEEP)
    bad = [
        (k, dm, ds, ss)
        for k, dm, ds, ss in zip(sorted(K_SWEEP), duck_macro, duck_staged, spark_staged)
        if not (_bits(dm) == _bits(ds) == _bits(ss))
    ]
    assert not bad, bad[:5]


def test_with_stages_bit_identical(spark):
    """with_stages (one lateral-alias selectExpr) must produce the
    exact bit pattern of the .withColumn chain it replaced — Spark
    rewrites lateral column aliases into the same nested Projects, so
    any difference is a resolution bug, not arithmetic."""
    from pyspark.sql import functions as F

    from duckdb_httpd_log_spark.plans.portable import pln_stages, with_stages

    stages = []
    for arg, pfx in (("k", "pa"), ("(k + 7)", "pb")):
        stages.extend(pln_stages(arg, pfx)[0])

    base = spark.createDataFrame([(k,) for k in K_SWEEP], "k long")
    chained = base
    for col, sql in stages:
        chained = chained.withColumn(col, F.expr(sql))
    lateral = with_stages(base, stages)

    cols = ["k", "pa_ln", "pb_ln"]
    a = [tuple(r) for r in chained.select(*cols).orderBy("k").collect()]
    b = [tuple(r) for r in lateral.select(*cols).orderBy("k").collect()]
    assert len(a) == len(b) == len(K_SWEEP)
    bad = [
        (ra, rb)
        for ra, rb in zip(a, b)
        if any(_bits(x) != _bits(y) for x, y in zip(ra[1:], rb[1:]))
    ]
    assert not bad, bad[:5]
