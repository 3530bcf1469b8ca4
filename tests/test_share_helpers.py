"""share_expr / share_sql contract: the one round-half-up share form
every *_e4/_e6 registry column goes through (r8 ADVICE, q70).

Three properties, each proven against DuckDB running the share_sql
fragment on the same inputs:

1. parity on ordinary values — the widened DECIMAL(38,0) form is
   value-identical to the old BIGINT form wherever that form didn't
   wrap;
2. overflow headroom — at numerators past the int64 wrap point
   (num * 20000 > 2^63, i.e. num > ~4.6e14: windowed revenue cents
   near TPC-H sf600) the narrow form wraps silently under non-ANSI
   Spark while the widened form stays exact and still matches
   DuckDB's HUGEINT arithmetic;
3. zero guard — a zero denominator yields NULL on BOTH surfaces
   (DuckDB's bare `//` would raise where Spark's div yields NULL:
   the error-vs-NULL surface divergence the guard removes).
"""

import duckdb
import pytest

from duckdb_httpd_log_spark.plans.registry import share_expr, share_sql


CASES = [
    # (num, den, scale) — ordinary, tie-boundary, and huge values
    (0, 1, 4),
    (1, 3, 4),
    (1, 2, 4),  # exact .5 tie at e4: round-half-up -> 5000
    (625, 10000, 4),
    (4_600_000_000_000_000, 9_200_000_000_000_000, 4),
    # past the int64 wrap point of num * 20000:
    (9_000_000_000_000_000_000, 9_200_000_000_000_000_000, 4),
    (5_000_000_000_000_000_000, 9_000_000_000_000_000_000, 6),
    (7, 7, 6),
]


def _duck(num, den, scale):
    frag = share_sql("num", "den", scale)
    return duckdb.sql(
        f"SELECT {frag} AS s FROM (SELECT CAST({num} AS BIGINT) AS num,"
        f" CAST({den} AS BIGINT) AS den)"
    ).fetchone()[0]


@pytest.mark.parametrize("num,den,scale", CASES)
def test_share_parity_and_headroom(spark, num, den, scale):
    sdf = spark.createDataFrame([(num, den)], "num long, den long").select(
        share_expr("num", "den", scale).alias("s")
    )
    got = sdf.collect()[0].s
    want = _duck(num, den, scale)
    # ground truth: exact rational round-half-up in Python ints
    exact = (num * 2 * 10**scale + den) // (2 * den)
    assert got == want == exact
    assert sdf.schema["s"].dataType.simpleString() == "bigint"


def test_share_zero_denominator_is_null_both_sides(spark):
    got = (
        spark.createDataFrame([(5, 0)], "num long, den long")
        .select(share_expr("num", "den").alias("s"))
        .collect()[0]
        .s
    )
    assert got is None
    assert _duck(5, 0, 4) is None


def test_narrow_form_would_wrap(spark):
    """Documents WHY the widening exists: the pre-r9 BIGINT form gives a
    wrapped (negative) share on the same input the widened form gets
    right. If Spark's non-ANSI long arithmetic ever stops wrapping,
    this pin tells us the guard became redundant."""
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        num, den = 9_000_000_000_000_000_000, 9_200_000_000_000_000_000
        import pyspark.sql.functions as F

        narrow = (
            spark.createDataFrame([(num, den)], "num long, den long")
            .select(F.expr("(num * 20000 + den) div (2 * den)").alias("s"))
            .collect()[0]
            .s
        )
        exact = (num * 20000 + den) // (2 * den)
        assert narrow != exact  # the wrap the widened form prevents
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
