"""CI guard: no engine-sensitive round() may reach a hashed surface.

Every red CORRECTNESS row across rounds 1-4 was the same disease:
``round(x, k)`` on a DOUBLE resolves boundary decimals differently
across engine builds (Spark = exact-BigDecimal HALF_UP; DuckDB builds =
float multiply + whatever the local libm/sprintf does), so any query
emitting it is a coin-flip against the driver's oracle that cannot be
reproduced locally. The portable form is floor(x*10^k + 0.5)/10^k —
floor plus IEEE-754 basic ops, all correctly rounded by spec, hence
bit-identical everywhere (registry.fround on the Spark side).

This test turns that discipline from tribal knowledge into CI:

1. every registered oracle SQL string must be free of ``round(``;
2. the operator sources must not call ``F.round`` / ``pyspark round``
   (use ``fround``), nor embed ``round(`` in F.expr SQL strings;
3. ``fround`` itself must agree with the literal SQL floor form on
   both engines, including the negative-tie direction.

Genuinely-safe uses (round on DECIMAL/INTEGER arguments) would go on
ALLOWLIST with a justification — currently none are needed.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY

from .conftest import SF_DIR

OPS_DIR = Path(__file__).resolve().parent.parent / "duckdb_httpd_log_spark" / "operators"

# name -> reason; entries here are exempt from the oracle-SQL scan
ALLOWLIST: dict[str, str] = {}

_ROUND = re.compile(r"(?<![\w.])round\s*\(", re.IGNORECASE)


def test_no_round_in_oracle_sql():
    bad = [
        name
        for name, qd in REGISTRY.items()
        if qd.oracle_sql and name not in ALLOWLIST and _ROUND.search(qd.oracle_sql)
    ]
    assert not bad, (
        f"naked round( in oracle SQL of {bad}: use the floor(x*10^k + 0.5)/10^k "
        f"form (see plans/registry.py docstring) or add an ALLOWLIST entry"
    )


def _code_and_string_segments(text: str):
    """(kind, segment) pairs; comments dropped. Mirrors tools/roundproof.py."""
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "#":
            j = text.find("\n", i)
            j = n if j == -1 else j
            i = j
        elif c in "\"'":
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
            yield "string", text[i:j]
            i = j
        else:
            j = i
            while j < n and text[j] not in "#\"'":
                j += 1
            yield "code", text[i:j]
            i = j


def test_no_round_in_operator_sources():
    offenders = []
    for path in sorted(OPS_DIR.glob("*.py")):
        for kind, seg in _code_and_string_segments(path.read_text()):
            if kind == "code" and ("F.round(" in seg or re.search(r"(?<![\w.])round\s*\(", seg)):
                offenders.append(f"{path.name}: code round() call")
            elif kind == "string" and _ROUND.search(seg):
                offenders.append(f"{path.name}: round( in string {seg[:60]!r}")
    assert not offenders, offenders


def test_fround_matches_sql_floor_form(spark):
    import duckdb

    from pyspark.sql import functions as F
    from duckdb_httpd_log_spark.plans.registry import fround

    # boundary-heavy values: exact ties, negative ties, ratio boundaries
    vals = [0.12345, 0.12335, -0.12345, 2.5, -2.5, 0.00005, -0.00005,
            1.0 / 3.0, 2.0 / 3.0, 0.15, 2.675, -2.675, 123456.789]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double").select(
        fround(F.col("x"), 4).alias("r4"), fround(F.col("x")).alias("r0")
    )
    srows = [(r.r4, r.r0) for r in sdf.orderBy("r4").collect()]
    con = duckdb.connect()
    orows = con.execute(
        "SELECT floor((x) * 10000.0 + 0.5) / 10000.0 AS r4, floor((x) + 0.5) AS r0 "
        "FROM (SELECT unnest(?) AS x) ORDER BY r4",
        [vals],
    ).fetchall()
    assert srows == [(a, b) for a, b in orows]


# --- libm guard (round 6) ---------------------------------------------------
# CORRECTNESS_r05 proved floor-form quantization is not enough when the
# quantized INPUT comes from libm: ln/exp are not correctly rounded, so
# the driver's engine build can differ by an ulp and flip a boundary.
# Every transcendental on a hashed surface must go through the pinned
# polynomial forms in plans/portable.py (pln/pexp — basic IEEE ops
# only, bit-identical across engines). This scan bans the libm
# functions outright in oracle SQL and in operator source code.
# (sqrt is correctly rounded BY SPEC — the cosine family keeps it.)

_LIBM_SQL = re.compile(r"(?<![\w.])(ln|log|log2|log10|log1p|log1{0,2}p?|exp|expm1|pow|power)\s*\(", re.IGNORECASE)
# Spark-side: F.log/F.exp/F.pow and their expr-string spellings.
# F.expr( / F.explode( must NOT trip the scan, hence the word boundary.
_LIBM_PY = re.compile(r"F\.(log|log2|log10|log1p|exp|expm1|pow|power)\(")


def test_no_libm_in_oracle_sql():
    bad = [
        name
        for name, qd in REGISTRY.items()
        if qd.oracle_sql and name not in ALLOWLIST and _LIBM_SQL.search(qd.oracle_sql)
    ]
    assert not bad, (
        f"libm transcendental in oracle SQL of {bad}: use plans/portable.py "
        f"pln/pexp (pinned polynomial, bit-identical across engines)"
    )


_SQLISH = re.compile(r"SELECT\s|floor\s*\(|CAST\s*\(", re.IGNORECASE)


def test_no_libm_in_operator_sources():
    """Code must not call F.log/F.exp/F.pow; SQL-bearing strings (the
    oracle SQL and F.expr snippets — identified by SELECT/floor/CAST
    markers) must not embed libm calls. Docstring PROSE mentioning
    ln(p/q) is exempt via the SQL-marker requirement."""
    offenders = []
    for path in sorted(OPS_DIR.glob("*.py")):
        for kind, seg in _code_and_string_segments(path.read_text()):
            if kind == "code" and _LIBM_PY.search(seg):
                offenders.append(f"{path.name}: {_LIBM_PY.search(seg).group(0)}")
            elif kind == "string" and _SQLISH.search(seg) and _LIBM_SQL.search(seg):
                offenders.append(
                    f"{path.name}: libm {_LIBM_SQL.search(seg).group(0)!r} in string {seg[:60]!r}"
                )
    assert not offenders, offenders


def test_no_complex_types_in_output_contract(spark):
    """The driver canonicalizes results through pandas sort_values,
    which throws `unhashable type: 'list'` on array/map/struct cells
    (q50_array_agg crashed the r5 harness). Every registry query must
    emit scalar columns only. Schema-analysis only — no jobs run for
    the overwhelming majority (a few queries fetch a driver-side
    scalar at plan-build time, which is why this uses sf0.001)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = []
    for name, qd in REGISTRY.items():
        df = qd.spark_fn(spark, SF_DIR)
        for fld in df.schema.fields:
            if isinstance(fld.dataType, (ArrayType, MapType, StructType)):
                bad.append(f"{name}.{fld.name}: {fld.dataType.simpleString()}")
    assert not bad, (
        f"complex output types break the driver canonicalizer: {bad}; "
        f"project arrays to scalar columns or concat_ws strings"
    )


# DuckDB type -> pandas-kind for the driver's .df() canonicalization.
# Types NOT in this map are banned from oracle output schemas outright:
# HUGEINT/UHUGEINT (integer sum() results!) and DECIMAL land in pandas
# as float64/object, FLOAT/REAL as float32 — none of which hash equal
# to the int64/float64 Spark's toPandas() produces for the same values.
_DUCK_KIND = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
}


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "float"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "ts"
    # FloatType (float32 repr drift) and DecimalType (pandas object)
    # are deliberately unmapped -> banned
    return f"BANNED:{dt.simpleString()}"


def test_pandas_dtype_parity_contract(spark):
    """The CORRECTNESS_r06 root cause, turned into CI: the driver
    hashes results after pandas conversion, and DuckDB's .df() maps
    HUGEINT — the result type of any uncast integer sum() — to
    float64 while Spark stays int64, so `5` hashes as `5.0` on the
    oracle side and the row goes red even though fetchall()-level
    comparison is bit-exact (tools/dtype_audit.py reproduced the
    exact 8-query red set of CORRECTNESS_r06 from this alone). Every
    oracle output column must bind (DuckDB DESCRIBE — no execution)
    to a type whose pandas kind equals the Spark column's kind;
    int-width differences are allowed (int32 `5` and int64 `5`
    canonicalize identically — orders_seasonality_index was driver-
    green with an int32/int64 split), int-vs-float never is."""
    import duckdb

    sf_dir = SF_DIR
    con = duckdb.connect()
    from duckdb_httpd_log_spark.plans.registry import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, qd in REGISTRY.items():
        if qd.oracle_sql is None:
            continue
        sdf = qd.spark_fn(spark, sf_dir)
        skinds = {f.name.lower(): _spark_kind(f.dataType) for f in sdf.schema.fields}
        for col, typ, *_ in con.execute(f"DESCRIBE {qd.oracle_sql}").fetchall():
            okind = _DUCK_KIND.get(typ.split("(")[0])
            skind = skinds.get(col.lower())
            if okind is None:
                bad.append(f"{name}.{col}: oracle type {typ} (pandas-unsafe)")
            elif skind != okind:
                bad.append(f"{name}.{col}: spark {skind} vs oracle {okind} ({typ})")
    assert not bad, (
        "pandas-dtype parity violations (driver hash will flip red): "
        + "; ".join(bad)
    )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
