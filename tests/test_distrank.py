"""distrank must be bit-identical to the single-task global window it
replaces — rank, total, and cumulative sum — including desc orders,
duplicate keys, and inputs smaller than the partition count."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_httpd_log_spark.operators.distrank import ntile_expr, with_global_rank


def _check(spark, rows, desc=False):
    df = spark.createDataFrame(rows, "k long, v long")
    # helper takes (col, asc) tuples for desc; the naive window takes
    # the equivalent SortOrder columns
    if desc:
        order = [(F.col("v"), False), F.col("k")]
        worder = [F.col("v").desc(), F.col("k")]
    else:
        order = worder = [F.col("v"), F.col("k")]
    got = {
        r.k: (r.rn, r.n, r.cum)
        for r in with_global_rank(
            spark, df, order, rn_col="rn", n_col="n", cum_col="cum", cum_src="v"
        ).collect()
    }
    w = Window.orderBy(*worder)
    exp = {
        r.k: (r.rn, r.n, r.cum)
        for r in df.select(
            "k",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
        ).collect()
    }
    assert got == exp


def test_matches_global_window_asc(spark):
    rows = [(i, (i * 37) % 11) for i in range(200)]  # duplicate v values
    _check(spark, rows)


def test_matches_global_window_desc(spark):
    rows = [(i, (i * 17) % 7) for i in range(150)]
    _check(spark, rows, desc=True)


def test_tiny_input_fewer_rows_than_partitions(spark):
    _check(spark, [(1, 5), (2, 3), (3, 3)])


@pytest.mark.parametrize("n,k", [(1, 5), (4, 5), (5, 5), (7, 5), (100, 3), (101, 3)])
def test_ntile_formula_matches_builtin(spark, n, k):
    df = spark.createDataFrame([(i,) for i in range(n)], "i long")
    w = Window.orderBy("i")
    ranked = df.select(
        F.ntile(k).over(w).alias("builtin"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    both = ranked.withColumn("formula", ntile_expr("rn", "n", k)).collect()
    for r in both:
        assert r.builtin == r.formula, (n, k, r.rn)


# --- grouped variant -------------------------------------------------------

from duckdb_httpd_log_spark.operators.distrank import with_grouped_rank


def _check_grouped(spark, rows, keys=("g",), desc=False):
    df = spark.createDataFrame(rows, "g string, k long, v long")
    if desc:
        order = [(F.col("v"), False), F.col("k")]
        worder = [F.col("v").desc(), F.col("k")]
    else:
        order = worder = [F.col("v"), F.col("k")]
    got = {
        r.k: (r.rn, r.n, r.cum)
        for r in with_grouped_rank(
            spark, df, list(keys), order, rn_col="rn", n_col="n",
            cum_col="cum", cum_src="v",
        ).collect()
    }
    w = Window.partitionBy(*keys).orderBy(*worder)
    exp = {
        r.k: (r.rn, r.n, r.cum)
        for r in df.select(
            "k",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy(*keys)).alias("n"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("cum"),
        ).collect()
    }
    assert got == exp


def test_grouped_matches_window_asc(spark):
    # 3 skewed groups over 300 rows: one group holds ~80% of the input,
    # the exact shape the naive partitionBy window funnels into one task
    rows = [(("a" if i % 10 < 8 else "b" if i % 10 == 8 else "c"), i, (i * 37) % 11)
            for i in range(300)]
    _check_grouped(spark, rows)


def test_grouped_matches_window_desc(spark):
    rows = [(("x" if i % 3 else "y"), i, (i * 17) % 7) for i in range(150)]
    _check_grouped(spark, rows, desc=True)


def test_grouped_single_group_equals_global(spark):
    # degenerate single group == the global helper's contract
    rows = [("only", i, (i * 13) % 5) for i in range(80)]
    _check_grouped(spark, rows)


def test_grouped_tiny_groups(spark):
    rows = [("a", 1, 5), ("b", 2, 3), ("c", 3, 3), ("a", 4, 3)]
    _check_grouped(spark, rows)


def test_randomized_grouped_rank_sweep(spark):
    """Seeded random groups: skew, singleton groups, heavy ties —
    compared to the naive grouped window per seed."""
    import random

    for seed in (2, 9, 31):
        rng = random.Random(seed)
        n_groups = rng.randrange(1, 8)
        rows = [
            (f"g{rng.randrange(n_groups)}", i, rng.randrange(0, 12))
            for i in range(rng.randrange(40, 500))
        ]
        _check_grouped(spark, rows, desc=bool(seed % 2))


def test_grouped_null_keys_match_window(spark):
    """r9 ADVICE: NULL group keys must survive the offsets join — the
    naive Window.partitionBy keeps NULL as a regular partition, so a
    non-null-safe name-list join would silently drop those rows."""
    rows = [
        ((None if i % 4 == 0 else f"g{i % 3}"), i, (i * 37) % 11)
        for i in range(120)
    ]
    _check_grouped(spark, rows)
    _check_grouped(spark, rows, desc=True)


def test_adaptive_dispatch_small_known_input_uses_naive(spark, tmp_path):
    """Parquet-backed input with known stats far under the threshold:
    the helper must emit the plain window plan (no offsets join)."""
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [("g", i, (i * 7) % 5) for i in range(100)], "g string, k long, v long"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = with_grouped_rank(spark, df, ["g"], [F.col("v"), F.col("k")])
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "__o_pid" not in plan  # naive window, not the two-phase scan
    # and it is value-identical to the two-phase path (forced via conf)
    old = spark.conf.get("spark.graft.distrank.naiveMaxBytes", None)
    spark.conf.set("spark.graft.distrank.naiveMaxBytes", "0")
    try:
        forced = with_grouped_rank(spark, df, ["g"], [F.col("v"), F.col("k")])
        assert "__o_pid" in forced._jdf.queryExecution().analyzed().toString()
        a = sorted((r.k, r.rn) for r in out.collect())
        b = sorted((r.k, r.rn) for r in forced.collect())
        assert a == b
    finally:
        if old is None:
            spark.conf.unset("spark.graft.distrank.naiveMaxBytes")
        else:
            spark.conf.set("spark.graft.distrank.naiveMaxBytes", old)


def test_unknown_stats_route_to_scale_path(spark):
    """createDataFrame inputs have no size estimate: the safe direction
    is the two-phase scan (it must never silently single-task a huge
    unknown input)."""
    df = spark.createDataFrame(
        [("g", i, i % 3) for i in range(50)], "g string, k long, v long"
    )
    out = with_grouped_rank(spark, df, ["g"], [F.col("v"), F.col("k")])
    assert "__o_pid" in out._jdf.queryExecution().analyzed().toString()


def test_two_phase_mixed_types_forced(spark):
    """Decimal, timestamp, and desc components through the FORCED
    two-phase path: pins the bound-literal round-trip (F.lit of
    Decimal/datetime) and composite monotonicity for non-long types —
    at sf0.01 the adaptive dispatch picks the naive window, so only
    this test and the rehearsals exercise these literals."""
    import datetime as dt
    from decimal import Decimal

    rows = [
        (
            f"g{i % 3}",
            i,
            Decimal(f"{(i * 37) % 50}.{i % 100:02d}"),
            dt.datetime(2024, 1 + (i % 12), 1 + (i % 28), i % 24, 0, 0),
        )
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "g string, k long, price decimal(10,2), ts timestamp")
    spark.conf.set("spark.graft.distrank.naiveMaxBytes", "0")
    try:
        got = {
            r.k: r.rn
            for r in with_grouped_rank(
                spark, df, ["g"],
                [(F.col("price"), False), F.col("ts"), F.col("k")],
            ).collect()
        }
    finally:
        spark.conf.unset("spark.graft.distrank.naiveMaxBytes")
    w = Window.partitionBy("g").orderBy(F.col("price").desc(), "ts", "k")
    exp = {
        r.k: r.rn
        for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == exp


@pytest.mark.parametrize("desc", [False, True])
def test_two_phase_nan_ordering_forced(spark, desc):
    """ADVICE r10: NaN in a double order column. Python NaN comparisons
    are all false, so _pick_bounds needs an explicit is-nan sort key to
    match Spark's NaN-greatest total order (without it the sample sort
    leaves real inversions and bounds skew bucket balance); _lex_after
    relies on Spark's NaN comparison semantics (NaN = NaN true,
    NaN > x true). Ranks stay exact even under mis-sorted bounds —
    _bucket_expr's monotonicity is structural (see its docstring) —
    so this pins the NaN *comparison* path end-to-end and the balanced
    key, asc and desc."""
    # reverse-ordered values with NaN every 3rd row: Python's broken
    # NaN comparisons leave real inversions among the NON-nan values
    # after a stable sort (transitivity breaks inside Timsort merges),
    # so a bad key picks non-monotone bounds here
    nan = float("nan")
    rows = []
    for i in range(300):
        if i % 3 == 0:
            v = nan
        elif i % 31 == 0:
            v = None
        else:
            v = float(300 - i)
        rows.append((i, v))
    df = spark.createDataFrame(rows, "k long, v double")
    order = [(F.col("v"), False), F.col("k")] if desc else [F.col("v"), F.col("k")]
    worder = [F.col("v").desc(), F.col("k")] if desc else [F.col("v"), F.col("k")]
    spark.conf.set("spark.graft.distrank.naiveMaxBytes", "0")
    try:
        got = {
            r.k: r.rn
            for r in with_global_rank(spark, df, order, rn_col="rn").collect()
        }
    finally:
        spark.conf.unset("spark.graft.distrank.naiveMaxBytes")
    w = Window.orderBy(*worder)
    exp = {
        r.k: r.rn
        for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == exp


def test_adaptive_dispatch_boundary_both_sides(spark, tmp_path):
    """r10 verdict item 6: pin the dispatch BOUNDARY. The same query
    runs just under (naive window) and just over (two-phase) the
    naiveMaxBytes threshold via the conf; outputs must be identical and
    each side must take its expected physical shape (__pid bucket
    projection only in the two-phase plan)."""
    from duckdb_httpd_log_spark.operators.distrank import _estimated_bytes

    p = str(tmp_path / "boundary.parquet")
    spark.createDataFrame(
        [(i, (i * 13) % 37) for i in range(500)], "k long, v long"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    est = _estimated_bytes(df)
    assert 0 < est < (1 << 62), "createDataFrame must have known stats"
    results = {}
    for label, thr in (("naive", est + 1), ("scale", max(est - 1, 0))):
        spark.conf.set("spark.graft.distrank.naiveMaxBytes", str(thr))
        try:
            out = with_global_rank(
                spark, df, [F.col("v"), F.col("k")], rn_col="rn"
            )
            plan = out._jdf.queryExecution().analyzed().toString()
            if label == "naive":
                assert "__pid" not in plan, "under threshold must stay naive"
            else:
                assert "__pid" in plan, "over threshold must go two-phase"
            results[label] = {r.k: r.rn for r in out.collect()}
        finally:
            spark.conf.unset("spark.graft.distrank.naiveMaxBytes")
    assert results["naive"] == results["scale"]


def test_materialize_opt_in_identical(spark):
    """materialize=True (expensive-lineage persist) must be value-
    identical to the default recompute path, forced two-phase."""
    df = spark.createDataFrame(
        [(i, (i * 7) % 13) for i in range(300)], "k long, v long"
    )
    spark.conf.set("spark.graft.distrank.naiveMaxBytes", "0")
    try:
        a = {
            r.k: r.rn
            for r in with_global_rank(
                spark, df, [F.col("v"), F.col("k")], rn_col="rn"
            ).collect()
        }
        b = {
            r.k: r.rn
            for r in with_global_rank(
                spark, df, [F.col("v"), F.col("k")], rn_col="rn",
                materialize=True,
            ).collect()
        }
        g = {
            r.k: r.rn
            for r in with_grouped_rank(
                spark, df.withColumn("g", F.col("k") % 3), ["g"],
                [F.col("v"), F.col("k")], rn_col="rn", materialize=True,
            ).collect()
        }
    finally:
        spark.conf.unset("spark.graft.distrank.naiveMaxBytes")
    assert a == b and len(g) == 300
