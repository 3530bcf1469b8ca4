"""timewin helpers: value-identity against the naive per-key window,
including the exact failure modes the slice decomposition must handle —
rows on slice boundaries, keys sparse enough that whole slices are
empty (the hand-off must skip them), and duplicate timestamps."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from duckdb_httpd_log_spark.operators.timewin import (
    sliced_range_frame,
    with_next_us,
)

SLICE = 1000  # tiny slices so a ~100-row fixture spans many of them


def _events(spark):
    rows = []
    # dense key: every ~37 us, crosses many slice boundaries, incl. ties
    for i in range(120):
        rows.append(("dense", i, (i * 37) % 4000))
    # boundary key: rows exactly ON slice edges
    for i, us in enumerate((0, 999, 1000, 1001, 2000, 3000)):
        rows.append(("edge", 200 + i, us))
    # sparse key: slices 0 and 4 only — the hand-off must skip 3 empty
    # slices to find the successor
    rows.append(("sparse", 300, 10))
    rows.append(("sparse", 301, 4500))
    # duplicate timestamps (tie-broken by id)
    rows.append(("ties", 400, 500))
    rows.append(("ties", 401, 500))
    rows.append(("ties", 402, 500))
    return spark.createDataFrame(rows, "k string, id long, us long")


def test_with_next_us_matches_naive_lead(spark):
    df = _events(spark)
    got = {
        r.id: r.next_us
        for r in with_next_us(df, ["k"], "us", "id", slice_us=SLICE).collect()
    }
    w = Window.partitionBy("k").orderBy("us", "id")
    exp = {
        r.id: r.next_us
        for r in df.select("id", F.lead("us").over(w).alias("next_us")).collect()
    }
    assert got == exp


def test_sliced_range_frame_matches_naive_range(spark):
    df = _events(spark).withColumn("v", (F.col("id") % 7).cast("long"))
    look = 800
    aug = sliced_range_frame(df, "us", lookback_us=look, slice_us=SLICE)
    wr = (
        Window.partitionBy("k", "__slice")
        .orderBy("us")
        .rangeBetween(-look, Window.currentRow)
    )
    got = {
        r.id: (r.n, r.s)
        for r in aug.select(
            "id",
            "__ctx",
            F.count(F.lit(1)).over(wr).alias("n"),
            F.sum("v").over(wr).alias("s"),
        )
        .filter(~F.col("__ctx"))
        .collect()
    }
    wn = Window.partitionBy("k").orderBy("us").rangeBetween(-look, Window.currentRow)
    exp = {
        r.id: (r.n, r.s)
        for r in df.select(
            "id",
            F.count(F.lit(1)).over(wn).alias("n"),
            F.sum("v").over(wn).alias("s"),
        ).collect()
    }
    assert got == exp


def test_context_fraction_is_bounded(spark):
    # the replication cost is lookback/slice of the input, not a blowup
    df = _events(spark)
    aug = sliced_range_frame(df, "us", lookback_us=100, slice_us=1000)
    n, nctx = df.count(), aug.filter(F.col("__ctx")).count()
    assert nctx <= n  # trivial upper bound
    # ~10% expected for the uniform dense key; allow generous slack
    assert nctx <= 0.35 * n


def test_randomized_next_us_sweep(spark):
    """Seeded random corpora: arbitrary key sparsity, duplicate
    timestamps, slice-boundary collisions — the hand-built fixture
    can't enumerate these."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        rows = [
            (f"k{rng.randrange(5)}", i, rng.randrange(0, 8000))
            for i in range(rng.randrange(50, 400))
        ]
        df = spark.createDataFrame(rows, "k string, id long, us long")
        got = {
            r.id: r.next_us
            for r in with_next_us(df, ["k"], "us", "id", slice_us=SLICE).collect()
        }
        w = Window.partitionBy("k").orderBy("us", "id")
        exp = {
            r.id: r.next_us
            for r in df.select("id", F.lead("us").over(w).alias("next_us")).collect()
        }
        assert got == exp, f"seed={seed}"


def test_randomized_range_frame_sweep(spark):
    import random

    for seed in (3, 11):
        rng = random.Random(seed)
        rows = [
            (f"k{rng.randrange(3)}", i, rng.randrange(0, 6000), rng.randrange(100))
            for i in range(rng.randrange(80, 300))
        ]
        df = spark.createDataFrame(rows, "k string, id long, us long, v long")
        look = rng.choice((250, 999, 1000))
        aug = sliced_range_frame(df, "us", lookback_us=look, slice_us=1000)
        wr = (
            Window.partitionBy("k", "__slice")
            .orderBy("us")
            .rangeBetween(-look, Window.currentRow)
        )
        got = {
            r.id: (r.n, r.s)
            for r in aug.select(
                "id", "__ctx",
                F.count(F.lit(1)).over(wr).alias("n"),
                F.sum("v").over(wr).alias("s"),
            ).filter(~F.col("__ctx")).collect()
        }
        wn = (
            Window.partitionBy("k").orderBy("us").rangeBetween(-look, Window.currentRow)
        )
        exp = {
            r.id: (r.n, r.s)
            for r in df.select(
                "id",
                F.count(F.lit(1)).over(wn).alias("n"),
                F.sum("v").over(wn).alias("s"),
            ).collect()
        }
        assert got == exp, f"seed={seed} look={look}"


def test_with_next_us_null_key_matches_naive(spark):
    """r9 ADVICE: NULL keys must get their true successor through the
    hand-off join (eqNullSafe) — the naive per-key window keeps NULL as
    a regular partition."""
    rows = [((None if i % 3 == 0 else "k"), i, (i * 137) % 3500) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, id long, us long")
    got = {
        r.id: r.next_us
        for r in with_next_us(df, ["k"], "us", "id", slice_us=SLICE).collect()
    }
    w = Window.partitionBy("k").orderBy("us", "id")
    exp = {
        r.id: r.next_us
        for r in df.select("id", F.lead("us").over(w).alias("next_us")).collect()
    }
    assert got == exp


def test_sliced_range_frame_negative_epoch(spark):
    """r9 ADVICE: pre-1970 (negative) epoch-µs — Spark's % keeps the
    dividend's sign, so the old trunc-div form mis-assigned slice ids
    and never replicated boundary context rows below zero. pmod/floor
    restores exactness."""
    rows = [("k", i, us) for i, us in enumerate(range(-2500, 2500, 137))]
    rows += [("k", 100, -1000), ("k", 101, -1), ("k", 102, 0), ("k", 103, -2000)]
    df = spark.createDataFrame(rows, "k string, id long, us long").withColumn(
        "v", (F.col("id") % 7).cast("long")
    )
    look = 800
    aug = sliced_range_frame(df, "us", lookback_us=look, slice_us=SLICE)
    wr = (
        Window.partitionBy("k", "__slice")
        .orderBy("us")
        .rangeBetween(-look, Window.currentRow)
    )
    got = {
        r.id: (r.n, r.s)
        for r in aug.select(
            "id",
            "__ctx",
            F.count(F.lit(1)).over(wr).alias("n"),
            F.sum("v").over(wr).alias("s"),
        )
        .filter(~F.col("__ctx"))
        .collect()
    }
    wn = Window.partitionBy("k").orderBy("us").rangeBetween(-look, Window.currentRow)
    exp = {
        r.id: (r.n, r.s)
        for r in df.select(
            "id",
            F.count(F.lit(1)).over(wn).alias("n"),
            F.sum("v").over(wn).alias("s"),
        ).collect()
    }
    assert got == exp


def test_adaptive_dispatch_small_known_input_uses_naive(spark, tmp_path):
    """r10: parquet-backed input far under the size threshold takes the
    plain per-key window (no slice machinery); forcing the conf to 0
    re-enables the sliced path, values identical."""
    p = str(tmp_path / "ev.parquet")
    _events(spark).write.parquet(p)
    df = spark.read.parquet(p)
    out = with_next_us(df, ["k"], "us", "id", slice_us=SLICE)
    assert "__next_slice_first" not in out._jdf.queryExecution().analyzed().toString()
    spark.conf.set("spark.graft.timewin.naiveMaxBytes", "0")
    try:
        forced = with_next_us(df, ["k"], "us", "id", slice_us=SLICE)
        assert "__next_slice_first" in forced._jdf.queryExecution().analyzed().toString()
        a = sorted((r.id, r.next_us) for r in out.collect())
        b = sorted((r.id, r.next_us) for r in forced.collect())
        assert a == b
        # sliced_range_frame: naive form is the single all-covering slice
        aug = sliced_range_frame(df, "us", lookback_us=500, slice_us=1000)
        assert "__ctx" in aug.columns
    finally:
        spark.conf.unset("spark.graft.timewin.naiveMaxBytes")
    naive_aug = sliced_range_frame(df, "us", lookback_us=500, slice_us=1000)
    assert naive_aug.filter("__ctx").count() == 0  # no context copies
    assert naive_aug.select("__slice").distinct().count() == 1
