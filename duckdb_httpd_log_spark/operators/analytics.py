"""Round-4 analytics batch: corpus statistics (Good-Turing, winnowing
fingerprints), behavioral analytics (bounce rate, per-user entropy,
funnel latency), distribution monitoring (PSI drift, higher moments),
and association rules.

The reference engine (``/root/reference/src/httpd_log_table_function.cpp``)
is a scan extension; everything here is host-surface analytics a 100 TB
training/ops pipeline runs downstream of that scan. Scale discipline is
the same as the sibling modules:

- hash aggregations on bounded key domains only; pair joins bounded by
  basket/window size, never all-pairs;
- order-dependent double SUMs are quantized per-row to scaled BIGINTs
  (integer SUM is commutative across engines), one final double
  division pinned with identical parenthesization in both engines;
- integer ratios that could land on a round() boundary go through the
  quantize-to-int-then-divide path (registry header rule);
- top-k output only under a total order (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register, table

# ---------------------------------------------------------------------------
# Good-Turing frequency-of-frequencies — the smoothing table every
# classic LM / vocabulary-health audit needs: N_r = how many distinct
# tokens occur exactly r times, the adjusted count r* = (r+1)N_{r+1}/N_r,
# and the probability mass held by count-r tokens. The corpus collapses
# to its vocabulary (one hash agg), then to the tiny r-histogram
# (second hash agg over ~10^2 distinct counts); the r+1 lookup is a
# self-join on that histogram — broadcast-sized at any corpus scale.
# Integer counts end-to-end; the two ratios are quantized int-first.
# ---------------------------------------------------------------------------
GT_TOP_R = 15


@register(
    "corpus_good_turing",
    f"""
    WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    tc AS (SELECT w, count(*) AS c FROM toks WHERE w <> '' GROUP BY w),
    fof AS (SELECT c AS r, count(*) AS n_r FROM tc GROUP BY c),
    tot AS (SELECT sum(c) AS n_tokens FROM tc)
    SELECT f.r, f.n_r,
           CAST(round(CAST(f.r * f.n_r AS DOUBLE) * 1000000.0 / t.n_tokens) AS BIGINT)
               / 1000000.0 AS mass,
           CAST(round(CAST((f.r + 1) * f2.n_r AS DOUBLE) * 1000000.0 / f.n_r) AS BIGINT)
               / 1000000.0 AS r_star
    FROM fof f
    LEFT JOIN fof f2 ON f2.r = f.r + 1, tot t
    ORDER BY f.r
    LIMIT {GT_TOP_R}
    """,
    "Good-Turing frequency-of-frequencies: N_r, probability mass, adjusted count r*",
)
def corpus_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    fof = tc.groupBy(F.col("c").alias("r")).agg(F.count(F.lit(1)).alias("n_r"))
    tot = tc.agg(F.sum("c").alias("n_tokens"))
    nxt = fof.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_next"))
    mass = (
        F.round(
            (F.col("r") * F.col("n_r")).cast("double")
            * F.lit(1000000.0)
            / F.col("n_tokens")
        ).cast("long")
        / F.lit(1000000.0)
    )
    r_star = (
        F.round(
            ((F.col("r") + 1) * F.col("n_next")).cast("double")
            * F.lit(1000000.0)
            / F.col("n_r")
        ).cast("long")
        / F.lit(1000000.0)
    )
    return (
        fof.join(nxt, "r", "left")
        .crossJoin(F.broadcast(tot))
        .select("r", "n_r", mass.alias("mass"), r_star.alias("r_star"))
        .orderBy("r")
        .limit(GT_TOP_R)
    )


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
# — the MOSS algorithm): hash every k-token shingle, slide a w-hash
# window, keep each window's minimum; the distinct kept hashes are the
# doc's fingerprint (guaranteed to catch any shared run >= w+k-1
# tokens). Shape: posexplode -> per-doc positional window min ->
# per-doc agg; partitions are doc-sized, no cross-doc shuffle beyond
# the doc_id hash. Hashes are 32-bit md5 prefixes so both engines
# derive identical values; the digest canonicalizes the set through a
# numeric sort before md5.
# ---------------------------------------------------------------------------
WINNOW_K = 3  # tokens per shingle
WINNOW_W = 4  # hashes per window


@register(
    "text_winnowing",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT doc_id, CAST(i AS INTEGER) AS pos,
               t[CAST(i AS INTEGER)] || ' ' || t[CAST(i + 1 AS INTEGER)] || ' '
                   || t[CAST(i + 2 AS INTEGER)] AS g
        FROM toks, LATERAL unnest(range(1, len(t) - {WINNOW_K - 2})) x(i)
        WHERE len(t) >= {WINNOW_K}
    ),
    hashed AS (
        SELECT doc_id, pos,
               ('0x' || substr(md5(g), 1, 8))::BIGINT AS h
        FROM grams
    ),
    wm AS (
        SELECT doc_id,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS mh
        FROM hashed
    ),
    fp AS (SELECT doc_id, mh FROM wm GROUP BY doc_id, mh),
    agg AS (
        SELECT doc_id, count(*) AS n_fp,
               md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY mh)) AS fp_digest
        FROM fp GROUP BY doc_id
    ),
    ng AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id)
    SELECT a.doc_id, g.n_grams, a.n_fp, a.fp_digest
    FROM agg a JOIN ng g USING (doc_id)
    ORDER BY a.doc_id
    """,
    "winnowing fingerprints (MOSS): window-min of shingle hashes, per-doc digest",
)
def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).filter(
        F.size("t") >= WINNOW_K
    )
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(t) - {WINNOW_K}),"
                " i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2]))"
            )
        ).alias("pos", "g"),
    )
    h = F.conv(F.substring(F.md5(F.col("g").cast("binary")), 1, 8), 16, 10).cast("long")
    hashed = grams.select("doc_id", "pos", h.alias("h"))
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    wm = hashed.select("doc_id", F.min("h").over(w).alias("mh"))
    agg = wm.groupBy("doc_id").agg(
        F.count_distinct("mh").alias("n_fp"),
        F.md5(
            F.array_join(
                F.expr("transform(array_sort(collect_set(mh)), x -> cast(x AS string))"),
                ",",
            ).cast("binary")
        ).alias("fp_digest"),
    )
    ng = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        agg.join(ng, "doc_id")
        .select("doc_id", "n_grams", "n_fp", "fp_digest")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Daily bounce rate — the sessionization consumer every web-analytics
# stack ships: share of sessions (q15's 30-min gap rule, restated
# verbatim so the semantics cannot drift) that contain exactly one
# event, attributed to the session's start day. All windows partition
# by user_id; the daily rollup is a hash agg on ~10^3 day keys. The
# rate is an integer ratio -> quantize-then-divide.
# ---------------------------------------------------------------------------
_GAP_US = 30 * 60 * 1_000_000  # q15's SESSION_GAP_MIN, restated


@register(
    "events_bounce_rate",
    f"""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    ),
    marked AS (
        SELECT user_id, event_id, us,
               CASE WHEN prev_us IS NULL OR us - prev_us > {_GAP_US} THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    numbered AS (
        SELECT user_id, us,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM marked
    ),
    sess AS (
        SELECT user_id, session_idx, min(us) AS start_us, count(*) AS n_events
        FROM numbered GROUP BY user_id, session_idx
    )
    SELECT CAST(CAST(make_timestamp(start_us) AS DATE) AS VARCHAR) AS day,
           count(*) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           CAST(round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                      * 1000000.0 / count(*)) AS BIGINT) / 1000000.0 AS bounce_rate
    FROM sess
    GROUP BY 1
    ORDER BY 1
    """,
    "daily bounce rate: share of 30-min-gap sessions with exactly one event",
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    wlag = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn(
        "is_new",
        F.when(
            F.lag("us").over(wlag).isNull()
            | (F.col("us") - F.lag("us").over(wlag) > _GAP_US),
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_idx",
        F.sum("is_new").over(wlag.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sess = numbered.groupBy("user_id", "session_idx").agg(
        F.min("us").alias("start_us"), F.count(F.lit(1)).alias("n_events")
    )
    n_bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    daily = sess.groupBy(
        F.timestamp_micros("start_us").cast("date").cast("string").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        n_bounces.cast("long").alias("n_bounces"),
    )
    rate = (
        F.round(
            F.col("n_bounces").cast("double") * F.lit(1000000.0) / F.col("n_sessions")
        ).cast("long")
        / F.lit(1000000.0)
    )
    return daily.select(
        "day", "n_sessions", "n_bounces", rate.alias("bounce_rate")
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Per-user behavioral entropy — navigation diversity over the
# event-type distribution (bots/scripted users skew low; the top-k
# most-diverse users surface exploratory accounts). Same scaled-integer
# entropy canonicalization as text_token_entropy: the Sigma c*ln(c)
# term is an integer SUM of per-(user,type) quantized terms, one final
# double division. Top-k under a total order.
# ---------------------------------------------------------------------------
USER_ENTROPY_TOP = 100


@register(
    "events_user_entropy",
    f"""
    WITH tc AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY user_id, event_type
    ),
    agg AS (
        SELECT user_id, sum(c) AS n, count(*) AS n_types,
               sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000.0)
                        AS BIGINT)) AS s6
        FROM tc GROUP BY user_id
    )
    SELECT user_id, n AS n_events, n_types,
           round(ln(CAST(n AS DOUBLE)) - (CAST(s6 AS DOUBLE) / 1000000.0) / n, 4)
               AS type_entropy
    FROM agg
    ORDER BY type_entropy DESC, user_id
    LIMIT {USER_ENTROPY_TOP}
    """,
    "per-user event-type entropy (behavioral diversity), top-k most diverse",
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    tc = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    cd = F.col("c").cast("double")
    term6 = F.round(cd * F.log(cd) * F.lit(1000000.0)).cast("long")
    agg = tc.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(term6).alias("s6"),
    )
    entropy = F.log(F.col("n").cast("double")) - (
        F.col("s6").cast("double") / F.lit(1000000.0)
    ) / F.col("n")
    return (
        agg.select(
            "user_id",
            F.col("n").alias("n_events"),
            "n_types",
            F.round(entropy, 4).alias("type_entropy"),
        )
        .orderBy(F.col("type_entropy").desc(), "user_id")
        .limit(USER_ENTROPY_TOP)
    )


# ---------------------------------------------------------------------------
# Higher-moment profile (skewness, excess kurtosis) per event type —
# the distribution-shape monitor behind drift alarms. Parity-exact
# cross-engine: value is quantized to cents (exact at source: the
# generator emits 2-dp doubles), power sums accumulate in 128-bit
# integers (HUGEINT / decimal(38,0) — both exact, both cast to the
# same double at the end), and the moment formulas are pinned with
# identical parenthesization. Values are winsorized to ±1e6 so the
# 4th-power sum provably fits 128 bits ((1e8 cents)^4 = 1e32 < 2^127
# even x 10^6 rows/group) — a no-op on the generator's <=600 range,
# and the statistically standard guard for raw-moment estimators.
# One hash agg over 5 groups; no second pass.
# ---------------------------------------------------------------------------
MOMENT_CLAMP = 1_000_000.0


@register(
    "q51_moments",
    f"""
    WITH v AS (
        SELECT event_type,
               CAST(CAST(round(least(greatest(value, -{MOMENT_CLAMP}), {MOMENT_CLAMP})
                               * 100.0) AS BIGINT) AS HUGEINT) AS x
        FROM events
        WHERE value IS NOT NULL
    ),
    s AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(x) AS DOUBLE) AS s1,
               CAST(sum(x * x) AS DOUBLE) AS s2,
               CAST(sum(x * x * x) AS DOUBLE) AS s3,
               CAST(sum(x * x * x * x) AS DOUBLE) AS s4
        FROM v GROUP BY event_type
    ),
    m AS (
        SELECT event_type, n,
               s1 / n AS mu,
               s2 / n - (s1 / n) * (s1 / n) AS m2,
               s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
               s4 / n - 4.0 * (s1 / n) * (s3 / n)
                     + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                     - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        FROM s
    )
    SELECT event_type, n,
           CAST(round(mu) AS BIGINT) / 100.0 AS mean_value,
           round(sqrt(m2) / 100.0, 4) AS stddev_pop,
           round(m3 / (m2 * sqrt(m2)), 4) AS skewness,
           round(m4 / (m2 * m2) - 3.0, 4) AS kurtosis_excess
    FROM m
    ORDER BY event_type
    """,
    "population skewness / excess kurtosis per event type from exact 128-bit power sums",
)
def q51_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    clamped = F.least(
        F.greatest(F.col("value"), F.lit(-MOMENT_CLAMP)), F.lit(MOMENT_CLAMP)
    )
    x = F.round(clamped * 100.0).cast("long").cast("decimal(38,0)")
    v = ev.filter(F.col("value").isNotNull()).select("event_type", x.alias("x"))
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("s2"),
        F.sum(F.col("x") * F.col("x") * F.col("x")).cast("double").alias("s3"),
        F.sum(F.col("x") * F.col("x") * F.col("x") * F.col("x")).cast("double").alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - (F.col("s1") / n) * (F.col("s1") / n)
    m3 = (
        F.col("s3") / n
        - F.lit(3.0) * (F.col("s1") / n) * (F.col("s2") / n)
        + F.lit(2.0) * (F.col("s1") / n) * (F.col("s1") / n) * (F.col("s1") / n)
    )
    m4 = (
        F.col("s4") / n
        - F.lit(4.0) * (F.col("s1") / n) * (F.col("s3") / n)
        + F.lit(6.0) * (F.col("s1") / n) * (F.col("s1") / n) * (F.col("s2") / n)
        - F.lit(3.0)
        * (F.col("s1") / n)
        * (F.col("s1") / n)
        * (F.col("s1") / n)
        * (F.col("s1") / n)
    )
    m = s.select("event_type", "n", mu.alias("mu"), m2.alias("m2"), m3.alias("m3"), m4.alias("m4"))
    return m.select(
        "event_type",
        "n",
        (F.round(F.col("mu")).cast("long") / F.lit(100.0)).alias("mean_value"),
        F.round(F.sqrt("m2") / F.lit(100.0), 4).alias("stddev_pop"),
        F.round(F.col("m3") / (F.col("m2") * F.sqrt("m2")), 4).alias("skewness"),
        F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - F.lit(3.0), 4).alias(
            "kurtosis_excess"
        ),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Population Stability Index — the production drift monitor (banking /
# ML-ops standard) comparing each source's length distribution against
# the reference source over fixed-width bins with add-one smoothing.
# Complements drift_ks_length (KS = max deviation; PSI = mass-weighted
# relative shift). Per-bin PSI terms are quantized to 1e-8-scaled
# BIGINTs so the cross-bin SUM is an integer sum; bin counts broadcast
# (n_sources x 13 rows).
# ---------------------------------------------------------------------------
PSI_BIN_W = 50
PSI_MAX_BIN = 12
PSI_REF_SOURCE = "src0"


@register(
    "drift_psi_chars",
    f"""
    WITH binned AS (
        SELECT source, least(CAST(n_chars // {PSI_BIN_W} AS BIGINT), {PSI_MAX_BIN}) AS bin
        FROM documents
    ),
    counts AS (SELECT source, bin, count(*) AS c FROM binned GROUP BY source, bin),
    tot AS (SELECT source, sum(c) AS n FROM counts GROUP BY source),
    spine AS (
        SELECT s.source, b.bin
        FROM (SELECT DISTINCT source FROM documents) s,
             (SELECT unnest(range(0, {PSI_MAX_BIN + 1})) AS bin) b
    ),
    smoothed AS (
        SELECT sp.source, sp.bin,
               (CAST(coalesce(c.c, 0) + 1 AS DOUBLE))
                   / (t.n + {PSI_MAX_BIN + 1}) AS p
        FROM spine sp
        LEFT JOIN counts c ON sp.source = c.source AND sp.bin = c.bin
        JOIN tot t ON sp.source = t.source
    ),
    ref AS (SELECT bin, p AS q FROM smoothed WHERE source = '{PSI_REF_SOURCE}'),
    terms AS (
        SELECT s.source,
               CAST(round((s.p - r.q) * ln(s.p / r.q) * 100000000.0) AS BIGINT) AS t8
        FROM smoothed s JOIN ref r ON s.bin = r.bin
        WHERE s.source <> '{PSI_REF_SOURCE}'
    )
    SELECT source, CAST(sum(t8) AS DOUBLE) / 100000000.0 AS psi
    FROM terms
    GROUP BY source
    ORDER BY source
    """,
    "Population Stability Index of each source's length distribution vs the reference source",
)
def drift_psi_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    binned = docs.select(
        "source",
        F.least(
            (F.col("n_chars") / PSI_BIN_W).cast("long"), F.lit(PSI_MAX_BIN).cast("long")
        ).alias("bin"),
    )
    counts = binned.groupBy("source", "bin").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("source").agg(F.sum("c").alias("n"))
    spine = (
        docs.select("source")
        .distinct()
        .crossJoin(
            spark.range(0, PSI_MAX_BIN + 1).select(F.col("id").alias("bin"))
        )
    )
    smoothed = (
        spine.join(counts, ["source", "bin"], "left")
        .join(tot, "source")
        .select(
            "source",
            "bin",
            (
                (F.coalesce("c", F.lit(0)) + 1).cast("double")
                / (F.col("n") + F.lit(PSI_MAX_BIN + 1))
            ).alias("p"),
        )
    )
    ref = smoothed.filter(F.col("source") == PSI_REF_SOURCE).select(
        "bin", F.col("p").alias("q")
    )
    t8 = F.round(
        (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")) * F.lit(100000000.0)
    ).cast("long")
    terms = (
        smoothed.filter(F.col("source") != PSI_REF_SOURCE)
        .join(F.broadcast(ref), "bin")
        .select("source", t8.alias("t8"))
    )
    return (
        terms.groupBy("source")
        .agg((F.sum("t8").cast("double") / F.lit(100000000.0)).alias("psi"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Association rules over co-ordered parts — basket_part_pairs' consumer:
# support -> directed confidence + lift. Item counts and the basket
# total are broadcast-sized dimension aggregates; ratios go through the
# quantize-then-divide path because support/item counts are small
# integers that CAN land on exact rounding boundaries.
# ---------------------------------------------------------------------------
RULES_TOP = 25


@register(
    "basket_rules",
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM li),
    ic AS (SELECT l_partkey, count(*) AS n_item FROM li GROUP BY l_partkey),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS support
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
    SELECT p.part_a, p.part_b, p.support,
           CAST(round(CAST(p.support AS DOUBLE) * 1000000.0 / ia.n_item) AS BIGINT)
               / 1000000.0 AS conf_a_b,
           CAST(round(CAST(p.support AS DOUBLE) * 1000000.0 / ib.n_item) AS BIGINT)
               / 1000000.0 AS conf_b_a,
           CAST(round(CAST(p.support AS DOUBLE) * nb.n_baskets * 1000000.0
                      / (CAST(ia.n_item AS DOUBLE) * ib.n_item)) AS BIGINT)
               / 1000000.0 AS lift
    FROM pairs p
    JOIN ic ia ON p.part_a = ia.l_partkey
    JOIN ic ib ON p.part_b = ib.l_partkey, nb
    ORDER BY p.support DESC, p.part_a, p.part_b
    LIMIT {RULES_TOP}
    """,
    "association rules: confidence and lift over top co-ordered part pairs",
)
def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    nb = li.agg(F.count_distinct("l_orderkey").alias("n_baskets"))
    ic = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    ia = ic.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("na"))
    ib = ic.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("nb_"))
    sup = F.col("support").cast("double")

    def q6(col):
        return F.round(col).cast("long") / F.lit(1000000.0)

    return (
        pairs.join(F.broadcast(ia), "part_a")
        .join(F.broadcast(ib), "part_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "part_a",
            "part_b",
            "support",
            q6(sup * F.lit(1000000.0) / F.col("na")).alias("conf_a_b"),
            q6(sup * F.lit(1000000.0) / F.col("nb_")).alias("conf_b_a"),
            q6(
                sup
                * F.col("n_baskets")
                * F.lit(1000000.0)
                / (F.col("na").cast("double") * F.col("nb_"))
            ).alias("lift"),
        )
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(RULES_TOP)
    )


# ---------------------------------------------------------------------------
# Funnel stage latency — q17's consumer: the distribution (exact
# discrete quartiles + p90 over integer microseconds, portable with no
# float surface) of time-to-convert for view->click and click->purchase.
# Shape: the per-user first-timestamp chain is q17's join cascade;
# quantiles are one window rank per stage over the (small) converted
# population.
# ---------------------------------------------------------------------------
@register(
    "events_funnel_latency",
    """
    WITH v AS (
        SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS c_us
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.v_us
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.c_us
        GROUP BY e.user_id
    ),
    lat AS (
        SELECT 'view_to_click' AS stage, c.c_us - v.v_us AS lat_us
        FROM c JOIN v ON c.user_id = v.user_id
        UNION ALL
        SELECT 'click_to_purchase' AS stage, p.p_us - c.c_us AS lat_us
        FROM p JOIN c ON p.user_id = c.user_id
    ),
    ranked AS (
        SELECT stage, lat_us,
               row_number() OVER (PARTITION BY stage ORDER BY lat_us) AS rn,
               count(*) OVER (PARTITION BY stage) AS n
        FROM lat
    )
    SELECT stage, max(n) AS n_users,
           min(CASE WHEN rn >= CAST(ceil(0.25 * n) AS BIGINT) THEN lat_us END) AS p25_us,
           min(CASE WHEN rn >= CAST(ceil(0.50 * n) AS BIGINT) THEN lat_us END) AS p50_us,
           min(CASE WHEN rn >= CAST(ceil(0.75 * n) AS BIGINT) THEN lat_us END) AS p75_us,
           min(CASE WHEN rn >= CAST(ceil(0.90 * n) AS BIGINT) THEN lat_us END) AS p90_us
    FROM ranked
    GROUP BY stage
    ORDER BY stage
    """,
    "funnel conversion-latency distribution: exact discrete quantiles per stage",
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") >= F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c.select("user_id", "c_us"), "user_id")
        .filter(F.col("us") >= F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    vc = (
        c.join(v, "user_id")
        .select(
            F.lit("view_to_click").alias("stage"),
            (F.col("c_us") - F.col("v_us")).alias("lat_us"),
        )
    )
    cp = (
        p.join(c, "user_id")
        .select(
            F.lit("click_to_purchase").alias("stage"),
            (F.col("p_us") - F.col("c_us")).alias("lat_us"),
        )
    )
    lat = vc.unionAll(cp)
    wr = Window.partitionBy("stage").orderBy("lat_us")
    wn = Window.partitionBy("stage")
    ranked = lat.select(
        "stage",
        "lat_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(pq: float):
        pos = F.ceil(F.lit(pq) * F.col("n")).cast("long")
        return F.min(F.when(F.col("rn") >= pos, F.col("lat_us")))

    return (
        ranked.groupBy("stage")
        .agg(
            F.max("n").alias("n_users"),
            pick(0.25).alias("p25_us"),
            pick(0.50).alias("p50_us"),
            pick(0.75).alias("p75_us"),
            pick(0.90).alias("p90_us"),
        )
        .orderBy("stage")
    )
