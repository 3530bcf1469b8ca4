"""Single-subsystem diagnostic probes (round-7 verdict item 1).

Rounds 3-6 burned ~20 whole-query restructures against a one-bit-per-
query-per-round driver signal before the divergence was localized (it
was pandas dtype canonicalization: DuckDB .df() maps HUGEINT - the
result type of sum(BIGINT)/sum(INTEGER) - to float64 while Spark's
sum(long) stays int64, so the driver's pandas-level value hash saw
`5.0` vs `5` on every query whose oracle SQL had an uncast integer
sum; tools/dtype_audit.py reproduced the exact 8-query red set from
CORRECTNESS_r06 on the first run). These probes exist so a future
divergence never costs that much bandwidth again: each one exercises
exactly ONE engine/harness primitive that the registry queries depend
on and emits a few all-BIGINT rows, so the driver's green/red bitmap
over the family names the divergent subsystem directly.

Every probe output column is BIGINT on both surfaces (integer sums
explicitly CAST - sum() in DuckDB returns HUGEINT, the very subsystem
probe_int128_sum covers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.portable import pln
from ..plans.registry import register, table

_SPINE_N = 100000


def _spine(spark: SparkSession, n: int) -> DataFrame:
    """Pinned integer spine 1..n — generated, so the probe is
    independent of parquet decoding (that's other probes' job)."""
    return spark.range(1, n + 1).select(F.col("id").alias("k"))


# --------------------------------------------------------------------
# (a) parquet DOUBLE decode: if the driver's parquet reader (either
# engine) decodes o_totalprice differently, this cents checksum flips.
# --------------------------------------------------------------------
@register(
    "probe_parquet_double",
    """
    SELECT CAST(sum(CAST(floor((o_totalprice * 100.0) + 0.5) AS BIGINT)) AS BIGINT)
               AS cents_sum,
           count(*) AS n_rows
    FROM orders
    """,
    "probe: parquet DOUBLE column decode (quantized cents checksum)",
)
def probe_parquet_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.agg(
        F.sum(F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")).alias(
            "cents_sum"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------
# (b) parquet TIMESTAMP decode: epoch-µs min/max plus an epoch-day sum
# (raw µs sums would overflow BIGINT). Covers unix_micros vs epoch_us
# and the integer `div` vs `//` day bucketing used by q44_rfm.
# --------------------------------------------------------------------
@register(
    "probe_parquet_timestamp",
    """
    SELECT CAST(sum(epoch_us(o_orderdate) // 86400000000) AS BIGINT) AS day_sum,
           CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS min_us,
           CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS max_us,
           count(*) AS n_rows
    FROM orders
    """,
    "probe: parquet TIMESTAMP decode (epoch-µs min/max, epoch-day sum)",
)
def probe_parquet_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    us = F.expr("unix_micros(o_orderdate)")
    return orders.agg(
        F.sum(F.expr("unix_micros(o_orderdate) div 86400000000")).alias("day_sum"),
        F.min(us).alias("min_us"),
        F.max(us).alias("max_us"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------
# (c) CAST(ts AS DATE) day bucketing over the µs-truncated nanos
# timestamps of events: a date-semantics divergence (timezone, DST,
# nanos truncation) moves day_sum or n_days.
# --------------------------------------------------------------------
@register(
    "probe_date_bucket",
    """
    SELECT CAST(sum(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS BIGINT)
               AS day_sum,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           count(*) AS n_rows
    FROM events
    """,
    "probe: CAST(timestamp AS DATE) bucketing (epoch-day checksum over events)",
)
def probe_date_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    return ev.agg(
        F.sum(F.datediff(d, F.lit("1970-01-01")).cast("long")).alias("day_sum"),
        F.countDistinct(d).alias("n_days"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------
# (d) string_split token counting per lang — the primitive under every
# text operator. Divergence here = tokenizer semantics (empty tokens,
# multi-byte handling) differ between the engines' split functions.
# --------------------------------------------------------------------
@register(
    "probe_string_split",
    """
    SELECT lang,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           count(*) AS n_docs
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    "probe: string_split token counts per lang",
)
def probe_string_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------
# (e) trigram construction (the exact text_ngram_novelty gram set) +
# the md5->BIGINT conversion used by every salted-hash operator. A
# divergence isolates gram assembly / md5 / hex conversion without the
# novelty query's join and first-owner logic.
# --------------------------------------------------------------------
@register(
    "probe_trigram_checksum",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT DISTINCT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, greatest(len(t) - 1, 1))]) AS g
        FROM toks
    )
    SELECT CAST(sum(('0x' || substr(md5(g), 1, 8))::BIGINT) AS BIGINT) AS gram_checksum,
           count(*) AS n_grams,
           CAST(count(DISTINCT g) AS BIGINT) AS n_distinct
    FROM grams
    """,
    "probe: trigram construction + md5-hex->BIGINT checksum",
)
def probe_trigram_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "case when size(t) >= 3 then"
                    " transform(sequence(1, size(t) - 2),"
                    "  i -> concat_ws(' ', t[i-1], t[i], t[i+1]))"
                    " else array() end"
                )
            )
        ).alias("g"),
    )
    v = F.conv(F.substring(F.md5(F.col("g").cast("binary")), 1, 8), 16, 10).cast("long")
    return grams.agg(
        F.sum(v).alias("gram_checksum"),
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("g").alias("n_distinct"),
    )


# --------------------------------------------------------------------
# (f) the portable-ln polynomial end-to-end on a generated spine: no
# parquet, no strings — a red here with (a)-(e) green means the
# driver's engine disagrees on IEEE-754 basic-op arithmetic itself.
# --------------------------------------------------------------------
@register(
    "probe_pln_chain",
    f"""
    SELECT CAST(sum(CAST(floor(({pln("k")} * 1000000.0) + 0.5) AS BIGINT)) AS BIGINT)
               AS pln_sum,
           count(*) AS n_rows
    FROM range(1, {_SPINE_N + 1}) t(k)
    """,
    "probe: portable-ln polynomial checksum over a generated 1..100000 spine",
)
def probe_pln_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = _spine(spark, _SPINE_N)
    term = F.expr(f"CAST(floor(({pln('k')} * 1000000.0) + 0.5) AS BIGINT)")
    return sp.agg(F.sum(term).alias("pln_sum"), F.count(F.lit(1)).alias("n_rows"))


# --------------------------------------------------------------------
# (g) floor-form quantization boundaries on pinned integer ratios —
# the fround primitive isolated from any data or transcendental.
# --------------------------------------------------------------------
@register(
    "probe_floor_div",
    """
    SELECT CAST(sum(CAST(floor(((CAST(k AS DOUBLE) / 9999.0) * 10000.0) + 0.5)
                         AS BIGINT)) AS BIGINT) AS q_sum,
           count(*) AS n_rows
    FROM range(1, 10000) t(k)
    """,
    "probe: floor((a/b)*1e4+0.5) boundary behavior on a pinned spine",
)
def probe_floor_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = _spine(spark, 9999)
    term = F.floor((F.col("k").cast("double") / 9999.0) * 10000.0 + 0.5).cast("long")
    return sp.agg(F.sum(term).alias("q_sum"), F.count(F.lit(1)).alias("n_rows"))


# --------------------------------------------------------------------
# (h) parquet FLOAT[] (embedding) decode: float32 element decoding and
# list expansion, quantized so the checksum is exact.
# --------------------------------------------------------------------
@register(
    "probe_embedding_decode",
    """
    SELECT CAST(sum(CAST(floor((CAST(x AS DOUBLE) * 1000000.0) + 0.5) AS BIGINT))
                AS BIGINT) AS q_sum,
           count(*) AS n_vals
    FROM (SELECT unnest(embedding) AS x FROM embeddings)
    """,
    "probe: parquet FLOAT[] decode (quantized element checksum)",
)
def probe_embedding_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    x = emb.select(F.explode("embedding").alias("x"))
    term = F.floor(F.col("x").cast("double") * 1000000.0 + 0.5).cast("long")
    return x.agg(F.sum(term).alias("q_sum"), F.count(F.lit(1)).alias("n_vals"))


# --------------------------------------------------------------------
# (i) 128-bit integer aggregation (HUGEINT / decimal(38,0)) — THE
# subsystem behind the r3-r6 red set: DuckDB integer sums return
# HUGEINT, which pandas-canonicalizes to float64 unless CAST back to
# BIGINT. This probe exercises the whole 128-bit path (cast in,
# multiply, sum, modulo, cast out) with the output contract done
# right; if the harness's canonicalizer changes again, this flips
# first.
# --------------------------------------------------------------------
@register(
    "probe_int128_sum",
    """
    SELECT CAST(sum(CAST(o_orderkey AS HUGEINT) * o_orderkey) % 1000000007 AS BIGINT)
               AS sq_mod,
           count(*) AS n_rows
    FROM orders
    """,
    "probe: 128-bit integer sum (HUGEINT / decimal(38,0)) with BIGINT output contract",
)
def probe_int128_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    sq = F.col("o_orderkey").cast("decimal(38,0)") * F.col("o_orderkey")
    return orders.agg(
        (F.sum(sq) % F.lit(1000000007)).cast("long").alias("sq_mod"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------
# (j) row_number + ntile over a pinned tie-free permutation spine —
# window numbering semantics isolated from data and from the
# distributed-rank machinery (distrank.py) the big queries use.
# --------------------------------------------------------------------
@register(
    "probe_window_spine",
    """
    WITH perm AS (SELECT k, (k * 37) % 1000 AS p FROM range(1, 1001) t(k)),
    w AS (
        SELECT k,
               row_number() OVER (ORDER BY p) AS rn,
               ntile(7) OVER (ORDER BY p) AS nt
        FROM perm
    )
    SELECT CAST(sum(rn * k) AS BIGINT) AS rn_checksum,
           CAST(sum(nt * k) AS BIGINT) AS nt_checksum,
           count(*) AS n_rows
    FROM w
    """,
    "probe: row_number/ntile numbering over a pinned tie-free spine",
)
def probe_window_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = _spine(spark, 1000).withColumn("p", (F.col("k") * 37) % 1000)
    w = Window.orderBy("p")
    num = sp.select(
        "k",
        F.row_number().over(w).cast("long").alias("rn"),
        F.ntile(7).over(w).cast("long").alias("nt"),
    )
    return num.agg(
        F.sum(F.col("rn") * F.col("k")).alias("rn_checksum"),
        F.sum(F.col("nt") * F.col("k")).alias("nt_checksum"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------
# (k) exponent-form double-literal chains (divergence class 5,
# docs/DRIVER_DIVERGENCE.md): a mult/div chain seeded by e0-form
# literals must evaluate as pure correctly-rounded DOUBLE ops on both
# engines. If either engine ever routes an exponent literal through
# decimal arithmetic (the class that diverged text_bm25_search's
# tf-norm chain pre-commit), this per-row e12 checksum flips. The
# chain shape mirrors BM25's: (lit * int) * int / int, then one more
# literal multiply — division is the step where decimal semantics
# pick a result scale and round decimally.
# --------------------------------------------------------------------
@register(
    "probe_double_literal_chain",
    f"""
    WITH s AS (SELECT CAST(k AS BIGINT) AS k FROM range(1, {_SPINE_N + 1}) t(k))
    SELECT CAST(sum(CAST(floor((((0.9e0 * k) * 7) / (k + 13)) * (1.2e0 * 0.25e0)
                                * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS chain_e12,
           count(*) AS n_rows
    FROM s
    """,
    "probe: e0-form double literal mult/div chain (divergence class 5)",
)
def probe_double_literal_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _spine(spark, _SPINE_N)
    term = F.expr(
        "cast(floor((((0.9e0 * k) * 7) / (k + 13)) * (1.2e0 * 0.25e0)"
        " * 1000000000000.0 + 0.5) as bigint)"
    )
    return s.agg(
        F.sum(term).cast("long").alias("chain_e12"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------
# (l) widened share arithmetic (r9: every corpus-scale *_e4/_e6 share
# column now flows through plans.registry.share_expr/share_sql —
# DECIMAL(38,0) on Spark, HUGEINT on DuckDB, integral division, CASE
# zero guard). This probe exercises that exact op combination on
# values straddling the int64 wrap point of `num * 20000` (where the
# pre-r9 narrow form silently wrapped under non-ANSI Spark), plus a
# zero denominator. If the driver's engine build ever disagrees on
# HUGEINT `//`, decimal `div`, or the CASE-NULL path, this row flips
# and names the subsystem without touching the 12 migrated queries.
# --------------------------------------------------------------------
from ..plans.registry import share_expr, share_sql  # noqa: E402


@register(
    "probe_share_widening",
    f"""
    WITH s AS (
        SELECT CAST(k AS BIGINT) AS k,
               CAST(4600000000000 AS BIGINT) * k AS num,
               CAST(9200000000000 AS BIGINT) * (k + 1) AS den
        FROM range(1, 2001) t(k)
    )
    SELECT CAST(sum({share_sql("num", "den")} * k) AS BIGINT) AS share_checksum,
           CAST(sum({share_sql("num", "den - den", 6)}) AS BIGINT) AS zero_guard_nulls,
           count(*) AS n_rows
    FROM s
    """,
    "probe: DECIMAL(38,0)/HUGEINT share arithmetic past the int64 wrap point + zero guard",
)
def probe_share_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _spine(spark, 2000).select(
        "k",
        (F.lit(4600000000000).cast("long") * F.col("k")).alias("num"),
        (F.lit(9200000000000).cast("long") * (F.col("k") + 1)).alias("den"),
    )
    return s.select(
        "k",
        share_expr("num", "den").alias("sh"),
        share_expr("num", "den - den", 6).alias("z"),
    ).agg(
        F.sum(F.col("sh") * F.col("k")).cast("long").alias("share_checksum"),
        F.sum("z").cast("long").alias("zero_guard_nulls"),
        F.count(F.lit(1)).alias("n_rows"),
    )
