"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Catalyst expressions (split / regexp / aggregate over arrays)
— no UDFs, so the whole thing runs inside whole-stage codegen and
scales with executors. Each query is oracle-checked against DuckDB
computing the same formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register, table

# tiny deterministic stopword lists for the n-gram language heuristic
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "for"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "por"],
    "fr": ["le", "la", "et", "de", "un", "une", "les", "pour"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein"],
}


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _ratio_spark(lang: str):
    # cast to double BEFORE dividing: Spark's `1.0` SQL literal is a
    # DECIMAL, and decimal outputs stringify differently from DuckDB's
    # doubles in the driver's value hash (r1 hash_match=false).
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(
        f"round(size(filter(t, x -> x in ({lst}))) / cast(greatest(size(t), 1) as double), 4)"
    ).alias(f"{lang}_ratio")


@register(
    "text_language_id",
    f"""
    WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
    scored AS (
        SELECT doc_id, lang,
               round(len(list_filter(t, x -> x IN ({_sql_list(STOPWORDS['en'])}))) * 1.0 / greatest(len(t), 1), 4) AS en_ratio,
               round(len(list_filter(t, x -> x IN ({_sql_list(STOPWORDS['es'])}))) * 1.0 / greatest(len(t), 1), 4) AS es_ratio,
               round(len(list_filter(t, x -> x IN ({_sql_list(STOPWORDS['fr'])}))) * 1.0 / greatest(len(t), 1), 4) AS fr_ratio,
               round(len(list_filter(t, x -> x IN ({_sql_list(STOPWORDS['de'])}))) * 1.0 / greatest(len(t), 1), 4) AS de_ratio
        FROM toks
    )
    SELECT doc_id, lang, en_ratio, es_ratio, fr_ratio, de_ratio,
           CASE WHEN en_ratio >= es_ratio AND en_ratio >= fr_ratio AND en_ratio >= de_ratio THEN 'en'
                WHEN es_ratio >= fr_ratio AND es_ratio >= de_ratio THEN 'es'
                WHEN fr_ratio >= de_ratio THEN 'fr'
                ELSE 'de' END AS predicted
    FROM scored
    ORDER BY doc_id
    """,
    "stopword-ratio language heuristic with deterministic argmax",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "lang", F.split("text", " ").alias("t")).select(
        "doc_id", "lang", *[_ratio_spark(lang) for lang in ("en", "es", "fr", "de")]
    )
    en, es, fr, de = (F.col(f"{x}_ratio") for x in ("en", "es", "fr", "de"))
    predicted = (
        F.when((en >= es) & (en >= fr) & (en >= de), "en")
        .when((es >= fr) & (es >= de), "es")
        .when(fr >= de, "fr")
        .otherwise("de")
    )
    return d.withColumn("predicted", predicted).orderBy("doc_id")


@register(
    "text_quality",
    """
    WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id,
           length(text)                                   AS n_chars,
           len(t)                                         AS n_tokens,
           round(length(text) * 1.0 / greatest(len(t), 1), 4) AS mean_tok_len,
           len(list_filter(t, x -> x = 'the' OR x = 'a')) AS n_stop,
           round(len(list_distinct(t)) * 1.0 / greatest(len(t), 1), 4) AS uniq_ratio,
           round(least(len(t) / 100.0, 1.0)
                 * (0.5 + 0.5 * len(list_distinct(t)) * 1.0 / greatest(len(t), 1)), 4) AS quality_score
    FROM toks
    ORDER BY doc_id
    """,
    "doc quality features: length, token stats, uniqueness, composite score",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "text", F.split("text", " ").alias("t"))
    n_tokens = F.size("t")
    uniq = F.expr("size(array_distinct(t)) / cast(greatest(size(t), 1) as double)")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(F.length("text") * 1.0 / F.greatest(n_tokens, F.lit(1)), 4).alias("mean_tok_len"),
        F.expr("size(filter(t, x -> x = 'the' OR x = 'a'))").alias("n_stop"),
        F.round(uniq, 4).alias("uniq_ratio"),
        F.round(F.least(n_tokens / 100.0, F.lit(1.0)) * (0.5 + 0.5 * uniq), 4).alias(
            "quality_score"
        ),
    ).orderBy("doc_id")


@register(
    "text_token_count",
    r"""
    SELECT doc_id,
           len(string_split(text, ' '))                  AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpeish_tokens,
           length(text) - length(replace(text, ' ', ''))  AS n_spaces
    FROM documents
    ORDER BY doc_id
    """,
    "token counting: whitespace split and a BPE-ish regex tokenizer",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)")).alias(
            "bpeish_tokens"
        ),
        (F.length("text") - F.length(F.regexp_replace("text", " ", ""))).alias("n_spaces"),
    ).orderBy("doc_id")


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(lower(trim(text)))              AS content_hash,
           md5(substr(lower(trim(text)), 1, 64)) AS prefix_hash,
           substr(md5(lower(trim(text))), 1, 8)  AS shard_key
    FROM documents
    ORDER BY doc_id
    """,
    "content fingerprints: full/prefix md5 + shard key for distributed dedup routing",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("content_hash"),
        F.md5(F.substring(norm, 1, 64).cast("binary")).alias("prefix_hash"),
        F.substring(F.md5(norm.cast("binary")), 1, 8).alias("shard_key"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# PII-style redaction: scrub emails / URLs / IPv4s before training.
# Pure regexp_replace — stays in codegen; patterns restricted to the
# regex dialect subset DuckDB's RE2 and Java's regex share.
# ---------------------------------------------------------------------------
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_URL_RE = "https?://[^ ]+"
_IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


@register(
    "text_redact",
    f"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{_URL_RE}', '<URL>', 'g'),
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_IPV4_RE}', '<IP>', 'g')                    AS redacted,
           length(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           length(regexp_extract_all(text, '{_URL_RE}'))   AS n_urls
    FROM documents
    ORDER BY doc_id
    """,
    "PII-style scrubbing: URL/email/IPv4 redaction + match counts",
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _URL_RE, "<URL>"),
            _EMAIL_RE,
            "<EMAIL>",
        ),
        _IPV4_RE,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        F.size(F.expr(f"regexp_extract_all(text, '{_EMAIL_RE}', 0)")).alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(text, '{_URL_RE}', 0)")).alias("n_urls"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Deterministic train/val/test assignment: md5-bucket on (salt, doc_id) —
# stable across engines, runs, and cluster sizes; no RNG, no shuffle
# beyond the final sort. The standard split primitive for corpus builds.
# ---------------------------------------------------------------------------
SPLIT_SALT = "corpus-v1"


@register(
    "text_split_assign",
    f"""
    WITH b AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('{SPLIT_SALT}:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
        FROM documents
    )
    SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    ORDER BY doc_id
    """,
    "deterministic 90/5/5 train/val/test split via salted md5 bucketing",
)
def text_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{SPLIT_SALT}:"), F.col("doc_id").cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    return (
        docs.select("doc_id", bucket.cast("int").alias("bucket"))
        .withColumn(
            "split",
            F.when(F.col("bucket") < 90, "train").when(F.col("bucket") < 95, "val").otherwise("test"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Corpus n-gram statistics: the LM-data counting workload. Top-k by
# count with a deterministic tie-break; the heavy lifting is one
# explode + one hash aggregation (map-side partial combine), the
# canonical shape for counting over a 100 TB corpus.
# ---------------------------------------------------------------------------
NGRAM_N = 2
NGRAM_TOP = 100


@register(
    "text_ngram_counts",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT unnest([t[i] || ' ' || t[i+1]
                       for i in range(1, greatest(len(t), 1))]) AS g
        FROM toks
    )
    SELECT g AS ngram, count(*) AS n, count(*) * 1.0 / (SELECT count(*) FROM grams) AS frac
    FROM grams
    GROUP BY g
    ORDER BY n DESC, ngram
    LIMIT {NGRAM_TOP}
    """,
    "top bigrams with counts and corpus fraction (LM-data statistics)",
)
def text_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # materialize the token array once; build bigrams over it (the naive
    # expr re-runs split(text) three times per row)
    grams = (
        docs.select(F.split("text", " ").alias("t"))
        .select(
            F.explode(
                F.expr(
                    f"case when size(t) >= {NGRAM_N} then"
                    f" transform(sequence(1, size(t) - 1),"
                    f"  i -> concat_ws(' ', t[i-1], t[i]))"
                    f" else array() end"
                )
            ).alias("ngram")
        )
    )
    # ONE pass over the corpus: the total gram count is the sum of the
    # per-ngram counts, derived from the aggregated (tiny) result rather
    # than a second full explode+count job. The broadcast scalar join
    # costs nothing; the heavy explode shuffle is shared via Spark's
    # exchange reuse.
    counts = grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select("ngram", "n", (F.col("n") / F.col("__total")).alias("frac"))
        .orderBy(F.col("n").desc(), "ngram")
        .limit(NGRAM_TOP)
    )
