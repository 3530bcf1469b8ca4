"""Oracle parity on ADVERSARIAL fixtures, not just the generated
testdata: empty text, single token, all-repeated tokens, unicode,
exact duplicates, containment pairs, numeric-only docs. Every
document-only registry query must hash-match DuckDB on this corpus the
same way the driver's gate checks the synthetic tables — edge shapes
are where split/round/agg semantics quietly diverge."""

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY

from .oracle_check import row_set

_LONG = " ".join(f"w{i} the of to" for i in range(40))  # 160 tokens, stopwords present

_DOCS = [
    # (doc_id, text, lang, source)
    (0, "", "en", "srcA"),
    (1, "hello", "en", "srcA"),
    (2, "the the the the the", "es", "srcA"),
    (3, "a b a b a b a b", "en", "srcA"),
    (4, _LONG, "es", "srcA"),
    (5, _LONG, "en", "srcA"),  # exact duplicate of 4
    (6, "héllo wörld naïve café déjà vu encore une fois", "es", "srcA"),
    (7, _LONG + " plus a unique novel tail of extra content", "en", "srcA"),  # contains 4
    (8, "a b a b a b judgement day", "en", "src0"),  # benchmark source, overlaps 3
    (9, "1 2 3 4 5 6 7 8 9 10 11 12", "es", "srcA"),
]

# document-only queries (no events/orders/embeddings/lineitem input)
_DOC_QUERIES = [
    "text_token_count",
    "text_fingerprint",
    "text_token_entropy",
    "text_quality_rules",
    "text_repetition",
    "text_ngram_counts",
    "token_bigram_pmi",
    "text_lm_score",
    "text_length_stats",
    "text_ngram_novelty",
    "text_span_contamination",
    "text_contamination",
    "text_language_id",
    "text_quality",
    "text_redact",
    "text_split_assign",
    "text_edit_distance",
    "text_mix_weights",
    "dedup_exact",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_jaccard_prefix",
    "dedup_cross_split",
    "shard_assign",
    "curriculum_bins",
    "sample_weighted",
    "pipeline_mix_sample",
    "sample_stratified",
    "multimodal_dedup",
    # round-4 corpus-forensics ops (documents-only subset)
    "bpe_merge_step",
    "source_overlap_matrix",
    "text_zipf_slope",
    "token_hapax_rate",
    "dedup_incremental",
    "tokenizer_vocab_coverage",
    "dp_noisy_counts",
    "text_ccnet_bucket",
    "dedup_keep_best",
    "dedup_minhash_eval",
    "drift_ks_length",
    "text_burstiness",
    "vocab_coverage_curve",
    "text_kl_divergence",
    "dedup_threshold_curve",
    "text_entropy_rate",
    "source_vocab_similarity",
    "text_heaps_law",
    # round-4 analytics batch (documents-only subset)
    "corpus_good_turing",
    "text_winnowing",
    "drift_psi_chars",
    "corpus_tfidf_pairs",
    "multimodal_caption_pairs",
    "dedup_cross_split_near",
    "text_langid_confusion",
    "text_ascii_profile",  # the unicode docs are exactly its edge case
    "dedup_rate_by_source",
    "text_quality_by_source",
    "multimodal_size_outliers",
    "corpus_shard_balance",
    "text_token_len_hist",
    "text_len_quartiles_by_lang",
    # r7 probe family members that read only documents — the unicode/
    # empty/duplicated corpus is exactly the hostile input their
    # split/trigram/md5 checksums must stay engine-identical on
    "probe_string_split",
    "probe_trigram_checksum",
    # r7 additions exercising list slicing / window explosion on the
    # unicode/empty/short-doc corpus (docs with < 8 tokens must yield
    # zero windows, not errors, on both engines)
    "text_boilerplate_prefix",
    "text_window_dedup",
    # r8: stride-1 winnowing span dedup — shingle slicing + per-doc
    # window min over the same hostile corpus
    "text_winnow_dedup",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("edge_sf")
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in _DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_edge_corpus_oracle_parity(spark, edge_dir, name):
    qd = REGISTRY[name]
    sdf = qd.spark_fn(spark, edge_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    orel = con.execute(qd.oracle_sql)
    ocols = [c[0].lower() for c in orel.description]
    orows = [tuple(r) for r in orel.fetchall()]
    assert scols == ocols, (scols, ocols)
    assert len(srows) == len(orows)
    s, o = row_set(srows), row_set(orows)
    assert s == o, (
        name,
        [x for x in s if x not in set(o)][:3],
        [x for x in o if x not in set(s)][:3],
    )
