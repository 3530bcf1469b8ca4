"""Operator-level tests at sf0.001 (fast): registry integrity, value
spot-checks, and the mini oracle gate for a representative subset.
The full-surface oracle comparison lives in tests/oracle_check.py and
runs at sf0.01."""

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY, TABLES

SF_DIR = "/root/testdata/sf0.001"

ORACLE_SUBSET = [
    "q01_pricing_summary",
    "q05_count_distinct",
    "q08_join_agg",
    "q12_window",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "text_quality",
    "ann_cosine_topk",
    "multimodal_features",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_registry_complete():
    assert len(REGISTRY) >= 20
    sql_backed = [q for q in REGISTRY.values() if q.oracle_sql is not None]
    assert len(sql_backed) >= 18


def test_all_queries_run_nonempty(spark):
    for name, qd in REGISTRY.items():
        df = qd.spark_fn(spark, SF_DIR)
        assert df.count() >= 0, name
        assert len(df.columns) > 0, name


@pytest.mark.parametrize("name", ORACLE_SUBSET)
def test_oracle_parity_subset(spark, name):
    from .oracle_check import row_set

    qd = REGISTRY[name]
    sdf = qd.spark_fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    con = _duck()
    orel = con.execute(qd.oracle_sql)
    ocols = [d[0].lower() for d in orel.description]
    orows = orel.fetchall()
    assert [c.lower() for c in sdf.columns] == ocols, name
    assert len(srows) == len(orows), name
    assert row_set(srows) == row_set(orows), name


def test_lsh_recall_vs_brute_force(spark):
    """ANN-LSH must recover most of the exact top-k (recall check)."""
    exact = REGISTRY["ann_cosine_topk"].spark_fn(spark, SF_DIR)
    lsh = REGISTRY["ann_lsh_topk"].spark_fn(spark, SF_DIR)
    e = {(r.q_id, r.c_id) for r in exact.collect()}
    l = {(r.q_id, r.c_id) for r in lsh.collect()}
    assert len(e) > 0
    recall = len(e & l) / len(e)
    assert recall >= 0.3, f"LSH recall too low: {recall}"


def test_minhash_finds_planted_near_dups(spark):
    jac = REGISTRY["dedup_ngram_jaccard"].spark_fn(spark, SF_DIR)
    mh = REGISTRY["dedup_minhash_lsh"].spark_fn(spark, SF_DIR)
    exact_pairs = {(r.doc_a, r.doc_b) for r in jac.collect()}
    mh_pairs = {(r.doc_a, r.doc_b) for r in mh.collect()}
    # LSH candidates verified with the same threshold: subset of exact
    assert mh_pairs <= exact_pairs
    if exact_pairs:
        high = {(r.doc_a, r.doc_b) for r in jac.filter("jaccard >= 0.9").collect()}
        assert len(mh_pairs & high) / max(len(high), 1) >= 0.8


def test_multimodal_plumbing(spark):
    from duckdb_httpd_log_spark.operators.multimodal import binary_table, extract_features

    bt = binary_table(spark, SF_DIR)
    assert dict(bt.dtypes)["payload"] == "binary"
    feats = extract_features(bt)
    rows = feats.orderBy("doc_id").limit(5).collect()
    assert all(r.n_bytes > 0 and len(r.digest) == 32 for r in rows)
    assert {r.kind for r in feats.collect()} <= {"image", "audio", "video"}


def test_ivf_recall_vs_brute_force(spark):
    """IVF probing 6/16 cells must still recover most of the exact top-k."""
    exact = REGISTRY["ann_cosine_topk"].spark_fn(spark, SF_DIR)
    ivf = REGISTRY["ann_ivf_topk"].spark_fn(spark, SF_DIR)
    e = {(r.q_id, r.c_id) for r in exact.collect()}
    i = {(r.q_id, r.c_id) for r in ivf.collect()}
    assert len(e) > 0
    recall = len(e & i) / len(e)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_embedding_dedup_pairs_verified(spark):
    """Every emitted pair is above threshold and deduplicated (a<b)."""
    pairs = REGISTRY["dedup_embedding"].spark_fn(spark, SF_DIR).collect()
    assert len(pairs) > 0
    assert all(r.vec_a < r.vec_b for r in pairs)
    assert all(r.cosine >= 0.4 for r in pairs)
    assert len({(r.vec_a, r.vec_b) for r in pairs}) == len(pairs)
