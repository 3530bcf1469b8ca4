"""dedup_cdc_chunks: the content-defined-boundary property that
justifies the operator — a single token INSERTION redraws only the
chunk it lands in, so the rest of a modified document still dedups
against the original. A fixed-grid chunker (text_window_dedup's
8-token windows) shifts every downstream window instead, losing all
matches after the edit point."""

import os
import tempfile

from pyspark.sql import functions as F

from duckdb_httpd_log_spark.operators.textops import CDC_MOD, dedup_cdc_chunks


def _write_docs(spark, rows, d):
    spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))


def test_insertion_robustness(spark):
    # a long pseudo-random token stream; the copy inserts ONE token in
    # the middle
    base = " ".join(f"tk{(i * 2654435761) % 9973}" for i in range(1500))
    toks = base.split(" ")
    mid = len(toks) // 2
    edited = " ".join(toks[:mid] + ["INSERTED"] + toks[mid:])
    with tempfile.TemporaryDirectory() as td:
        _write_docs(spark, [(0, base), (1, edited)], td)
        out = {r.doc_id: r for r in dedup_cdc_chunks(spark, td).collect()}
    # both docs chunked to ~len/CDC_MOD chunks
    assert out[0].n_chunks >= 1500 // CDC_MOD // 2
    # the edit invalidates at most the one chunk containing the
    # insertion point (boundaries elsewhere are content-defined, so
    # they re-align immediately): every other chunk matches across docs
    for d in (0, 1):
        assert out[d].n_chunks - out[d].n_dup_chunks <= 1, out[d]
    # and the share column reflects near-total overlap
    assert out[0].dup_frac_e4 >= 9000


def test_unrelated_docs_share_nothing(spark):
    a = " ".join(f"aa{i}" for i in range(400))
    b = " ".join(f"bb{i}" for i in range(400))
    with tempfile.TemporaryDirectory() as td:
        _write_docs(spark, [(0, a), (1, b)], td)
        out = {r.doc_id: r for r in dedup_cdc_chunks(spark, td).collect()}
    assert out[0].n_dup_chunks == 0
    assert out[1].n_dup_chunks == 0
    assert out[0].dup_frac_e4 == 0


def test_fixed_grid_loses_after_edit_cdc_does_not(spark):
    # the comparative claim in the docstring: after a mid-doc insertion
    # the fixed 8-token grid loses (almost) all downstream matches,
    # CDC keeps them
    from duckdb_httpd_log_spark.operators.textops import text_window_dedup

    base = " ".join(f"tk{(i * 48271) % 7919}" for i in range(1200))
    toks = base.split(" ")
    edited = " ".join(toks[:9] + ["X"] + toks[9:])  # insertion near the head
    with tempfile.TemporaryDirectory() as td:
        _write_docs(spark, [(0, base), (1, edited)], td)
        cdc = {r.doc_id: r for r in dedup_cdc_chunks(spark, td).collect()}
        grid = {r.doc_id: r for r in text_window_dedup(spark, td).collect()}
    # grid: only the window(s) before the edit can match -> tiny share
    assert grid[0].n_shared <= 2
    # cdc: all but ~one chunk still match
    assert cdc[0].n_chunks - cdc[0].n_dup_chunks <= 1
