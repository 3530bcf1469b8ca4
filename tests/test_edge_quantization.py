"""Oracle parity on a corpus ENGINEERED to land on quantization ties.

Every red CORRECTNESS row in rounds 1-4 was a ratio/rounded double
whose value sat exactly on a round(,4) half-way boundary, where
round()'s tie behavior is engine-build-specific. The floor-form sweep
(floor(x*10^k + 0.5)/10^k, registry.fround) makes ties resolve
identically by construction — this suite proves it on data built to
maximize tie density instead of waiting for one to occur naturally:

- 160 docs split 1/3/5/151 across four langs: every doc_frac in
  text_mix_weights hits n/160 * 1e4 = 62.5*n with n odd — an EXACT
  half-way boundary at the 4-decimal quantization scale;
- a doc pair sharing 62 of 64 trigrams: the later doc's novelty is
  2/64, and 2/64 * 1e4 = 312.5 — again an exact tie
  (text_ngram_novelty's r4 red was precisely this shape).

The tie-ness itself is asserted (x * 2e4 must be an odd integer), so
the fixture cannot silently stop exercising the boundary.
"""

import duckdb
import pytest

import duckdb_httpd_log_spark.operators  # noqa: F401
from duckdb_httpd_log_spark.plans.registry import REGISTRY

from .oracle_check import row_set


def _docs():
    rows = []
    for i in range(160):
        if i == 10:
            # 66 unique tokens -> 64 distinct trigrams, first owner of all
            text = " ".join(f"x{j}" for j in range(66))
        elif i == 11:
            # same run with the last TWO tokens replaced: 62 shared
            # trigrams + 2 novel -> novelty = 2/64, an exact .5 tie at 1e4
            text = " ".join(f"x{j}" for j in range(64)) + " zz1 zz2"
        else:
            text = f"doc {i} has some plain tie corpus filler content w{i} w{i + 1}"
        if i == 0:
            lang = "aa"
        elif i <= 3:
            lang = "bb"
        elif i <= 8:
            lang = "cc"
        else:
            lang = "dd"
        src = "srcA" if i % 2 == 0 else "srcB"
        rows.append((i, text, lang, src, len(text)))
    return rows


# ratio/quantization-emitting document queries most exposed to ties
_QUERIES = [
    "text_mix_weights",
    "text_ngram_novelty",
    "text_token_entropy",
    "text_repetition",
    "text_quality",
    "text_quality_rules",
    "shard_assign",
    "curriculum_bins",
    "text_ccnet_bucket",
    "dedup_rate_by_source",
    "text_quality_by_source",
    "token_hapax_rate",
    "text_len_quartiles_by_lang",
    "corpus_shard_balance",
    "text_token_len_hist",
]


@pytest.fixture(scope="module")
def tie_dir(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("tie_sf")
    df = spark.createDataFrame(
        _docs(), "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def _duck(tie_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tie_dir}/documents.parquet/*.parquet')"
    )
    return con


def test_fixture_actually_ties(spark, tie_dir):
    """doc_frac and novelty must sit EXACTLY on .5 quantization
    boundaries (x * 2e4 an odd integer) — else this suite tests nothing."""
    mw = {r.lang: r.n_docs for r in REGISTRY["text_mix_weights"].spark_fn(spark, tie_dir).collect()}
    assert mw == {"aa": 1, "bb": 3, "cc": 5, "dd": 151}
    for n in mw.values():
        v = n / 160 * 2e4
        assert v == int(v) and int(v) % 2 == 1, n
    nov = {
        r.doc_id: (r.n_novel, r.n_grams)
        for r in REGISTRY["text_ngram_novelty"].spark_fn(spark, tie_dir).collect()
        if r.doc_id in (10, 11)
    }
    assert nov[10] == (64, 64)
    assert nov[11] == (2, 64)
    v = 2 / 64 * 2e4
    assert v == int(v) and int(v) % 2 == 1


@pytest.mark.parametrize("name", _QUERIES)
def test_tie_corpus_oracle_parity(spark, tie_dir, name):
    qd = REGISTRY[name]
    sdf = qd.spark_fn(spark, tie_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    orel = _duck(tie_dir).execute(qd.oracle_sql)
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
