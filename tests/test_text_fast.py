"""Fast-path parity: Arrow/numpy hash implementations vs the Catalyst
spec formulation of functions/text.py — bit-identical, per doc."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions import text as X
from crawler_spark.functions import text_fast as XF

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    d.persist().count()
    return d


def test_poly_hash_parity(spark, docs):
    got = docs.select(
        "doc_id",
        X.poly_hash(F.col("text")).alias("spec"),
        XF.poly_hash_fast(F.col("text")).alias("fast"),
    ).collect()
    for r in got:
        assert r["spec"] == r["fast"], r["doc_id"]


def test_minhash_parity(spark, docs):
    spec_sh = F.transform(X.shingles(F.col("text"), 3), lambda s: X.poly_hash_str(s))
    spec_cols = [X.minhash_col(spec_sh, i).alias(f"s{i}") for i in range(8)]
    got = docs.select(
        "doc_id", *spec_cols, XF.minhash8_fast(F.col("text")).alias("fast")
    ).collect()
    for r in got:
        spec = [r[f"s{i}"] for i in range(8)]
        if spec[0] is None:
            assert r["fast"] is None
        else:
            assert spec == list(r["fast"]), r["doc_id"]


def test_simhash_parity(spark, docs):
    got = docs.select(
        "doc_id",
        X.simhash32(F.col("text")).alias("spec"),
        XF.simhash32_fast(F.col("text")).alias("fast"),
    ).collect()
    for r in got:
        assert r["spec"] == r["fast"], r["doc_id"]


def test_shingles_parity(spark, docs):
    got = docs.select(
        "doc_id",
        X.shingles(F.col("text"), 3).alias("spec"),
        XF.shingles_fast(F.col("text")).alias("fast"),
    ).collect()
    for r in got:
        assert list(r["spec"]) == list(r["fast"]), r["doc_id"]


def test_poly_hash_py_edges():
    assert XF.poly_hash_py("") == 0
    # manual fold check
    s = "ab"
    want = ((0 * 131 + ord("a")) * 131 + ord("b")) % X.MOD
    assert XF.poly_hash_py(s) == want


def test_batch_vectorized_edges():
    """The whole-batch numpy paths vs the per-row reference helpers on a
    hostile mixed batch: None, empty, <k tokens, unicode, punctuation."""
    import pandas as pd

    batch = pd.Series([
        None, "", "one", "one two", "one two three",
        "The  quick  BROWN fox!! 42 jumps-over the lazy dog",
        "héllo wörld ünicode 中文 text here now",
        "a b c d e f g", "  ", "x" * 500,
        "same same same same same",
    ])
    mh = XF._batch_minhash8(batch)
    sh = XF._batch_simhash32(batch)
    ph = XF._batch_poly_hash(batch)
    for i, x in enumerate(batch):
        if x is None:
            assert mh[i] is None and sh[i] is None and ph[i] is None
            continue
        assert mh[i] == XF.minhash8_py(x), (i, x)
        assert sh[i] == XF.simhash32_py(x), (i, x)
        assert ph[i] == XF.poly_hash_py(x), (i, x)


def test_shingle_hash_sets_parity(spark, docs):
    """Distinct shingle-hash sets (LSH exact-verify payload) vs the
    Catalyst spec: array_distinct of poly_hash over shingles, compared
    as sets (the fast path pins ascending order)."""
    spec = F.array_distinct(
        F.transform(X.shingles(F.col("text"), 3),
                    lambda s: X.poly_hash_str(s))
    )
    got = docs.select(
        "doc_id", spec.alias("spec"),
        XF.shingle_hash_sets_fast(F.col("text")).alias("fast"),
    ).collect()
    for r in got:
        assert sorted(r["spec"]) == list(r["fast"]), r["doc_id"]
        assert list(r["fast"]) == sorted(r["fast"])  # pinned order
