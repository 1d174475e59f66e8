"""Corpus-layer parity tests (reference tests/test_corpus.py semantics:
exact-count assertions on dedup / filter_empty / sampling / split)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kargo_spark import corpus
from kargo_spark.synth import synth_documents


def test_synth_deterministic(spark):
    a = synth_documents(spark, n_rows=50).collect()
    b = synth_documents(spark, n_rows=50).collect()
    assert a == b


def test_unicodify_replaces_curly_quotes(spark):
    df = spark.createDataFrame([("“x” ‘y’\nz",)], "content string")
    out = corpus.unicodify(df).collect()[0]["content"]
    assert out == '"x" \'y\' z'


def test_doc_id_is_md5_suffix(spark):
    df = spark.createDataFrame(
        [("r", "p", "c", "md", "body")], "repo string, path string, commit string, lang string, content string"
    )
    row = corpus.with_doc_id(df).collect()[0]
    import hashlib

    expect = hashlib.md5(b"r/p@c").hexdigest()[-6:]
    assert row["doc_id"] == expect


def test_filter_empty_and_dedup_counts(spark):
    docs = synth_documents(spark, n_rows=100)
    n_empty = docs.filter(F.length(F.trim("content")) == 0).count()
    assert n_empty > 0
    clean = corpus.docs_clean(docs)
    assert clean.filter(F.length(F.trim("content")) == 0).count() == 0
    # duplicates collapse to one row
    dups = clean.groupBy("repo", "path", "commit").count().filter("count > 1").count()
    assert dups == 0


def test_content_sha_stable(spark):
    docs = corpus.docs_clean(synth_documents(spark, n_rows=20))
    a = {r["doc_id"]: r["content_sha"] for r in docs.collect()}
    b = {r["doc_id"]: r["content_sha"] for r in corpus.docs_clean(synth_documents(spark, n_rows=20)).collect()}
    assert a == b


def test_seeded_sample_deterministic_and_excludes(spark):
    docs = corpus.docs_clean(synth_documents(spark, n_rows=60))
    s1 = {r["doc_id"] for r in corpus.seeded_sample(docs, 5, seed=7).select("doc_id").collect()}
    s2 = {r["doc_id"] for r in corpus.seeded_sample(docs, 5, seed=7).select("doc_id").collect()}
    assert s1 == s2 and len(s1) == 5
    excl = docs.select("doc_id").limit(10)
    s3 = {r["doc_id"] for r in corpus.seeded_sample(docs, 5, seed=7, exclude_ids=excl).select("doc_id").collect()}
    banned = {r["doc_id"] for r in excl.collect()}
    assert not (s3 & banned)


def test_train_test_split_exact_counts(spark):
    docs = corpus.docs_clean(synth_documents(spark, n_rows=60))
    n = docs.count()
    dev, test = corpus.train_test_split(docs, test_size=0.5, seed=1337)
    assert dev.count() == n // 2
    assert dev.count() + test.count() == n
    # disjoint
    assert dev.join(test, "doc_id", "inner").count() == 0


def test_hash_split_stable(spark):
    docs = corpus.docs_clean(synth_documents(spark, n_rows=60))
    a1, b1 = corpus.hash_split(docs, "doc_id", 50)
    a2, b2 = corpus.hash_split(docs, "doc_id", 50)
    assert a1.count() == a2.count()
    assert a1.count() + b1.count() == docs.count()
