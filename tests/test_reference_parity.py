"""Parity tests against the reference's ACTUAL committed artifacts
(/root/reference, read-only data files — no code is used): our sources
parse its real outputs, and our evaluator reproduces an independently
computed P@k on its real dev predictions vs its real gold annotations.
"""

from __future__ import annotations

import csv
import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from kargo_spark import evaluation as E
from kargo_spark.io_formats import read_doccano_jsonl, read_relation_labels, read_terms_csv

REF = "/root/reference"
DEV_CSV_DIR = f"{REF}/results/extracted_terms/dev"
NEWS_JSONL = f"{REF}/data/annotations/terms/news.jsonl"
REL_LABELS = f"{REF}/data/annotations/relations/all_labels.json"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not present"
)


def test_read_terms_csv_parses_reference_outputs(spark):
    df = read_terms_csv(spark, f"{DEV_CSV_DIR}/kpm.csv")
    assert df.count() > 0
    per_doc = df.groupBy("doc_id").agg(F.max("rank").alias("mx"), F.count(F.lit(1)).alias("n"))
    rows = per_doc.collect()
    # get_n_best(15): at most 15 rank-ordered terms per doc, ranks dense 1..n
    assert all(r["mx"] <= 15 and r["mx"] == r["n"] for r in rows)


def test_read_doccano_parses_reference_gold(spark):
    raw_lines = sum(1 for _ in open(NEWS_JSONL))
    df = read_doccano_jsonl(spark, NEWS_JSONL, drop_irrelevant=True)
    kept = df.count()
    # reference gold has 223 rows; IRRELEVANT-marked docs must be dropped
    assert raw_lines == 223
    irrelevant = sum(
        1 for line in open(NEWS_JSONL)
        if any(l[2] == "IRRELEVANT" for l in json.loads(line).get("labels", []))
    )
    assert kept == raw_lines - irrelevant
    # doc_id fallback = md5(title)[-6:] (corpus.py:198-200)
    first = json.loads(open(NEWS_JSONL).readline())
    title = first["text"].split("|")[0]
    expect = hashlib.md5(title.encode()).hexdigest()[-6:]
    got = df.filter(F.col("text") == first["text"]).collect()
    if got:  # first line may itself be IRRELEVANT
        assert got[0]["doc_id"] == expect


def test_read_relation_labels_counts(spark):
    df = read_relation_labels(spark, REL_LABELS)
    counts = {r["dataset"]: r["n"] for r in
              df.groupBy("dataset").agg(F.count(F.lit(1)).alias("n")).collect()}
    # BASELINE.md: 1,278 labeled pairs each for dev and test
    assert counts["dev"] == 1278
    assert counts["test"] == 1278
    assert df.filter(~F.col("label").isin(0, 1)).count() == 0


def _gold_terms_from_jsonl():
    """Gold (doc_id, lowercased term) pairs from span annotations."""
    out = []
    for line in open(NEWS_JSONL):
        j = json.loads(line)
        labels = j.get("labels", [])
        if any(l[2] == "IRRELEVANT" for l in labels):
            continue
        doc_id = (j.get("meta") or {}).get("doc_id") or hashlib.md5(
            j["text"].split("|")[0].encode()
        ).hexdigest()[-6:]
        for b, e, _ in labels:
            out.append((doc_id, j["text"][b:e].lower()))
    return out


def _preds_from_csv(path, method):
    out = []
    with open(path) as f:
        for row in csv.DictReader(f):
            for rank, term in enumerate(row["terms"].split("|"), start=1):
                out.append((row["document_id"], method, rank, term))
    return out


def test_precision_at_k_matches_independent_computation(spark):
    """Our DataFrame evaluator vs a from-first-principles python P@k on the
    reference's real dev predictions (kpm.csv) and real gold terms."""
    gold_pairs = _gold_terms_from_jsonl()
    preds = _preds_from_csv(f"{DEV_CSV_DIR}/kpm.csv", "kpm")
    gold_df = spark.createDataFrame(gold_pairs, "doc_id string, term string")
    preds_df = spark.createDataFrame(
        preds, "doc_id string, method string, rank int, term string"
    )
    ours = {
        (r["doc_id"], r["k"]): r["precision"]
        for r in E.precision_at_k(preds_df, gold_df).collect()
    }
    # independent oracle
    gold_by_doc = {}
    for d, t in gold_pairs:
        gold_by_doc.setdefault(d, set()).add(t)
    checked = 0
    for doc in {p[0] for p in preds}:
        ranked = sorted((p for p in preds if p[0] == doc), key=lambda p: p[2])
        correct = 0
        for k, p in enumerate(ranked, start=1):
            if p[3].lower() in gold_by_doc.get(doc, set()):
                correct += 1
            if (doc, k) in ours:
                assert abs(ours[(doc, k)] - correct / k) < 1e-9
                checked += 1
    assert checked > 100  # real overlap between predictions and gold docs


def test_pooled_recall_on_reference_methods(spark):
    """Pooled relative recall across two real methods behaves: bounded by 1,
    and at every (doc,k) the best method's recall is 1 when it contains the
    whole pool."""
    gold_df = spark.createDataFrame(_gold_terms_from_jsonl(), "doc_id string, term string")
    preds = _preds_from_csv(f"{DEV_CSV_DIR}/kpm.csv", "kpm") + _preds_from_csv(
        f"{DEV_CSV_DIR}/tfidf.csv", "tfidf"
    )
    preds_df = spark.createDataFrame(preds, "doc_id string, method string, rank int, term string")
    rec = E.relative_recall_at_k(preds_df, gold_df)
    assert rec.filter((F.col("recall") < 0) | (F.col("recall") > 1.0 + 1e-9)).count() == 0
    # per (doc,k) the max recall across methods must be > 0 wherever any
    # method found anything (pool nonempty => someone holds part of it)
    mx = rec.groupBy("doc_id", "k").agg(F.max("recall").alias("mx"))
    assert mx.filter(F.col("mx") > 0).count() > 0


# --- north-star triple gate (BASELINE.md row 1: P/R >= 0.95) ---------------

DEV_SNLP = f"{REF}/data/processed/news/relevant/dev"
DEV_TERMS = f"{REF}/data/processed/news/relevant/dev_terms.csv"
DEV_REL_JSONL = f"{REF}/data/annotations/relations/dev_20200612.jsonl"


def _gold_pairs(jsonl_path: str = DEV_REL_JSONL):
    """The reference's emitted candidate pairs on a split corpus: every row
    of {split}_20200612.jsonl is one extraction (text = before__head__between__
    tail__after, meta = doc/sent/cooc ids) — 1,305 pairs over 53 dev docs,
    1,278 over the test docs."""
    rows = []
    for line in open(jsonl_path):
        r = json.loads(line)
        p = r["text"].split("__")
        rows.append(
            (r["meta"]["doc_id"], r["meta"]["sent_id"], r["meta"]["cooc_no"],
             p[1], p[3], p[2])
        )
    return rows


def test_corenlp_reader_parses_dev_corpus(spark):
    from kargo_spark.xml_io import read_corenlp_tokens

    toks = read_corenlp_tokens(spark, f"{DEV_SNLP}/*.xml")
    assert toks.select("doc_id").distinct().count() == 53
    # 11-attribute token record (SentenceParser.valid_attrs, corpus.py:41-44)
    for c in ("word", "lemma", "pos", "ner", "deprel", "deprel_head_id", "term_tag"):
        assert c in toks.columns
    # BIOES ner tags present
    assert toks.filter(F.col("ner").startswith("S-")).count() > 0


def test_corpus_xml_reader_counts(spark):
    """BASELINE.md row 1: train/dev/test relevant corpora = 557/53/52 docs."""
    from kargo_spark.xml_io import read_corpus_xml

    base = f"{REF}/data/processed/news/relevant"
    counts = {
        s: read_corpus_xml(spark, f"{base}/{s}.xml").count()
        for s in ("train", "dev", "test")
    }
    assert counts == {"train": 557, "dev": 53, "test": 52}
    d = read_corpus_xml(spark, f"{base}/dev.xml")
    row = d.filter(F.col("doc_id") == "44d783").collect()[0]
    assert "AirBridgeCargo" in row["title"]
    assert "PharmaPort 360" in row["content"]


def test_triple_gate_pair_extraction_exact(spark):
    """THE north-star gate: run the engine's reference-exact extraction
    (xml_io reader -> terms CSV source -> relations.reference_pairs) on the
    reference's own dev corpus and compare against its 1,305 emitted pairs.
    Requires P/R >= 0.95; the implementation achieves 1.0/1.0."""
    from kargo_spark.relations import reference_pairs
    from kargo_spark.xml_io import read_corenlp_tokens

    toks = read_corenlp_tokens(spark, f"{DEV_SNLP}/*.xml")
    terms = read_terms_csv(spark, DEV_TERMS)
    mine = {tuple(r) for r in reference_pairs(toks, terms).collect()}
    gold = set(_gold_pairs())  # (doc, sent, cooc_no, head, tail, in_between)
    tp = len(mine & gold)
    precision = tp / len(mine)
    recall = tp / len(gold)
    assert len(gold) == 1305
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0  # exact parity, not just the gate


def test_triple_gate_pair_extraction_exact_test_split(spark):
    """The same north-star gate on the HELD-OUT test split (r04 verdict
    next-step #4): 1,278 labeled pairs over the test corpus.

    Reference data quirk, verified by inspection: the test labels cover 53
    docs but the shipped test corpus (test/ dir AND test.xml) has 52 — doc
    40aca4's test-label pairs were produced from a DIFFERENT revision of
    that article than the 40aca4.xml shipped under dev/ (different
    sentence segmentation, 'optimised' vs 'optimized', reworded lead), so
    those 23 pairs are not reproducible from any shipped input. The
    BASELINE gate (>= 0.95) clears on the FULL 1,278 gold anyway; on the
    52 reproducible docs the engine is exact (P = R = 1.0), same as dev."""
    from kargo_spark.relations import reference_pairs
    from kargo_spark.xml_io import read_corenlp_tokens

    toks = read_corenlp_tokens(
        spark, f"{REF}/data/processed/news/relevant/test/*.xml"
    )
    terms = read_terms_csv(
        spark, f"{REF}/data/processed/news/relevant/test_terms.csv"
    )
    mine = {tuple(r) for r in reference_pairs(toks, terms).collect()}
    gold = set(
        _gold_pairs(f"{REF}/data/annotations/relations/test_20200612.jsonl")
    )
    assert len(gold) == 1278
    tp = len(mine & gold)
    assert tp / len(mine) >= 0.95 and tp / len(gold) >= 0.95  # the gate
    # exactness on the reproducible subset + the quirk pinned precisely:
    # every miss is the one unshipped doc revision, nothing else
    present_docs = {r["doc_id"] for r in toks.select("doc_id").distinct().collect()}
    assert len(present_docs) == 52 and "40aca4" not in present_docs
    gold_present = {g for g in gold if g[0] in present_docs}
    assert mine == gold_present  # P = R = 1.0 on all shipped test docs
    assert {g[0] for g in gold - gold_present} == {"40aca4"}


def test_triple_gate_triples_vs_reference(spark):
    """Same gate at the (subj, pred, obj) level through the engine's triple
    builder + evaluation.triple_precision_recall (BASELINE.json metric)."""
    from kargo_spark.relations import reference_pairs, reference_triples
    from kargo_spark.xml_io import read_corenlp_tokens

    toks = read_corenlp_tokens(spark, f"{DEV_SNLP}/*.xml")
    terms = read_terms_csv(spark, DEV_TERMS)
    pred = reference_triples(reference_pairs(toks, terms))
    gold_rows = [(h, "related_to", t) for _, _, _, h, t, _ib in _gold_pairs()]
    gold = spark.createDataFrame(gold_rows, "subj string, pred string, obj string")
    res = E.triple_precision_recall(pred, gold).collect()[0]
    assert res["precision"] >= 0.95 and res["recall"] >= 0.95


def test_pipeline_end_to_end_on_reference_corpus(spark):
    """Full engine pipeline over the reference's REAL dev corpus XML:
    read_corpus_xml -> north-rule input shape -> run_pipeline -> triples.
    Closes the 'parity suites can't start from the reference's actual
    corpora' gap (r01 What's-missing #3)."""
    from kargo_spark.pipeline import run_pipeline
    from kargo_spark.xml_io import read_corpus_xml

    d = read_corpus_xml(spark, f"{REF}/data/processed/news/relevant/dev.xml")
    src = d.select(
        F.lit("aircargo-news").alias("repo"),
        F.concat(F.lit("news/"), "doc_id", F.lit(".xml")).alias("path"),
        F.sha1(F.col("doc_id")).alias("commit"),
        F.lit("en").alias("lang"),
        F.concat_ws("\n", "title", "content").alias("content"),
    )
    out = run_pipeline(
        spark, src, None, ranker="tfidf", n_terms=10,
        cluster_relations=False, linking=False, resume=False,
    )
    assert out["docs_clean"].count() == 53
    triples = out["triples"].collect()
    assert len(triples) > 100
    # real cargo-domain terms should surface as triple arguments
    args = {r["subj"] for r in triples} | {r["obj"] for r in triples}
    assert any("cargo" in a for a in args)
