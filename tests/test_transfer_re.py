"""TransferRE-parity supervised relation typing (reference kargo/relations.py
``class TransferRE``): batch inference stage over (text, head span, tail
span) with a probability threshold — stub-model determinism, span slicing,
strict-mode integration point, bounded by-type rollup."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from kargo_spark import transfer_re as tre


def _pairs(spark):
    rows = [
        (1, 0, 0, "acme corp operates the main hub", 0, 9, 23, 31),
        (1, 0, 1, "acme corp operates the main hub", 10, 18, 23, 31),
        (2, 3, 0, "cargo moves through rotterdam port", 0, 5, 20, 34),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, sent_id int, cooc_no int, text string, "
        "head_begin long, head_end long, tail_begin long, tail_end long",
    )


def _expected(text, hb, he, tb, te):
    dg = hashlib.md5(f"{text}|{hb}:{he}|{tb}:{te}".encode()).hexdigest()
    rel = tre.RELATION_INVENTORY[int(dg[:8], 16) % len(tre.RELATION_INVENTORY)]
    prob = (int(dg[8:16], 16) % 10000) / 10000.0
    return rel, prob


def test_stub_model_deterministic_and_md5_derived():
    batch = pd.DataFrame(
        {
            "text": ["acme corp operates the main hub"],
            "head_begin": [0], "head_end": [9],
            "tail_begin": [23], "tail_end": [31],
        }
    )
    rels, probs = tre.stub_relation_model(batch)
    rel, prob = _expected("acme corp operates the main hub", 0, 9, 23, 31)
    assert rels[0] == rel and probs[0] == prob
    rels2, probs2 = tre.stub_relation_model(batch)
    assert rels[0] == rels2[0] and probs[0] == probs2[0]


def test_transfer_re_threshold_and_spans(spark):
    out = tre.transfer_re(_pairs(spark), prob_threshold=0.0).collect()
    assert len(out) == 3
    by_key = {(r["doc_id"], r["cooc_no"], r["sent_id"]): r for r in out}
    r = by_key[(1, 0, 0)]
    rel, prob = _expected("acme corp operates the main hub", 0, 9, 23, 31)
    assert r["relation"] == rel and r["prob"] == prob
    assert r["head_words"] == "acme corp" and r["tail_words"] == "main hub"
    # threshold filters exactly the rows whose stub prob falls below it
    probs = {k: v["prob"] for k, v in by_key.items()}
    cut = sorted(probs.values())[1]
    kept = {
        (r["doc_id"], r["cooc_no"], r["sent_id"])
        for r in tre.transfer_re(_pairs(spark), prob_threshold=cut).collect()
    }
    assert kept == {k for k, p in probs.items() if p >= cut}


def test_transfer_re_strict_raises(spark):
    with pytest.raises(NotImplementedError, match="opennre"):
        tre.transfer_re(_pairs(spark), strict=True)


def test_transfer_re_custom_model(spark):
    """The model slot accepts any batch scorer with the stub contract."""
    import numpy as np

    def fixed(batch):
        n = len(batch)
        return np.array(["uses"] * n, dtype=object), np.full(n, 0.9)

    out = tre.transfer_re(_pairs(spark), model=fixed, prob_threshold=0.5).collect()
    assert len(out) == 3 and all(r["relation"] == "uses" for r in out)


def test_relations_by_type_bounded(spark):
    typed = tre.transfer_re(_pairs(spark), prob_threshold=0.0)
    roll = tre.relations_by_type(typed, max_members=1).collect()
    assert sum(r["support"] for r in roll) == 3
    assert all(len(r["members"]) <= 1 for r in roll)


def test_locate_spans_glue(spark):
    pairs = spark.createDataFrame(
        [
            (1, 0, 0, "the acme hub links the big port", "acme hub", "big port"),
            (1, 0, 1, "nothing matches here", "absent", "also absent"),
        ],
        "doc_id long, sent_id int, cooc_no int, context string, head string, tail string",
    )
    out = tre.locate_spans(pairs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["text"][r["head_begin"]:r["head_end"]] == "acme hub"
    assert r["text"][r["tail_begin"]:r["tail_end"]] == "big port"
    # end-to-end into the typed stage
    typed = tre.transfer_re(tre.locate_spans(pairs), prob_threshold=0.0).collect()
    assert len(typed) == 1 and typed[0]["head_words"] == "acme hub"


def test_sample_relations_stratified_seeded(spark):
    from kargo_spark.io_formats import sample_relations_to_annotate

    rows = spark.createDataFrame(
        [(f"t{i}", "dev" if i % 2 else "test", "YES" if i % 3 else "NO")
         for i in range(60)],
        "text string, dataset string, label string",
    )
    s1 = {r["text"] for r in sample_relations_to_annotate(rows, 0.2).collect()}
    s2 = {r["text"] for r in sample_relations_to_annotate(rows, 0.2).collect()}
    assert s1 == s2 and len(s1) > 0
    # per-stratum rate: ceil(0.2 * n) rows each
    import math
    from collections import Counter

    strata = Counter((r["dataset"], r["label"]) for r in rows.collect())
    got = Counter(
        (r["dataset"], r["label"])
        for r in sample_relations_to_annotate(rows, 0.2).collect()
    )
    for k, n in strata.items():
        assert got[k] == math.ceil(0.2 * n)
