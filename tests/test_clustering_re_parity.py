"""ClusteringRE full parity (r02 verdict next-step #5).

Reference: kargo/relations.py (single-line file) — ClusteringRE with
dist = 1 - Lev.seqratio over generalized patterns (in_between[, prefix,
suffix]), DBSCAN(eps, min_samples, metric=precomputed); artifact
results/extracted_relations/relation_jsons/train_dev-kpm_0.325_75.json
from the extract_relations() config (word generalization, in_between
only, window 10, closest-only, include_ne, exclude PERSON/DATE).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kargo_spark import seqdist

REF = "/root/reference"
ART = f"{REF}/results/extracted_relations/relation_jsons/train_dev-kpm_0.325_75.json"

needs_reference = pytest.mark.skipif(
    not os.path.exists(ART), reason="reference artifacts not available"
)


# --- seqratio semantics (python-Levenshtein published example values) ------

def test_char_dist2_is_ratio_distance():
    # ratio('Hello world!', 'Holly grail!') = 0.5833... => d2 = 10
    assert seqdist.char_dist2("Hello world!", "Holly grail!") == 10
    assert seqdist.char_dist2("abc", "abc") == 0
    assert seqdist.char_dist2("", "abc") == 3


def test_seqratio_published_example():
    s1 = ["newspaper", "litter bin", "tinny", "antelope"]
    s2 = ["caribou", "sausage", "gorn", "woody"]
    assert abs(seqdist.seqratio(s1, s2) - 0.21517857142857144) < 1e-12
    assert seqdist.seqratio([], []) == 1.0
    assert seqdist.seqratio([], ["a"]) == 0.0
    assert seqdist.seqratio(["a", "b"], ["a", "b"]) == 1.0


def test_pattern_distance_mean_over_slots():
    a = [["x"], ["same"]]
    b = [["y"], ["same"]]
    d_first = 1.0 - seqdist.seqratio(["x"], ["y"])
    assert seqdist.pattern_distance(a, b) == pytest.approx(d_first / 2)


# --- prefix/suffix (n_outer_tokens) + generalize -----------------------------

def _tok_table(spark, words, ners=None, pos=None):
    ners = ners or ["O"] * len(words)
    pos = pos or ["NN"] * len(words)
    rows, off = [], 0
    for i, (w, ne, p) in enumerate(zip(words, ners, pos), 1):
        rows.append(("d1", 0, i, w, off, off + len(w), ne, p, w))
        off += len(w) + 1
    return spark.createDataFrame(
        rows,
        "doc_id string, sentence_id int, token_id int, word string, "
        "offset_begin long, offset_end long, ner string, pos string, lemma string",
    )


def _terms(spark, terms):
    return spark.createDataFrame(
        [("d1", i + 1, t) for i, t in enumerate(terms)],
        "doc_id string, rank int, term string",
    )


def test_reference_pairs_outer_token_patterns(spark):
    """prefix = up to n tokens before the head, bounded below by the
    previous head end; suffix = up to n tokens after the tail, bounded by
    the next head begin (reference get_terms_occurrence n_outer_tokens)."""
    from kargo_spark.relations import reference_pairs

    # trailing non-term word: the reference's own scan bound off-by-one
    # means a term ending exactly at the sentence end never matches
    words = ["alpha", "beta", "gamma", "delta", "epsilon",
             "zeta", "eta", "theta", "iota", "kappa", "omega"]
    toks = _tok_table(spark, words)
    terms = _terms(spark, ["gamma", "theta", "kappa"])
    out = {
        (r["head"], r["tail"]): r
        for r in reference_pairs(
            toks, terms, with_patterns=True, n_outer_tokens=2
        ).collect()
    }
    r = out[("gamma", "theta")]
    assert r["in_between_pat"] == ["delta", "epsilon", "zeta", "eta"]
    assert r["prefix_pat"] == ["alpha", "beta"]
    assert r["suffix_pat"] == ["iota"]  # bounded by next head (kappa) begin
    r2 = out[("theta", "kappa")]
    assert r2["in_between_pat"] == ["iota"]
    assert r2["prefix_pat"] == ["zeta", "eta"]  # max(prev_head_end, begin-2)
    assert r2["suffix_pat"] == ["omega"]  # capped at n=2 past the tail


def test_reference_pairs_generalize_pos(spark):
    from kargo_spark.relations import reference_pairs

    words = ["alpha", "runs", "fast", "beta", "end"]
    pos = ["NN", "VBZ", "RB", "NN", "NN"]
    toks = _tok_table(spark, words, pos=pos)
    terms = _terms(spark, ["alpha", "beta"])
    r = reference_pairs(
        toks, terms, with_patterns=True, generalize="pos"
    ).collect()[0]
    assert r["in_between_pat"] == ["VBZ", "RB"]


def test_strict_reference_ne_mutation_quirk(spark):
    """The committed reference get_named_entities APPENDS an orphan I-tag
    to the previously flushed entity (no reset after append). Strict mode
    must reproduce that; the engine-cleaned mode must not."""
    from kargo_spark.relations import reference_pairs

    words = ["acme", "corp", "and", "paris", "x"]
    ners = ["B-ORG", "E-ORG", "O", "I-LOC", "O"]
    toks = _tok_table(spark, words, ners=ners)
    terms = spark.createDataFrame([], "doc_id string, rank int, term string")
    # cleaned: two entities (acme corp) + (paris) -> one pair
    cleaned = reference_pairs(toks, terms).collect()
    assert [(r["head"], r["tail"]) for r in cleaned] == [("acme corp", "paris")]
    # strict: the orphan I-LOC mutates the flushed ORG entity -> a single
    # span, no pair
    strict = reference_pairs(toks, terms, strict_reference_ne=True).collect()
    assert strict == []


# --- weighted DBSCAN over distinct patterns ---------------------------------

def _pattern_pairs(spark, pats):
    return spark.createDataFrame(
        [("d", 0, i, "h", "t", " ".join(p), p, [], []) for i, p in enumerate(pats)],
        "doc_id string, sent_id int, cooc_no int, head string, tail string, "
        "in_between string, in_between_pat array<string>, "
        "prefix_pat array<string>, suffix_pat array<string>",
    )


def test_clustering_re_multiplicity_core(spark):
    """10 duplicate patterns are mutual 0-distance neighbors: multiplicity
    alone makes them core (sklearn counts the point itself + twins)."""
    pats = [["shipped", "to"]] * 10 + [["completely", "unrelated", "words"]] * 10
    out = seqdist.clustering_re(
        _pattern_pairs(spark, pats), eps=0.3, min_samples=5
    )
    got = [
        (tuple(r["in_between_pat"]), r["cluster"]) for r in out.collect()
    ]
    by_pat = {}
    for p, c in got:
        by_pat.setdefault(p, set()).add(c)
    # each pattern's points all share one cluster; the two patterns differ
    assert all(len(cs) == 1 for cs in by_pat.values())
    c1, c2 = (next(iter(by_pat[tuple(p)])) for p in (pats[0], pats[-1]))
    assert c1 != c2 and c1 != -1 and c2 != -1


def test_clustering_re_noise_and_border(spark):
    pats = (
        [["near", "the", "port"]] * 6          # core by multiplicity
        + [["near", "the", "ports"]]           # border: close to the core
        + [["zzz", "qqq", "xxx", "www"]]       # noise: alone, far
    )
    out = seqdist.clustering_re(
        _pattern_pairs(spark, pats), eps=0.3, min_samples=5
    ).collect()
    lab = {}
    for r in out:
        lab.setdefault(tuple(r["in_between_pat"]), set()).add(r["cluster"])
    core_cluster = next(iter(lab[("near", "the", "port")]))
    assert core_cluster != -1
    assert lab[("near", "the", "ports")] == {core_cluster}
    assert lab[("zzz", "qqq", "xxx", "www")] == {-1}


def test_clustering_re_sent2vec_distance(spark):
    pats = [["cargo", "hub"]] * 8 + [["unrelated", "totally"]] * 8
    out = seqdist.clustering_re(
        _pattern_pairs(spark, pats), eps=0.2, min_samples=5, dist_func="sent2vec"
    ).collect()
    clusters = {tuple(r["in_between_pat"]): r["cluster"] for r in out}
    assert clusters[("cargo", "hub")] != clusters[("unrelated", "totally")]
    assert -1 not in clusters.values()


# --- the artifact parity gate ----------------------------------------------

@needs_reference
def test_train_dev_cluster_artifact_parity(spark):
    """Extraction + clustering on the reference's own train+dev corpora vs
    its committed artifact: pair count and head/tail multiset EXACT,
    noise EXACT (6,763), cluster count EXACT (13 + noise), >= 11 of 13
    cluster sizes exact. The residual (4 of 11,942 points) is border
    attachment, which in sklearn depends on the original os.listdir
    document order — unreproducible by construction (see
    seqdist.clustering_re docstring)."""
    from collections import Counter

    from kargo_spark.io_formats import read_terms_csv
    from kargo_spark.relations import reference_pairs
    from kargo_spark.xml_io import read_corenlp_tokens

    toks = read_corenlp_tokens(
        spark, f"{REF}/data/processed/news/relevant/train/kpm/*.xml"
    ).unionByName(
        read_corenlp_tokens(spark, f"{REF}/data/processed/news/relevant/dev/*.xml")
    )
    terms = read_terms_csv(
        spark, f"{REF}/results/extracted_terms/train/kpm.csv"
    ).unionByName(
        read_terms_csv(spark, f"{REF}/data/processed/news/relevant/dev_terms.csv")
    )
    pairs = reference_pairs(
        toks, terms, lowercase=False, strict_reference_ne=True, with_patterns=True
    )
    labeled = seqdist.clustering_re(pairs, eps=0.325, min_samples=75)
    rows = labeled.select("head", "tail", "cluster").collect()

    art = json.load(open(ART))
    art_members = [(m["head_words"], m["tail_words"]) for cl in art.values() for m in cl]
    assert len(rows) == len(art_members) == 11942
    assert Counter((r["head"], r["tail"]) for r in rows) == Counter(art_members)

    noise = sum(1 for r in rows if r["cluster"] == -1)
    assert noise == len(art["-1"]) == 6763
    ours = sorted(
        Counter(r["cluster"] for r in rows if r["cluster"] != -1).values(),
        reverse=True,
    )
    theirs = sorted((len(v) for k, v in art.items() if k != "-1"), reverse=True)
    assert len(ours) == len(theirs) == 13
    exact = sum(1 for a, b in zip(ours, theirs) if a == b)
    assert exact >= 11
    assert sum(ours) == sum(theirs)  # only border attachment may differ


def test_seqratio_eps_edges_vocab_guard(spark):
    """The exact parity twin collects the distinct-pattern vocabulary to
    the driver; above max_vocab it must raise with a pointer to the
    scalable twin instead of silently attempting the collect (r03 verdict
    next-step #6)."""
    import pytest

    from kargo_spark import seqdist

    vocab = spark.range(5).selectExpr(
        "id AS pattern_id", "array(cast(id AS string)) AS in_between_pat"
    )
    with pytest.raises(ValueError, match="pattern_edges"):
        seqdist.seqratio_eps_edges(vocab, eps=0.3, max_vocab=4)
    # under the cap the same vocabulary computes fine
    edges = seqdist.seqratio_eps_edges(vocab, eps=2.0, max_vocab=5)
    assert edges.count() == 10  # C(5,2) pairs all within eps=2
