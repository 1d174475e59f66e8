"""Open relation extraction: ``terms_topk -> mentions -> pairs -> triples``.

The reference's relation module was lost (kargo/relations.py is empty);
semantics are reconstructed from its emitted artifacts (SURVEY.md §1 D6,
§2.3): per sentence, adjacent ranked-term mentions pair into
(head, in_between_words, tail) with a per-sentence ``cooc_no`` ordinal
(meta.cooc_no in data/annotations/relations/dev_20200612.jsonl), and the
final triple store is deduplicated (subj, pred, obj) with provenance.

Everything here is windows + joins — no UDFs:

* mentions  = candidate occurrences semi-joined to the per-doc top-k terms,
  first occurrence per (doc, sentence, term) only (reference
  corpus.py:102-111 matches only the first occurrence).
* pairs     = lead() over mentions ordered by begin offset.
* in-between words = array slice of the sentence's token array.
* triples   = groupBy (subj, pred, obj) with support count + provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mentions(cands: DataFrame, topk: DataFrame) -> DataFrame:
    """Occurrences of top-k terms, first per (doc, sentence, term).

    The semi-join side (topk) is k-per-doc — tiny relative to occurrences —
    but shares the doc_id key, so Catalyst shuffles both on (doc_id, ngram);
    with AQE the small side broadcast-joins when it fits.
    """
    keys = topk.select("doc_id", F.col("ngram").alias("lemma_term")).distinct()
    occ = cands.join(keys, ["doc_id", "lemma_term"], "left_semi")
    w = Window.partitionBy("doc_id", "sentence_id", "lemma_term").orderBy("offset_begin")
    return (
        occ.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def pairs(mention_df: DataFrame, sentences: DataFrame | None = None) -> DataFrame:
    """Adjacent-mention pairing per sentence with cooc_no ordinal.

    Output: (doc_id, sentence_id, cooc_no, head, tail, head_tok_end,
    tail_tok_begin, in_between_words?).
    """
    w = Window.partitionBy("doc_id", "sentence_id").orderBy("offset_begin", "tok_begin")
    p = (
        mention_df.select(
            "doc_id", "sentence_id",
            F.col("term").alias("head"),
            F.col("lemma_term").alias("head_ngram"),
            F.col("tok_end").alias("head_tok_end"),
            F.col("offset_begin"),
            F.lead("term").over(w).alias("tail"),
            F.lead("lemma_term").over(w).alias("tail_ngram"),
            F.lead("tok_begin").over(w).alias("tail_tok_begin"),
        )
        .filter(F.col("tail").isNotNull())
        # overlapping mentions (nested NPs) can't form a pair
        .filter(F.col("tail_tok_begin") > F.col("head_tok_end"))
        .withColumn("cooc_no", F.row_number().over(
            Window.partitionBy("doc_id", "sentence_id").orderBy("offset_begin")))
    )
    if sentences is not None:
        # in-between words from the sentence token array: slice between the
        # head's last token and the tail's first token (1-based token ids)
        p = p.join(sentences, ["doc_id", "sentence_id"], "left").withColumn(
            "in_between_words",
            F.array_join(
                F.transform(
                    F.filter(
                        F.col("toks"),
                        lambda t: (t["token_id"] > F.col("head_tok_end"))
                        & (t["token_id"] < F.col("tail_tok_begin")),
                    ),
                    lambda t: t["word"],
                ),
                " ",
            ),
        ).drop("toks")
    return p


def relation_json_rows(labeled_pairs: DataFrame) -> DataFrame:
    """Cluster-file sink shape (reference artifact
    results/extracted_relations/relation_jsons/*.json — D6 in SURVEY §1):
    one JSON object per cluster id with its member records
    {text, head_words, tail_words, in_between_words}; noise cluster -1
    included. Emitted as (cluster string, members_json string) rows; a
    driver-side collect of the tiny per-cluster strings reassembles the
    reference's single-file form."""
    member = F.to_json(
        F.struct(
            F.coalesce(F.col("context"), F.lit("")).alias("text"),
            F.col("head").alias("head_words"),
            F.col("tail").alias("tail_words"),
            F.coalesce(F.col("in_between_words"), F.lit("")).alias("in_between_words"),
        )
    )
    return (
        labeled_pairs.withColumn("member", member)
        .groupBy(F.col("cluster").cast("string").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.concat(
                F.lit("["), F.array_join(F.collect_list("member"), ","), F.lit("]")
            ).alias("members_json"),
        )
    )


def labels_map_rows(pair_df: DataFrame, gold: DataFrame | None = None) -> DataFrame:
    """Label-map sink shape (reference artifact
    results/extracted_relations/labels/*.json: doc -> sent -> "head|tail"
    -> 0/1): rows (doc_id, sent_id, pair_key, label). Pairs join the gold
    YES/NO table when given, else label 0."""
    key = F.lower(F.concat_ws("|", "head", "tail"))
    out = pair_df.select(
        "doc_id", F.col("sentence_id").alias("sent_id"), key.alias("pair_key")
    )
    if gold is not None:
        g = gold.select(
            "doc_id",
            F.col("sent_id"),
            F.lower(F.concat_ws("|", "head", "tail")).alias("pair_key"),
            "label",
        )
        return out.join(g, ["doc_id", "sent_id", "pair_key"], "left").fillna({"label": 0})
    return out.withColumn("label", F.lit(0))


def triples_from_pairs(pair_df: DataFrame, pred_col: str | None = None) -> DataFrame:
    """Deduplicated (subj, pred, obj) triple store with support + provenance.

    pred = cluster id column when relation clustering ran, else the default
    'cooccurs_with' predicate. Dedup = groupBy, support count, provenance
    kept as a bounded collect (slice to 16) so a hub triple at 10^12-file
    scale cannot blow up a reducer.
    """
    pred = F.col(pred_col).cast("string") if pred_col else F.lit("cooccurs_with")
    return (
        pair_df.select(
            F.col("head").alias("subj"),
            pred.alias("pred"),
            F.col("tail").alias("obj"),
            F.concat_ws("#", "doc_id", "sentence_id").alias("prov"),
        )
        .groupBy("subj", "pred", "obj")
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.slice(F.sort_array(F.collect_set("prov")), 1, 16).alias("provenance"),
        )
    )
