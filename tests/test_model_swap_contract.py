"""The three model integration points (README 'Swapping in real models')
must fail LOUDLY with actionable messages under strict=True, so a
deployment that requires real stanza / sent2vec / opennre outputs can
never silently ship stand-in annotations (r03 verdict next-step #8)."""

from __future__ import annotations

import pytest


def test_nlp_strict_raises_actionably(spark):
    from kargo_spark import nlp

    docs = spark.createDataFrame([("d1", "Some text.")], "doc_id string, content string")
    with pytest.raises(NotImplementedError, match="stanza") as e:
        nlp.tokenize(docs, strict=True)
    # actionable: names the swap point and the schema contract
    assert "_annotate_doc" in str(e.value)
    assert "TOKENS_SCHEMA" in str(e.value)


def test_embedder_strict_raises_actionably():
    from kargo_spark.embedding import make_embedder

    with pytest.raises(NotImplementedError, match="sent2vec") as e:
        make_embedder(strict=True)
    assert "embed_sentences" in str(e.value)


def test_transfer_re_strict_raises_actionably(spark):
    from kargo_spark.transfer_re import transfer_re

    pairs = spark.createDataFrame(
        [(1, 0, 0, "alpha beta", 0, 5, 6, 10)],
        "doc_id long, sent_id int, cooc_no int, text string, "
        "head_begin long, head_end long, tail_begin long, tail_end long",
    )
    with pytest.raises(NotImplementedError, match="opennre") as e:
        transfer_re(pairs, strict=True)
    assert "model" in str(e.value)


def test_multimodal_strict_raises_actionably(spark):
    from kargo_spark.multimodal import extract_features, synth_media

    media = synth_media(spark, n=4)
    with pytest.raises(Exception, match="decode"):
        # strict decode raises inside the Arrow worker; Spark surfaces it
        extract_features(media, strict=True).collect()


def test_default_paths_still_run(spark):
    """The stand-ins stay the tested default: strict=False works."""
    from kargo_spark import nlp
    from kargo_spark.embedding import make_embedder

    docs = spark.createDataFrame([("d1", "Some text here.")], "doc_id string, content string")
    assert nlp.tokenize(docs).count() > 0
    emb = make_embedder()
    from pyspark.sql import functions as F

    out = docs.select(emb(F.col("content")).alias("v")).collect()
    assert len(out[0]["v"]) == 64
