"""Porter stemmer tests: canonical full-algorithm outputs (Porter 1980
worked examples) + the Spark UDF path through the LDA pipeline."""

from __future__ import annotations

from kargo_spark.stemming import porter_stem


def test_porter_canonical_examples():
    cases = {
        "generalizations": "gener",   # the paper's worked derivation
        "oscillators": "oscil",       # the paper's worked derivation
        "caresses": "caress", "ponies": "poni", "cats": "cat",
        "feed": "feed", "plastered": "plaster", "motoring": "motor",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "happy": "happi", "sky": "sky", "sing": "sing",
        "controlling": "control",
        "connected": "connect", "connecting": "connect",
        "connection": "connect", "connections": "connect",
    }
    for w, want in cases.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_porter_short_words_untouched():
    for w in ("a", "be", "is", "it", "on"):
        assert porter_stem(w) == w


def test_stemmer_udf_in_topics_pipeline(spark):
    from pyspark.sql import functions as F

    from kargo_spark.stemming import make_stemmer_udf

    df = spark.createDataFrame(
        [(["connections", "connected", "shipping", "shipments"],)],
        "toks array<string>",
    )
    out = df.select(make_stemmer_udf()(F.col("toks")).alias("s")).collect()[0]["s"]
    assert out == ["connect", "connect", "ship", "shipment"]


def test_stemmer_udf_memo_is_order_independent(spark):
    """Porter is not idempotent (callousness->callous, callous->callou);
    the memo must never seed stems as their own fixed points."""
    from kargo_spark.stemming import make_stemmer_udf, porter_stem

    udf = make_stemmer_udf()
    df = spark.createDataFrame(
        [(1, ["callousness", "callous"]), (2, ["callous", "callousness"])],
        "id long, toks array<string>",
    ).coalesce(1)
    out = {r["id"]: r["st"] for r in df.select("id", udf("toks").alias("st")).collect()}
    assert out[1] == out[2][::-1]
    assert out[1] == [porter_stem("callousness"), porter_stem("callous")]
