"""Deterministic synthetic twin of the driver testdata at an arbitrary
scale factor (r04 verdict next-step #8: one sf1.0 bench row).

The driver ships sf0.001/0.01/0.1 only; this generator re-creates the
same table shapes and distributions (measured off sf0.1, see inline
notes) at N x the row counts, fully deterministically (xxhash64-derived
— no RNG state), so per-query bench times can be compared across a 10x
input step on like-for-like data:

  documents  5,000/sf0.1 -> 50,000/sf1.0 : 31-word vocab (30 content
             words + the 'dup' marker), 7-88 words/doc uniform,
             en/src0-19, ~5% of docs are planted single-word-edit
             near-dups of their predecessor (matches the 256 verified
             minhash pairs at sf0.1), ~1.6/1000 exact dups
  embeddings 2,000 -> 20,000 : dim 64, ~N(0, 0.15)-ish floats, 10 labels
  events     100,000 -> 1,000,000 : 30 days of ts, users x10, 5 types

Usage: python tools/gen_sf_synth.py <out_dir> [docs_rows=50000]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

# the EXACT 30-word content vocab observed in the driver's sf0.1 corpus
# (uniform frequencies; the 31st token 'dup' appears only in planted
# near-dup edits there, mirrored below). Function words ('the', 'a') are
# load-bearing: the candidate chunker keys off them, so a guessed vocab
# yields zero pipeline triples.
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]


def _h(*cols):
    return F.abs(F.xxhash64(*cols))


def gen_documents(spark, n_rows: int):
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    base = spark.range(n_rows).select(F.col("id").alias("doc_id"))
    # planted structure: exact dup of the previous doc every 625 rows,
    # single-word-edit near-dup every 20 rows (the 'dup' marker token,
    # mirroring the sf0.1 corpus where 'dup' appears only in edited docs)
    is_exact = (F.col("doc_id") % 625 == 13) & (F.col("doc_id") > 0)
    is_near = (F.col("doc_id") % 20 == 1) & (F.col("doc_id") > 0) & ~is_exact
    src = F.when(is_exact | is_near, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    d = base.select("doc_id", src.alias("src"), is_near.alias("near"))
    n_words = (_h(F.col("src"), F.lit(0)) % 82 + 7).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.element_at(vocab, (_h(F.col("src"), j) % 30 + 1).cast("int")),
    )
    edit_pos = (_h(F.col("doc_id"), F.lit(999)) % n_words + 1).cast("int")
    words = F.when(
        F.col("near"),
        F.transform(
            words, lambda w, i: F.when(i + 1 == edit_pos, F.lit("dup")).otherwise(w)
        ),
    ).otherwise(words)
    return d.select(
        "doc_id",
        F.array_join(words, " ").alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (_h("doc_id", F.lit(7)) % 20).cast("string")).alias(
            "source"
        ),
    ).withColumn("n_chars", F.length("text").cast("long"))


def gen_embeddings(spark, n_rows: int):
    return spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: ((_h(F.col("id"), j) % 2001).cast("double") / 1000.0 - 1.0)
            * 0.25,
        ).cast("array<float>").alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"),
    )


def gen_events(spark, n_rows: int, n_users: int):
    types = F.array(*[F.lit(t) for t in EVENT_TYPES])
    return spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1704067200000000)  # 2024-01-01T00:00:00Z
            + (_h("id", F.lit(1)) % (30 * 86400 * 1000000)).cast("long")
        ).alias("ts"),
        (_h("id", F.lit(2)) % n_users).cast("long").alias("user_id"),
        F.element_at(types, (_h("id", F.lit(3)) % 5 + 1).cast("int")).alias(
            "event_type"
        ),
        ((_h("id", F.lit(4)) % 56021).cast("double") / 100.0).alias("value"),
        F.concat(
            F.lit('{"k": '), (_h("id", F.lit(5)) % 100).cast("string"), F.lit("}")
        ).alias("props"),
    )


def main(out_dir: str, docs_rows: int = 50_000) -> None:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from kargo_spark.session import get_spark

    spark = get_spark(app_name="gen_sf_synth")
    scale = docs_rows / 5000  # relative to sf0.1
    gen_documents(spark, docs_rows).repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    gen_embeddings(spark, int(2000 * scale)).repartition(4).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/embeddings.parquet")
    gen_events(spark, int(100_000 * scale), int(1500 * scale)).repartition(
        8
    ).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    print(f"wrote synthetic tables (scale {scale:g} x sf0.1) to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 50_000)
