"""Sequence packing: greedy assignment of documents into fixed
token-budget training examples — the packing step LM data pipelines run
between filtering and tokenization so short documents don't waste
context-window padding.

Semantics (the standard greedy first-fit-in-order rule): within a pack
group, documents are taken in ascending id order and appended to the
current bin while the running token count stays within ``budget``; a doc
that would overflow starts a new bin (an oversized doc therefore gets a
bin of its own). Groups are independent md5 buckets of the doc id —
packing is approximate by nature, so sharding it over deterministic
groups loses nothing and makes the operator embarrassingly parallel: one
shuffle on the group key, a tiny sequential loop per group, no global
sort. Group count scales with ``spark.sql.shuffle.partitions`` so a
10^12-row corpus packs with bounded per-task state.

The md5 group key and the greedy rule are both DuckDB-reproducible (the
oracle replays the loop with a recursive CTE), so the driver checks the
exact bin assignment, not just counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_groups: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "pack",
) -> DataFrame:
    """-> (doc_id, group, bin_id, n_tokens): which training example each
    doc lands in. ``n_tokens`` = whitespace-ish word count (swap in a
    real tokenizer count upstream by pre-computing a column named
    ``n_tokens`` — if present it is used as-is)."""
    spark = docs.sparkSession
    ng = n_groups or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if "n_tokens" in docs.columns:
        nt = F.col("n_tokens").cast("long")
    else:
        toks = F.filter(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda t: t != ""
        )
        nt = F.size(toks).cast("long")
    g = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))), 1, 4
            ),
            16, 10,
        ).cast("int") % ng
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), g.alias("group"), nt.alias("n_tokens")
    )
    id_type = docs.schema[id_col].dataType.simpleString()
    schema = f"doc_id {id_type}, group int, bin_id int, n_tokens long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, accs = [], 0
        b = 0
        for i, t in enumerate(pdf["n_tokens"].values):
            if i == 0:
                accs = int(t)
            elif accs + int(t) > budget:
                b += 1
                accs = int(t)
            else:
                accs += int(t)
            bins.append(b)
        pdf["bin_id"] = bins
        return pdf[["doc_id", "group", "bin_id", "n_tokens"]]

    return base.groupBy("group").applyInPandas(pack, schema)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Packing efficiency rollup: per group — #bins, mean fill ratio,
    #overflow bins (single oversized docs). Partial-agg only."""
    bins = packed.groupBy("group", "bin_id").agg(F.sum("n_tokens").alias("fill"))
    return bins.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(F.avg(F.col("fill") / budget), 6).alias("mean_fill"),
        F.sum((F.col("fill") > budget).cast("long")).alias("n_overflow"),
    )
