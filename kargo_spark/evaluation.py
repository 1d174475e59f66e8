"""Evaluation: P@k, pooled relative-recall@k, F@k, mean ± population σ.

DataFrame reimplementation of the reference evaluator (reference
evaluation.py:44-105, 129-142), preserving its exact semantics:

* term identity = lowercased surface string (evaluation.py:40-42)
* P@k  = cumulative #correct / k along the ranked list (evaluation.py:44-52)
* relative recall@k = correct_m@k / |union over ALL methods of correct@k|
  (pooled denominator, evaluation.py:54-73), with per-doc truncation to the
  shortest method's prediction length (evaluation.py:59-60)
* F@k  = 2PR/(P+R), 0 when both 0 (evaluation.py:129-142)
* aggregate = mean ± POPULATION stddev over docs having >= k predictions
  (numpy np.std default — evaluation.py:84), not sample stddev.

Inputs are exploded ranked predictions (doc_id, method, rank, term) and a
gold table (doc_id, term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_correct(preds: DataFrame, gold: DataFrame) -> DataFrame:
    g = gold.select("doc_id", F.lower(F.col("term")).alias("gterm")).distinct()
    return (
        preds.withColumn("term", F.lower(F.col("term")))
        .join(
            g.withColumnRenamed("gterm", "term").withColumn("is_correct", F.lit(1)),
            ["doc_id", "term"],
            "left",
        )
        .fillna({"is_correct": 0})
    )


def precision_at_k(preds: DataFrame, gold: DataFrame, max_k: int | None = None) -> DataFrame:
    """(doc_id, method, k, precision): cumulative correct / k."""
    marked = _with_correct(preds, gold)
    w = (
        Window.partitionBy("doc_id", "method")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = marked.select(
        "doc_id", "method",
        F.col("rank").alias("k"),
        (F.sum("is_correct").over(w) / F.col("rank")).alias("precision"),
    )
    if max_k:
        out = out.filter(F.col("k") <= max_k)
    return out


def relative_recall_at_k(preds: DataFrame, gold: DataFrame, max_k: int | None = None) -> DataFrame:
    """Pooled relative recall: per (doc, k), each method's cumulative correct
    set over the distinct union of every method's cumulative correct terms.

    Cross-method state via explode + two-level groupBy (SURVEY.md §7 hard
    part b) — no Python loops. Truncates each doc to its shortest method
    list (reference evaluation.py:59-60).
    """
    marked = _with_correct(preds, gold)
    min_len = (
        marked.groupBy("doc_id", "method").agg(F.max("rank").alias("len"))
        .groupBy("doc_id").agg(F.min("len").alias("min_len"))
    )
    marked = marked.join(min_len, "doc_id").filter(F.col("rank") <= F.col("min_len"))
    w = (
        Window.partitionBy("doc_id", "method")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = marked.select(
        "doc_id", "method", F.col("rank").alias("k"),
        F.array_compact(
            F.collect_list(F.when(F.col("is_correct") == 1, F.col("term"))).over(w)
        ).alias("cum_correct"),
    )
    pool = (
        cum.groupBy("doc_id", "k")
        .agg(F.array_distinct(F.flatten(F.collect_list("cum_correct"))).alias("pool"))
    )
    out = cum.join(pool, ["doc_id", "k"]).select(
        "doc_id", "method", "k",
        F.when(F.size("pool") > 0, F.size("cum_correct") / F.size("pool"))
        .otherwise(F.lit(0.0)).alias("recall"),
    )
    if max_k:
        out = out.filter(F.col("k") <= max_k)
    return out


def fscore_at_k(prec: DataFrame, rec: DataFrame) -> DataFrame:
    """F@k from P@k ⋈ recall@k on (doc, method, k); 0 when P+R = 0."""
    j = prec.join(rec, ["doc_id", "method", "k"], "inner")
    return j.select(
        "doc_id", "method", "k",
        F.when(
            (F.col("precision") + F.col("recall")) > 0,
            2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
        ).otherwise(F.lit(0.0)).alias("fscore"),
    )


def aggregate_scores(scores: DataFrame, value_col: str) -> DataFrame:
    """mean ± population σ per (method, k) — reference evaluation.py:75-105."""
    return scores.groupBy("method", "k").agg(
        F.avg(value_col).alias("mean"),
        F.coalesce(F.stddev_pop(value_col), F.lit(0.0)).alias("std"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def triple_precision_recall(predicted: DataFrame, gold: DataFrame) -> DataFrame:
    """Set P/R/F1 of (subj, pred, obj) triples vs a gold table — the
    BASELINE.json quality gate (P/R >= 0.95 vs reference extractions)."""
    p = predicted.select("subj", "pred", "obj").distinct()
    g = gold.select("subj", "pred", "obj").distinct()
    tp = p.join(g, ["subj", "pred", "obj"], "left_semi").count()
    np_, ng = p.count(), g.count()
    prec = tp / np_ if np_ else 0.0
    rec = tp / ng if ng else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    spark = predicted.sparkSession
    return spark.createDataFrame(
        [(tp, np_, ng, prec, rec, f1)],
        "tp long, n_pred long, n_gold long, precision double, recall double, f1 double",
    )
