"""Supervised relation typing — the reference's ``TransferRE``.

Reference (kargo/relations.py, single-line file — ``class TransferRE``):
``opennre.get_model(model_name)`` then, per co-occurrence,
``model.infer({"text": ..., "h": {"pos": (head_begin, head_end)},
"t": {"pos": (tail_begin, tail_end)}})`` -> ``(relation, prob)``; keep
predictions with ``prob >= prob_threshold`` and group the surviving
``{text, head_words, tail_words, prob}`` records by predicted relation.

Spark-first shape: ONE ``mapInPandas`` pass over the candidate-pair table
— Arrow-batched, no per-row Python UDF, no driver loop — with the model a
pluggable batch callable. The default model is a DETERMINISTIC STUB
(opennre weights are not in this container, the multimodal-decode
pattern): relation and probability derive from the md5 of the
(text, head span, tail span) key, so the stage is testable end-to-end and
even DuckDB-oracle-expressible, while ``strict=True`` raises at the
integration point where a real opennre wrapper plugs in. At cluster
scale the batch callable is exactly where a GPU/ONNX session per executor
slots (load once per worker via a module-level memo, score a whole Arrow
batch per call).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RELATION_INVENTORY = (
    "part_of",
    "located_in",
    "operated_by",
    "transports",
    "uses",
)

PAIRS_SCHEMA_DOC = (
    "input columns: doc_id, sent_id, cooc_no, text, head_begin, head_end, "
    "tail_begin, tail_end (char offsets into text, end-exclusive)"
)


def _stub_key(text: str, hb: int, he: int, tb: int, te: int) -> str:
    return f"{text}|{hb}:{he}|{tb}:{te}"


def stub_relation_model(batch: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic fake opennre scorer with the REAL contract: one batch
    of (text, head_begin, head_end, tail_begin, tail_end) in, aligned
    (relation, prob) arrays out.

    relation = inventory[int(md5(key)[:8], 16) % |inventory|] and
    prob = (int(md5(key)[8:16], 16) % 10000) / 10000 over the canonical
    span key — md5, never Python ``hash`` (stable across workers), and
    SQL-reproducible so the driver can oracle-check the whole stage.
    """
    rels, probs = [], []
    for text, hb, he, tb, te in zip(
        batch["text"].values,
        batch["head_begin"].values,
        batch["head_end"].values,
        batch["tail_begin"].values,
        batch["tail_end"].values,
    ):
        dg = hashlib.md5(
            _stub_key(str(text), int(hb), int(he), int(tb), int(te)).encode("utf-8")
        ).hexdigest()
        rels.append(RELATION_INVENTORY[int(dg[:8], 16) % len(RELATION_INVENTORY)])
        probs.append((int(dg[8:16], 16) % 10000) / 10000.0)
    return np.array(rels, dtype=object), np.array(probs, dtype="float64")


def transfer_re(
    pairs: DataFrame,
    model: Callable[[pd.DataFrame], tuple[np.ndarray, np.ndarray]] | None = None,
    prob_threshold: float = 0.5,
    strict: bool = False,
) -> DataFrame:
    """Typed-relation inference over candidate pairs (TransferRE.infer).

    ``pairs``: see PAIRS_SCHEMA_DOC. ``model``: batch scorer with the
    ``stub_relation_model`` contract; None selects the stub
    (``strict=True`` raises instead — the opennre integration point).
    Output: one row per pair with ``prob >= prob_threshold`` —
    (doc_id, sent_id, cooc_no, relation, prob, head_words, tail_words)
    where head/tail surfaces are sliced from the text by the given spans,
    exactly as the reference builds ``rel_elmt``.
    """
    if model is None:
        if strict:
            raise NotImplementedError(
                "supervised relation typing requires opennre model weights "
                "not present in this container; wrap "
                "opennre.get_model(name).infer into a batch callable and "
                "pass it as `model`"
            )
        model = stub_relation_model

    id_type = pairs.schema["doc_id"].dataType.simpleString()
    out_schema = (
        f"doc_id {id_type}, sent_id int, cooc_no int, relation string, "
        "prob double, head_words string, tail_words string"
    )
    cols = [
        "doc_id", "sent_id", "cooc_no", "text",
        "head_begin", "head_end", "tail_begin", "tail_end",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rels, probs = model(pdf)
            keep = probs >= prob_threshold
            texts = pdf["text"].values
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values[keep],
                    "sent_id": pdf["sent_id"].values[keep].astype("int32"),
                    "cooc_no": pdf["cooc_no"].values[keep].astype("int32"),
                    "relation": rels[keep],
                    "prob": probs[keep],
                    "head_words": [
                        str(t)[int(b):int(e)]
                        for t, b, e in zip(
                            texts[keep],
                            pdf["head_begin"].values[keep],
                            pdf["head_end"].values[keep],
                        )
                    ],
                    "tail_words": [
                        str(t)[int(b):int(e)]
                        for t, b, e in zip(
                            texts[keep],
                            pdf["tail_begin"].values[keep],
                            pdf["tail_end"].values[keep],
                        )
                    ],
                }
            )

    return pairs.select(*cols).mapInPandas(run, out_schema)


def relations_by_type(typed: DataFrame, max_members: int = 16) -> DataFrame:
    """Reference output shape (TransferRE.infer returns a dict keyed by
    relation with member lists): per relation — support count and a
    BOUNDED deterministic member sample, so a hub relation type cannot
    blow up a reducer at corpus scale."""
    member = F.to_json(
        F.struct(
            F.col("head_words"), F.col("tail_words"), F.round("prob", 4).alias("prob")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("relation").orderBy(F.desc("prob"), "head_words", "tail_words")
    counts = typed.groupBy("relation").agg(F.count(F.lit(1)).alias("support"))
    bounded = (
        typed.withColumn("member", member)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_members)
        .groupBy("relation")
        .agg(F.sort_array(F.collect_list("member")).alias("members"))
    )
    return counts.join(bounded, "relation").select("relation", "support", "members")


def locate_spans(
    pairs: DataFrame,
    text_col: str = "context",
    head_col: str = "head",
    tail_col: str = "tail",
) -> DataFrame:
    """Glue from the engine's pair tables (surfaces + context text) to the
    span-based TransferRE input: first-occurrence char spans via instr —
    the same first-match convention the reference's annotation tooling
    uses on reconstructed sentence text. Rows whose surfaces cannot be
    located (0 from instr) are dropped rather than given bogus spans."""
    hb = F.expr(f"instr({text_col}, {head_col})")
    tb = F.expr(f"instr({text_col}, {tail_col})")
    return (
        pairs.withColumn("__hb", hb)
        .withColumn("__tb", tb)
        .filter((F.col("__hb") > 0) & (F.col("__tb") > 0))
        .select(
            "*",
            (F.col("__hb") - 1).cast("long").alias("head_begin"),
            (F.col("__hb") - 1 + F.length(head_col)).cast("long").alias("head_end"),
            (F.col("__tb") - 1).cast("long").alias("tail_begin"),
            (F.col("__tb") - 1 + F.length(tail_col)).cast("long").alias("tail_end"),
        )
        .drop("__hb", "__tb")
        .withColumnRenamed(text_col, "text")
    )
