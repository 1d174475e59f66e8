"""Source/sink formats from the reference, re-expressed as DataFrame I/O.

Covers SURVEY.md §2.1:
* terms CSV sink/source        (terms.py:26-34 / 83-90: '|'-joined, rank order)
* doccano JSONL sink/source    (corpus.py:521-540 / 191-217)
* KARGEN CoNLL sink            (corpus.py:562-601: token-per-line TSV,
                                blank-line sentence separators)
* gzip TSV DF sink/source      (pke compute/load_document_frequency,
                                main.py:91-97, sentinel --NB_DOC--)
* BIOES term tagging           (corpus.py:473-490: interval stabbing +
                                sequential lookahead finalization)
* auto-annotation span merge   (terms.py:62-72: sort + merge overlaps)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .weighting import terms_csv_shape  # sink shape lives with ranking

__all__ = [
    "terms_csv_shape", "read_terms_csv", "write_doccano_jsonl",
    "read_doccano_jsonl", "kargen_conll_lines", "write_df_tsv",
    "read_df_tsv", "bioes_tag_tokens", "merge_spans",
]


def read_terms_csv(spark, path: str) -> DataFrame:
    """Inverse of terms_csv_shape (terms.py:83-90): split + posexplode keeps
    rank explicit (rank is 1-based like get_n_best output order).

    escape='"' because the reference writes RFC-4180 CSVs (pandas
    to_csv: embedded quotes doubled). Spark's csv default escape is the
    backslash, which leaves a quoted field's opening quote glued to the
    first term and the doubled quotes un-collapsed — caught by the
    test-split triple gate (doc 8e59bc: '"system level data' failed its
    span match, silently dropping a labeled pair; r05).
    """
    raw = spark.read.option("escape", '"').csv(path, header=True)
    return raw.select(
        F.col("document_id").alias("doc_id"),
        F.posexplode(F.split("terms", r"\|")).alias("rank0", "term"),
    ).select("doc_id", (F.col("rank0") + 1).alias("rank"), "term")


def doccano_rows(docs: DataFrame, text_cols: tuple[str, ...] = ("content",)) -> DataFrame:
    """Doccano JSONL shape: {"text": title|p1|p2..., "meta":{"doc_id":...}}
    (corpus.py:521-540 joins title+paragraphs with '|')."""
    text = F.concat_ws("|", *[F.col(c) for c in text_cols])
    return docs.select(
        F.to_json(
            F.struct(
                text.alias("text"),
                F.struct(F.col("doc_id").alias("doc_id")).alias("meta"),
            )
        ).alias("value")
    )


def write_doccano_jsonl(docs: DataFrame, path: str, text_cols: tuple[str, ...] = ("content",)) -> None:
    doccano_rows(docs, text_cols).write.mode("overwrite").text(path)


def read_doccano_jsonl(spark, path: str, drop_irrelevant: bool = True) -> DataFrame:
    """TermLabels source (corpus.py:191-217): JSONL with labels spans;
    docs with any IRRELEVANT label are dropped entirely (206-215); missing
    meta.doc_id falls back to md5(title)[-6:] where title is the text up to
    the first '|' (corpus.py:198-200 fallback rule)."""
    df = spark.read.json(path)
    has_meta_id = False
    if "meta" in df.columns:
        dt = df.schema["meta"].dataType
        has_meta_id = hasattr(dt, "fieldNames") and "doc_id" in dt.fieldNames()
    meta_doc_id = (
        F.col("meta.doc_id").cast("string") if has_meta_id else F.lit(None).cast("string")
    )
    fallback = F.substring(F.md5(F.split_part(F.col("text"), F.lit("|"), F.lit(1))), -6, 6)
    out = df.select(
        F.coalesce(meta_doc_id, fallback).alias("doc_id"),
        "text",
        F.coalesce("labels", F.array()).alias("labels"),
    )
    if drop_irrelevant:
        irrelevant = out.filter(
            F.exists("labels", lambda l: l[2] == "IRRELEVANT")
        ).select("doc_id")
        out = out.join(irrelevant, "doc_id", "left_anti")
    return out.select(
        "doc_id", "text",
        F.transform(
            "labels",
            lambda l: F.struct(
                l[0].cast("int").alias("begin"),
                l[1].cast("int").alias("end"),
                l[2].cast("string").alias("label"),
            ),
        ).alias("labels"),
    )


def read_relation_labels(spark, path: str) -> DataFrame:
    """Gold relation-label source (data/annotations/relations/
    all_labels.json; FIXTURES.md F6): nested
    ``{dataset: {doc_id: {sent_id: {"head|tail": "YES"/"NO"}}}}`` ->
    ``(dataset, doc_id, sent_id, head, tail, label int)``.

    The file is a single nested JSON object (not JSONL): read as whole-text
    and flatten with explode over map entries — no driver-side parsing of
    row data beyond the one file read.
    """
    raw = spark.read.text(path, wholetext=True)
    typ = "map<string, map<string, map<string, map<string, string>>>>"
    parsed = raw.select(F.from_json("value", typ).alias("m"))
    return (
        parsed.select(F.explode("m").alias("dataset", "docs"))
        .select("dataset", F.explode("docs").alias("doc_id", "sents"))
        .select("dataset", "doc_id", F.explode("sents").alias("sent_id_str", "pairs"))
        .select("dataset", "doc_id", F.col("sent_id_str").cast("int").alias("sent_id"),
                F.explode("pairs").alias("pair", "yn"))
        .select(
            "dataset", "doc_id", "sent_id",
            F.split_part("pair", F.lit("|"), F.lit(1)).alias("head"),
            F.split_part("pair", F.lit("|"), F.lit(2)).alias("tail"),
            F.when(F.col("yn") == "YES", 1).otherwise(0).alias("label"),
        )
    )


def kargen_conll_lines(tokens: DataFrame, labels: DataFrame | None = None) -> DataFrame:
    """KARGEN dataset sink (corpus.py:562-601): token-per-line TSV
    ``token_id\\tword\\tner\\tterm_tag\\trel_label\\trel_tail_id`` with an
    empty line between sentences; relation labels join onto the head span's
    LAST token (corpus.py:572-578).

    Returns one row per output line (ordered view): (doc_id, sentence_id,
    line_no, line) — callers write with text sink after sorting.
    """
    t = tokens
    if "ner" not in t.columns:
        t = t.withColumn("ner", F.lit("O"))
    if "term_tag" not in t.columns:
        t = t.withColumn("term_tag", F.lit("O"))
    if labels is not None:
        lab = labels.select(
            "doc_id", "sentence_id",
            F.col("head_end_token").alias("token_id"),
            F.col("rel_label"), F.col("rel_tail_id"),
        )
        t = t.join(lab, ["doc_id", "sentence_id", "token_id"], "left")
    else:
        t = t.withColumn("rel_label", F.lit(None).cast("string")).withColumn(
            "rel_tail_id", F.lit(None).cast("int")
        )
    line = F.concat_ws(
        "\t",
        F.col("token_id").cast("string"), "word", "ner", "term_tag",
        F.coalesce("rel_label", F.lit("N")),
        F.coalesce(F.col("rel_tail_id").cast("string"), F.lit("0")),
    )
    body = t.select(
        "doc_id", "sentence_id", F.col("token_id").alias("line_no"), line.alias("line")
    )
    # blank separator line after each sentence (line_no = max+1)
    seps = (
        t.groupBy("doc_id", "sentence_id")
        .agg((F.max("token_id") + 1).alias("line_no"))
        .withColumn("line", F.lit(""))
    )
    return body.unionByName(seps)


def write_df_tsv(df_counts: DataFrame, n_docs: int, path: str) -> None:
    """DF table sink with the --NB_DOC-- sentinel row (cargo_df.tsv.gz
    format, main.py:91-97)."""
    spark = df_counts.sparkSession
    sentinel = spark.createDataFrame([("--NB_DOC--", n_docs)], "ngram string, df long")
    out = sentinel.unionByName(df_counts.select("ngram", F.col("df").cast("long")))
    out.select(F.concat_ws("\t", "ngram", F.col("df").cast("string")).alias("value")) \
        .coalesce(1).write.mode("overwrite").option("compression", "gzip").text(path)


def read_df_tsv(spark, path: str) -> tuple[DataFrame, int]:
    """Inverse: returns (df_counts, n_docs) with the sentinel popped out."""
    raw = spark.read.text(path).select(
        F.split("value", "\t")[0].alias("ngram"),
        F.split("value", "\t")[1].cast("long").alias("df"),
    )
    n_docs = raw.filter(F.col("ngram") == "--NB_DOC--").collect()[0]["df"]
    return raw.filter(F.col("ngram") != "--NB_DOC--"), int(n_docs)


def bioes_tag_tokens(tokens: DataFrame, spans: DataFrame) -> DataFrame:
    """BIOES term tagging (corpus.py:473-490): mark tokens inside gold term
    spans B/I, then finalize with a lookahead — last token of a span turns
    B->S and I->E (486-490). Interval stabbing = range join on character
    offsets; the lookahead = lead() window, exactly the reference's
    sequential pass re-expressed.

    spans: (doc_id, begin, end) character intervals.
    """
    j = tokens.join(
        spans,
        (tokens["doc_id"] == spans["doc_id"])
        & (tokens["offset_begin"] >= spans["begin"])
        & (tokens["offset_end"] <= spans["end"]),
        "left",
    ).select(
        tokens["*"],
        spans["begin"].alias("__sb"),
    )
    # B if first token of its span, I otherwise, O outside
    w_span = Window.partitionBy("doc_id", "sentence_id", "__sb").orderBy("token_id")
    tagged = j.withColumn(
        "term_tag",
        F.when(F.col("__sb").isNull(), "O")
        .when(F.row_number().over(w_span) == 1, "B")
        .otherwise("I"),
    )
    w = Window.partitionBy("doc_id", "sentence_id", "__sb").orderBy("token_id")
    nxt = F.lead("term_tag").over(w)
    return (
        tagged.withColumn(
            "term_tag",
            F.when((F.col("term_tag") == "B") & (nxt.isNull() | (nxt == "O")), "S")
            .when((F.col("term_tag") == "I") & (nxt.isNull() | (nxt == "O")), "E")
            .otherwise(F.col("term_tag")),
        )
        .withColumn(
            "term_tag",
            F.when(F.col("term_tag") == "O", "O").otherwise(
                F.concat(F.col("term_tag"), F.lit("-TERM"))
            ),
        )
        .drop("__sb")
    )


def auto_annotation_rows(docs: DataFrame, terms: DataFrame) -> DataFrame:
    """Auto-annotation doccano sink (terms.py:36-81): for each document,
    locate EVERY occurrence of each of its extracted terms in the text
    (case-insensitive, token-boundary-anchored — the reference tests
    ``startswith`` at token begin offsets, terms.py:57-60), merge
    overlapping spans (terms.py:62-72), emit doccano rows
    ``{"text", "labels": [[b,e,"AUTO"]], "meta":{"doc_id"}}``.

    Occurrence location runs in a grouped pandas UDF (regex findall per
    doc over its own top-k terms — bounded work per group); the overlap
    merge reuses the window-based ``merge_spans``.
    """
    import re

    import pandas as pd

    term_lists = terms.groupBy("doc_id").agg(F.collect_set("term").alias("terms"))
    joined = docs.select("doc_id", "content").join(term_lists, "doc_id", "inner")

    def locate(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, content, ts in zip(pdf["doc_id"], pdf["content"], pdf["terms"]):
            low = content.lower()
            for t in ts:
                pat = re.compile(r"(?<![a-z0-9])" + re.escape(t.lower()) + r"(?![a-z0-9])")
                for m in pat.finditer(low):
                    out.append((doc_id, m.start(), m.end()))
        return pd.DataFrame(out, columns=["doc_id", "begin", "end"])

    spans = joined.groupBy("doc_id").applyInPandas(
        locate, "doc_id string, begin int, end int"
    )
    merged = merge_spans(spans)
    labels = merged.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.array(F.col("begin"), F.col("end")))
        ).alias("spans")
    )
    return (
        docs.select("doc_id", "content")
        .join(labels, "doc_id", "left")
        .select(
            F.to_json(
                F.struct(
                    F.col("content").alias("text"),
                    F.transform(
                        F.coalesce("spans", F.array()),
                        lambda s: F.array(
                            s[0].cast("string"), s[1].cast("string"), F.lit("AUTO")
                        ),
                    ).alias("labels"),
                    F.struct(F.col("doc_id").alias("doc_id")).alias("meta"),
                )
            ).alias("value")
        )
    )


def merge_spans(spans: DataFrame) -> DataFrame:
    """Overlap merge of (doc_id, begin, end) label spans (terms.py:62-72:
    sort by (begin, end), merge overlapping, extend on partial overlap).

    Classic sort + running-max interval merge as window expressions: a span
    starts a new group when its begin exceeds the running max end of all
    earlier spans.
    """
    w = Window.partitionBy("doc_id").orderBy("begin", "end")
    wmax = w.rowsBetween(Window.unboundedPreceding, -1)
    grouped = spans.withColumn(
        "__new_group",
        F.when(F.col("begin") > F.coalesce(F.max("end").over(wmax), F.lit(-1)), 1).otherwise(0),
    ).withColumn(
        "__grp", F.sum("__new_group").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        grouped.groupBy("doc_id", "__grp")
        .agg(F.min("begin").alias("begin"), F.max("end").alias("end"))
        .drop("__grp")
    )


def read_relation_labels_flat(spark, path: str) -> DataFrame:
    """Per-split relation label files (data/annotations/relations/
    dev_labels.json / online_labels.json — RelationExtractor.
    convert_anno_json_to_labels output): ``{doc_id: {sent_id:
    {"head|tail": 0/1}}}`` -> (doc_id, sent_id, pair_key, label)."""
    raw = spark.read.text(path, wholetext=True)
    typ = "map<string, map<string, map<string, int>>>"
    parsed = raw.select(F.from_json("value", typ).alias("m"))
    return (
        parsed.select(F.explode("m").alias("doc_id", "sents"))
        .select("doc_id", F.explode("sents").alias("sent_id_str", "pairs"))
        .select(
            "doc_id",
            F.col("sent_id_str").cast("int").alias("sent_id"),
            F.explode("pairs").alias("pair_key", "label"),
        )
    )


ANNO_EXPORT_SCHEMA = (
    "id long, text string, "
    "annotations array<struct<label: int>>, "
    "meta struct<doc_id: string, sent_id: int, cooc_no: int, "
    "dataset: string, anno_id: long, "
    "anno_label: array<struct<label: int>>>"
)


def convert_anno_jsonl_to_labels(spark, path: str, no_label: int) -> DataFrame:
    """Doccano relation-annotation export -> flat label rows — the
    reference's RelationExtractor.convert_anno_json_to_labels
    (kargo/relations.py): ``text`` is ``before__head__between__tail__after``,
    label = 0 iff the first annotation equals ``no_label`` else 1 (an
    unannotated row is an implicit YES).

    Returns (row_idx, doc_id, sent_id, pair_key, label) with row_idx =
    file order, so ``labels_nested_json`` can reproduce the reference's
    insertion-ordered artifact byte-for-byte (last duplicate wins there,
    exactly like the reference's repeated dict assignment).
    """
    raw = spark.read.text(path).withColumn(
        "row_idx", F.monotonically_increasing_id()
    )
    parsed = raw.select(
        "row_idx", F.from_json("value", ANNO_EXPORT_SCHEMA).alias("r")
    )
    parts = F.split(F.col("r.text"), "__")
    label = F.when(
        (F.size("r.annotations") > 0)
        & (F.col("r.annotations")[0]["label"] == F.lit(no_label)),
        F.lit(0),
    ).otherwise(F.lit(1))
    return parsed.select(
        "row_idx",
        F.col("r.meta.doc_id").alias("doc_id"),
        F.col("r.meta.sent_id").alias("sent_id"),
        F.concat_ws(
            "|", F.element_at(parts, 2), F.element_at(parts, 4)
        ).alias("pair_key"),
        label.alias("label"),
    )


def labels_nested_json(labels: DataFrame) -> dict:
    """Flat label rows -> the reference's nested artifact shape
    ``{doc_id: {sent_id: {"head|tail": 0/1}}}`` with file insertion order
    and last-duplicate-wins (RelationExtractor.convert_anno_json_to_labels
    writes exactly this via json.dump(indent=2)). Annotation exports are
    human-sized — the collect here is a few hundred rows, never corpus
    data."""
    out: dict = {}
    for r in labels.orderBy("row_idx").collect():
        out.setdefault(r["doc_id"], {}).setdefault(str(r["sent_id"]), {})[
            r["pair_key"]
        ] = int(r["label"])
    return out


def review_agreement(spark, path: str, label_mapping: dict | None = None) -> DataFrame:
    """Annotation-review agreement rollup — the reference's
    RelationExtractor-adjacent ``check_review`` (kargo/relations.py):
    previous label = mapping of the first original annotation (implicit
    YES when none), review label = mapping of the first review
    annotation; counts per (prev_label, review_label). The reference
    prints agree/disagree scalars; here the full confusion rollup comes
    back as (prev_label, review_label, n)."""
    mapping = label_mapping or {
        19: "NO", 20: "YES", 21: "NO", 22: "YES",
        28: "NO", 29: "YES", 30: "UNSURE",
    }
    parsed = spark.read.text(path).select(
        F.from_json("value", ANNO_EXPORT_SCHEMA).alias("r")
    )
    map_expr = F.create_map(
        *[F.lit(x) for kv in mapping.items() for x in kv]
    )
    prev = F.when(
        F.size(F.coalesce(F.col("r.meta.anno_label"), F.array())) > 0,
        map_expr[F.col("r.meta.anno_label")[0]["label"]],
    ).otherwise(F.lit("YES"))
    review = map_expr[F.col("r.annotations")[0]["label"]]
    return (
        parsed.select(prev.alias("prev_label"), review.alias("review_label"))
        .groupBy("prev_label", "review_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def sample_relations_to_annotate(
    rows: DataFrame,
    frac: float = 0.1,
    seed: int = 42,
    strata_cols: tuple[str, ...] = ("dataset", "label"),
) -> DataFrame:
    """Seeded stratified annotation sampling — the reference's
    ``get_sample_relations`` (kargo/relations.py: 10% per
    (dataset, YES/NO) stratum via random.sample) made reproducible: an
    md5-keyed per-stratum rank window takes ceil(frac * n) rows per
    stratum deterministically (the reference's unseeded random.sample
    can't be replayed; same rate, stable choice)."""
    from pyspark.sql import Window

    key = F.md5(F.concat_ws("#", F.lit(str(seed)), *[F.col(c).cast("string") for c in rows.columns]))
    w = Window.partitionBy(*strata_cols).orderBy(key)
    n = Window.partitionBy(*strata_cols)
    return (
        rows.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(n))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * F.lit(frac)))
        .drop("__rn", "__n")
    )
