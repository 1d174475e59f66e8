"""Driver-side report sinks: LaTeX stats tables + eval plot spec.

Reference parity: ``doc_stats`` (reference corpus.py:739-867) writes
``results/stats/stats-table.ltx`` and ``ner-table.ltx`` from the summed
``get_summary`` per-doc counters plus terms-CSV shape stats;
``Evaluator.evaluate_and_visualize`` (reference evaluation.py:144-220)
writes an Altair interactive HTML of P@k / relative-recall@k / F@k.

Both sinks consume ONLY small aggregated results (one row per corpus, or
one row per (method, k)) — the heavy aggregation runs in Spark
(``corpus.corpus_summary``, ``evaluation.aggregate_scores``); these
helpers format a tiny ``collect()``/``toPandas()`` on the driver, which
is exactly where the reference runs them too.

Altair is not installed in this container, but Altair is only a Vega-Lite
spec compiler: ``eval_plot_spec`` emits the Vega-Lite v5 JSON directly
and ``save_plot_html`` wraps it in a vega-embed page, so the plot sink
produces a real interactive HTML with zero extra dependencies.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NE_TYPES = ["ORG", "DATE", "PERSON", "GPE", "CARDINAL", "FAC"]


def corpus_totals(doc_stats: DataFrame, ner_type_counts: DataFrame) -> dict:
    """Sum the per-doc ``corpus.corpus_summary`` counters into the
    reference's per-corpus ``corpus_stats`` dict (corpus.py:748-761 sums
    per-doc summary values, including per-doc unique-lemma counts)."""
    row = doc_stats.agg(
        F.count(F.lit(1)).alias("length"),
        F.sum("n_sents").alias("sents"),
        F.sum("n_sents_w_ne").alias("sents_w_ne"),
        F.sum("n_toks").alias("toks"),
        F.sum("n_nouns").alias("nouns"),
        F.sum("n_verbs").alias("verbs"),
        F.sum("n_adjs").alias("adjs"),
        F.sum("n_ner").alias("ner"),
        F.sum("unique_lemma").alias("unique_lemma"),
    ).collect()[0]
    out = {
        "length": row["length"],
        "#sents": int(row["sents"] or 0),
        "#sents_w_ne": int(row["sents_w_ne"] or 0),
        "#toks": int(row["toks"] or 0),
        "#nouns": int(row["nouns"] or 0),
        "#verbs": int(row["verbs"] or 0),
        "#adjs": int(row["adjs"] or 0),
        "#ner": int(row["ner"] or 0),
        "unique_lemma": int(row["unique_lemma"] or 0),
    }
    for ne in NE_TYPES:
        out[f"#ne_{ne}"] = 0
    for r in ner_type_counts.groupBy("ner_type").agg(F.sum("n").alias("n")).collect():
        out[f"#ne_{r['ner_type']}"] = int(r["n"])
    return out


def terms_totals(terms: DataFrame) -> dict:
    """Terms-per-document / words-per-term stats from a (doc_id, term)
    table (reference corpus.py:776-788 over the '|'-joined terms CSV)."""
    per_doc = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_terms"))
    words = terms.select(
        F.size(F.filter(F.split("term", " "), lambda t: F.length(t) > 0)).alias("n_words")
    )
    total, mean_tpd = per_doc.agg(
        F.sum("n_terms"), F.avg("n_terms")
    ).collect()[0]
    mean_wpt = words.agg(F.avg("n_words")).collect()[0][0]
    return {
        "total_terms": int(total or 0),
        "terms_p_document": float(mean_tpd or 0.0),
        "words_p_terms": float(mean_wpt or 0.0),
    }


def _row(label: str, cells: list[str]) -> str:
    return " & ".join([label] + cells) + "\\\\\n"


def _ratio(num: float, den: float, fmt: str = "{:.2f}") -> str:
    """'-' on an empty denominator (a corpus with no sentences / no NEs)
    instead of the reference's ZeroDivisionError."""
    return fmt.format(num / den) if den else "-"


def stats_table_latex(
    corpus_stats: dict[str, dict], terms_stats: dict[str, dict]
) -> str:
    """The reference stats-table.ltx, row for row (corpus.py:789-846).
    ``terms_stats`` corpora lacking a column render '-' like the
    reference's hard-coded Train Set dash."""
    cs, ts = corpus_stats, terms_stats
    cols = list(cs)

    def _term_vals(key, fmt=str):
        # index by corpus NAME, not position: positional dash-padding put
        # term rows under the wrong corpus headers whenever the terms dict
        # wasn't exactly the trailing corpora in order (r02 ADVICE low #4)
        return [fmt(ts[c][key]) if c in ts else "-" for c in cols]
    out = " & ".join([" "] + ["\\textbf{" + c + "}" for c in cols]) + "\\\\ \\hline\n"
    out += _row("Total documents", [str(cs[c]["length"]) for c in cols])
    out += _row("Total sentences", [str(cs[c]["#sents"]) for c in cols])
    out += _row("Total sentences w/NE", [str(cs[c]["#sents_w_ne"]) for c in cols])
    out += _row("Total tokens", [str(cs[c]["#toks"]) for c in cols])
    out += _row("Total nouns", [str(cs[c]["#nouns"]) for c in cols])
    out += _row("Total verbs", [str(cs[c]["#verbs"]) for c in cols])
    out += _row("Total adjectives", [str(cs[c]["#adjs"]) for c in cols])
    out += _row("Total terms", _term_vals("total_terms"))
    out += _row("Unique Lemma", [str(cs[c]["unique_lemma"]) for c in cols])
    out += (
        " & ".join(
            ["Unique Lemma Ratio"]
            + [_ratio(cs[c]["unique_lemma"], cs[c]["#toks"]) for c in cols]
        )
        + "\\\\ \\hline\n"
    )
    out += _row(
        "Sentences per document",
        [_ratio(cs[c]["#sents"], cs[c]["length"]) for c in cols],
    )
    out += _row(
        "Terms per document",
        _term_vals("terms_p_document", "{:.2f}".format),
    )
    out += _row(
        "Tokens per sentence",
        [_ratio(cs[c]["#toks"], cs[c]["#sents"]) for c in cols],
    )
    out += _row(
        "Nouns per sentence",
        [_ratio(cs[c]["#nouns"], cs[c]["#sents"]) for c in cols],
    )
    out += _row(
        "Verbs per sentence",
        [_ratio(cs[c]["#verbs"], cs[c]["#sents"]) for c in cols],
    )
    out += _row(
        "Adjectives per sentence",
        [_ratio(cs[c]["#adjs"], cs[c]["#sents"]) for c in cols],
    )
    out += _row(
        "Tokens per terms",
        _term_vals("words_p_terms", "{:.2f}".format),
    )
    return out


def ner_table_latex(corpus_stats: dict[str, dict]) -> str:
    """The reference ner-table.ltx: NE-type percentage rows + Others
    (corpus.py:847-867)."""
    cs = corpus_stats
    cols = list(cs)
    out = " & ".join([" "] + ["\\textbf{" + c + "}" for c in cols]) + "\\\\ \\hline\n"
    covered = {c: 0 for c in cols}
    for ne in NE_TYPES:
        out += _row(
            ne,
            [_ratio(cs[c][f"#ne_{ne}"] * 100, cs[c]["#ner"], "{:.1f}\\%") for c in cols],
        )
        for c in cols:
            covered[c] += cs[c][f"#ne_{ne}"]
    out += _row(
        "Others",
        [
            _ratio((cs[c]["#ner"] - covered[c]) * 100, cs[c]["#ner"], "{:.1f}\\%")
            for c in cols
        ],
    )
    return out


def melt_eval_scores(
    prec_agg: DataFrame, rec_agg: DataFrame, fsc_agg: DataFrame
) -> list[dict]:
    """Combine the (method, k, mean) aggregates and melt to the chart's
    long form [{Method, k, Evaluation, Score}] — the reference's
    combine_melt_df (evaluation.py:155-170). Joins run in Spark; the
    collected result is |methods| x |ks| x 3 rows."""
    j = (
        fsc_agg.select("method", "k", F.col("mean").alias("F-score"))
        .join(prec_agg.select("method", "k", F.col("mean").alias("Precisions")), ["method", "k"])
        .join(rec_agg.select("method", "k", F.col("mean").alias("Relative Recalls")), ["method", "k"])
    )
    melted = []
    for r in j.collect():
        for ev in ["F-score", "Precisions", "Relative Recalls"]:
            melted.append(
                {"Method": r["method"], "k": int(r["k"]), "Evaluation": ev,
                 "Score": round(float(r[ev]), 6)}
            )
    return melted


def eval_plot_spec(melted: list[dict]) -> dict:
    """Vega-Lite v5 spec with the reference chart's semantics
    (evaluation.py:168-220): per-Evaluation column of line+point charts
    (x=k, y=Score, color=Method, tooltip) over a click-to-filter
    Method-selection bar chart of mean F-score."""
    click = {"name": "click", "select": {"type": "point", "fields": ["Method"]}}
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "data": {"values": melted},
        "vconcat": [
            {
                "mark": {"type": "line", "point": True},
                "encoding": {
                    "x": {"field": "k", "type": "quantitative"},
                    "y": {"field": "Score", "type": "quantitative"},
                    "color": {"field": "Method", "type": "nominal"},
                    "column": {"field": "Evaluation", "type": "nominal"},
                    "tooltip": [
                        {"field": "Method"}, {"field": "k"}, {"field": "Score"}
                    ],
                },
                "transform": [{"filter": {"param": "click"}}],
            },
            {
                "mark": "bar",
                "params": [click],
                "transform": [{"filter": "datum.Evaluation == 'F-score'"}],
                "encoding": {
                    "x": {
                        "aggregate": "mean", "field": "Score",
                        "type": "quantitative", "title": "Avg F-score",
                    },
                    "y": {"field": "Method", "type": "nominal", "sort": "-x"},
                    "color": {
                        "condition": {
                            "param": "click",
                            "field": "Method", "type": "nominal",
                        },
                        "value": "lightgray",
                    },
                },
            },
        ],
    }


def save_plot_html(spec: dict, path: str) -> None:
    """Interactive HTML via vega-embed (what altair_saver emits)."""
    html = (
        "<!DOCTYPE html><html><head>"
        '<script src="https://cdn.jsdelivr.net/npm/vega@5"></script>'
        '<script src="https://cdn.jsdelivr.net/npm/vega-lite@5"></script>'
        '<script src="https://cdn.jsdelivr.net/npm/vega-embed@6"></script>'
        '</head><body><div id="vis"></div><script>'
        f"vegaEmbed('#vis', {json.dumps(spec)});"
        "</script></body></html>"
    )
    with open(path, "w") as f:
        f.write(html)
