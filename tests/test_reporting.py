"""LaTeX stats-table / NER-table sinks + Vega-Lite eval plot sink
(reference corpus.py:739-867, evaluation.py:144-220)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kargo_spark import nlp
from kargo_spark.corpus import corpus_summary
from kargo_spark.reporting import (
    corpus_totals,
    eval_plot_spec,
    melt_eval_scores,
    ner_table_latex,
    save_plot_html,
    stats_table_latex,
    terms_totals,
)


def _totals(spark, text):
    docs = spark.createDataFrame([("d1", text)], "doc_id string, content string")
    doc_stats, ner_counts, _ = corpus_summary(nlp.tokenize(docs))
    return corpus_totals(doc_stats, ner_counts)


def test_corpus_totals_and_stats_table(spark):
    cs = {
        "Dev Set": _totals(
            spark, "Lufthansa Cargo moved fresh goods. The big carrier grew fast."
        )
    }
    terms = spark.createDataFrame(
        [("d1", "air cargo"), ("d1", "carrier"), ("d2", "fresh goods")],
        "doc_id string, term string",
    )
    ts = {"Dev Set": terms_totals(terms)}
    assert ts["Dev Set"]["total_terms"] == 3
    assert ts["Dev Set"]["terms_p_document"] == 1.5
    assert abs(ts["Dev Set"]["words_p_terms"] - 5 / 3) < 1e-9

    table = stats_table_latex(cs, ts)
    lines = table.splitlines()
    # header + 16 data rows, reference row order
    assert lines[0] == "  & \\textbf{Dev Set}\\\\ \\hline"
    assert lines[1] == "Total documents & 1\\\\"
    assert lines[2].startswith("Total sentences & 2")
    assert any(line.startswith("Tokens per sentence & ") for line in lines)
    assert "Tokens per terms & 1.67\\\\" in table


def test_stats_table_train_set_dash_column(spark):
    cs = {"Train Set": _totals(spark, "Cargo grew. Lufthansa Cargo flew."),
          "Dev Set": _totals(spark, "The carrier moved goods to Frankfurt.")}
    terms = spark.createDataFrame([("d1", "cargo")], "doc_id string, term string")
    ts = {"Dev Set": terms_totals(terms)}  # no terms CSV for Train Set
    table = stats_table_latex(cs, ts)
    # the reference hard-codes '-' for corpora without a terms CSV
    assert "Total terms & - & 1\\\\" in table
    assert "Terms per document & - & 1.00\\\\" in table


def test_ner_table_percentages_sum_to_100(spark):
    cs = {"Dev Set": _totals(
        spark, "Lufthansa Cargo shipped 500 tons to Frankfurt Airport in January."
    )}
    assert cs["Dev Set"]["#ner"] > 0
    table = ner_table_latex(cs)
    rows = [line for line in table.splitlines()[1:] if line]
    pcts = [float(r.split("&")[1].strip().rstrip("\\%").rstrip("\\")) for r in rows]
    assert abs(sum(pcts) - 100.0) < 0.5  # rounding to 0.1 per row
    assert rows[0].startswith("ORG & ")


def test_eval_plot_spec_and_html(spark, tmp_path):
    agg = spark.createDataFrame(
        [("tfidf", 5, 0.6), ("tfidf", 10, 0.5), ("yake", 5, 0.4), ("yake", 10, 0.3)],
        "method string, k int, mean double",
    )
    melted = melt_eval_scores(agg, agg, agg)
    assert len(melted) == 4 * 3
    assert {m["Evaluation"] for m in melted} == {"F-score", "Precisions", "Relative Recalls"}

    spec = eval_plot_spec(melted)
    assert spec["$schema"].endswith("v5.json")
    line, bar = spec["vconcat"]
    assert line["encoding"]["column"]["field"] == "Evaluation"
    assert bar["encoding"]["x"]["aggregate"] == "mean"
    json.dumps(spec)  # must be serializable

    out = tmp_path / "eval.html"
    save_plot_html(spec, str(out))
    html = out.read_text()
    assert "vegaEmbed" in html and '"values"' in html
