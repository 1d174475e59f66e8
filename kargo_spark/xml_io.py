"""XML corpus sources: the reference's two on-disk corpus formats.

* ``read_corpus_xml``    — raw scraped-news corpus: one ``<corpus>`` root,
  ``<document>`` children with document_id/url/title/author/published_time/
  categories/topics and ``<content><p>...`` paragraphs (reference
  corpus.py:324-366 ``Corpus.__init__`` / ``read_from_xml``; files
  data/processed/news/relevant/{train,dev,test}.xml with 557/53/52 docs).
* ``read_corenlp_tokens`` — StanfordCoreNLPCorpus folders: one XML per
  document, ``<sentence>`` / ``<token>`` children carrying the 11 token
  attributes (word, lemma, offsets, POS, deprel, deprel_head_id,
  deprel_head_text, term_tag, ner — reference corpus.py:40-66
  SentenceParser.valid_attrs; files data/processed/news/relevant/dev/*.xml).

Spark shape: ``spark.read.text(..., wholetext=True)`` distributes one row
per file across partitions (at 10^12 files this is an ordinary parallel
file scan with partition pruning); parsing runs in ``mapInPandas`` with
stdlib ElementTree — Arrow batches in, one token/document row out. No
driver-side file loop anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORENLP_TOKENS_SCHEMA = (
    "doc_id string, sentence_id int, token_id int, word string, lemma string, "
    "pos string, offset_begin long, offset_end long, "
    "ner string, deprel string, deprel_head_id int, term_tag string"
)

CORPUS_DOCS_SCHEMA = (
    "doc_id string, url string, title string, author string, "
    "published_time string, content string"
)


def _txt(el, tag: str, default: str = "") -> str:
    c = el.find(tag)
    return c.text if c is not None and c.text is not None else default


def _parse_corenlp(doc_id: str, xml: str) -> list[tuple]:
    import xml.etree.ElementTree as ET

    rows: list[tuple] = []
    root = ET.fromstring(xml)
    # sentence_id = 0-based document order, matching the reference's
    # ``enumerate(document.sentences.sentence)`` in relations.py
    # get_all_cooccurrences (annotation meta sent_id)
    for sid, sent in enumerate(root.iter("sentence")):
        for tok in sent.iter("token"):
            rows.append(
                (
                    doc_id,
                    sid,
                    int(tok.get("id")),
                    _txt(tok, "word"),
                    _txt(tok, "lemma"),
                    _txt(tok, "POS"),
                    int(_txt(tok, "CharacterOffsetBegin", "0")),
                    int(_txt(tok, "CharacterOffsetEnd", "0")),
                    _txt(tok, "ner", "O"),
                    _txt(tok, "deprel"),
                    int(_txt(tok, "deprel_head_id", "0") or 0),
                    _txt(tok, "term_tag", "O"),
                )
            )
    return rows


def read_corenlp_tokens(spark: SparkSession, path: str) -> DataFrame:
    """CoreNLP-XML folder/glob -> token table (CORENLP_TOKENS_SCHEMA).

    doc_id = file stem (reference corpus.py:553-560 keys documents by
    filename)."""
    files = (
        spark.read.text(path, wholetext=True)
        .withColumn(
            "doc_id", F.regexp_extract(F.input_file_name(), r"([^/]+)\.xml", 1)
        )
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "sentence_id", "token_id", "word", "lemma", "pos",
            "offset_begin", "offset_end", "ner", "deprel", "deprel_head_id",
            "term_tag",
        ]
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, xml in zip(pdf["doc_id"].values, pdf["value"].values):
                out.extend(_parse_corenlp(doc_id, xml))
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(parse, CORENLP_TOKENS_SCHEMA)


def _parse_corpus(xml: str) -> list[tuple]:
    import xml.etree.ElementTree as ET

    rows: list[tuple] = []
    root = ET.fromstring(xml)
    for doc in root.iter("document"):
        paras = [
            (p.text or "").strip()
            for p in doc.findall("./content/p")
        ]
        rows.append(
            (
                _txt(doc, "document_id"),
                _txt(doc, "url"),
                _txt(doc, "title"),
                _txt(doc, "author"),
                _txt(doc, "published_time"),
                "\n".join(p for p in paras if p),
            )
        )
    return rows


def read_corpus_xml(spark: SparkSession, path: str) -> DataFrame:
    """Raw news-corpus XML (single- or multi-file glob) -> documents table
    (corpus.py:324-366 parity: one row per <document>, paragraphs joined
    with newlines)."""
    files = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "url", "title", "author", "published_time", "content"]
        for pdf in batches:
            out: list[tuple] = []
            for xml in pdf["value"].values:
                out.extend(_parse_corpus(xml))
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(parse, CORPUS_DOCS_SCHEMA)
