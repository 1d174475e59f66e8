"""NLP annotation stage: ``docs_clean -> sentences -> tokens``.

The reference runs a stanza pipeline per document (reference corpus.py:
227-232, 445-492: tokenize / POS / lemma, ``tokenize_no_ssplit=True`` after
nltk sentence split at corpus.py:513). Heavy NLP models are not available
in this environment and are not the point — the engine contract is the
*stage shape*: an Arrow-vectorized ``mapInPandas`` that turns 1 document
row into N token rows (UDTF-shaped), loading any per-worker state once per
partition, never per row.

The tagger here is a deterministic lexicon+suffix heuristic producing the
coarse tags the candidate grammar needs (NOUN/PROPN/ADJ/NUM vs rest, the
pke grammar ``{<NOUN|PROPN|NUM|ADJ>*<NOUN|PROPN>}`` — reference
main.py:99-102). Swapping in a real model is a 1-function change: replace
``_tag_batch`` and keep the schema.

Offsets are document-absolute character offsets (the reference keeps
sentence-relative ones, corpus.py:57-58; we keep absolute plus sentence
start so both are derivable).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKENS_SCHEMA = (
    "doc_id string, sentence_id int, token_id int, word string, lemma string, "
    "pos string, offset_begin long, offset_end long"
)

_SENT_BREAK = re.compile(r"(?<=[.!?])\s+|\n+")
_TOKEN = re.compile(r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]")

_FUNCTION_WORDS = {
    "the": "DET", "a": "DET", "an": "DET", "this": "DET", "that": "DET",
    "of": "ADP", "in": "ADP", "on": "ADP", "at": "ADP", "to": "ADP",
    "for": "ADP", "with": "ADP", "from": "ADP", "by": "ADP", "as": "ADP",
    "and": "CCONJ", "or": "CCONJ", "but": "CCONJ",
    "is": "AUX", "are": "AUX", "was": "AUX", "were": "AUX", "be": "AUX",
    "has": "AUX", "have": "AUX", "had": "AUX", "will": "AUX", "would": "AUX",
    "it": "PRON", "its": "PRON", "they": "PRON", "their": "PRON", "we": "PRON",
    "not": "PART", "also": "ADV", "more": "ADV", "most": "ADV", "very": "ADV",
}

_VERBS = {
    "said", "says", "say", "announced", "launched", "launch", "operates",
    "operate", "carried", "carry", "carries", "moved", "move", "moves",
    "signed", "sign", "expanded", "expand", "added", "add", "adds",
    "handles", "handle", "handled", "provides", "provide", "provided",
    "offers", "offer", "offered", "increased", "increase", "grew", "grow",
    "run", "runs", "ran", "use", "uses", "used", "make", "makes", "made",
}

_ADJ_SUFFIX = ("ous", "ful", "ive", "able", "ible", "al", "ic", "ary", "less")


def _tag_word(word: str, is_sent_start: bool) -> str:
    lw = word.lower()
    if lw in _FUNCTION_WORDS:
        return _FUNCTION_WORDS[lw]
    if word.isdigit() or re.fullmatch(r"\d+(\.\d+)?", word):
        return "NUM"
    if not word[0].isalnum():
        return "PUNCT"
    if lw in _VERBS:
        return "VERB"
    if lw.endswith("ly"):
        return "ADV"
    if lw.endswith(_ADJ_SUFFIX):
        return "ADJ"
    if word[0].isupper() and not is_sent_start:
        return "PROPN"
    return "NOUN"


def _lemma(word: str, pos: str) -> str:
    lw = word.lower()
    if pos in ("NOUN", "PROPN") and len(lw) > 3 and lw.endswith("s") and not lw.endswith("ss"):
        return lw[:-1]
    return lw


def _annotate_doc(doc_id: str, content: str) -> list[tuple]:
    """Single linear pass: tokenize the whole document once; a sentence
    break occurs at a token boundary when the inter-token gap contains a
    newline, or contains whitespace and the previous token ends in [.!?]
    (equivalent to splitting on ``(?<=[.!?])\\s+|\\n+`` then tokenizing
    each segment, reference corpus.py:513 nltk-sentence-split semantics,
    but without the O(segments x find) rescans)."""
    rows = []
    sent_id = 1
    tok_id = 0
    prev_end = 0
    prev_last_char = ""
    # vocabulary is tiny relative to token count: memoize (word, sent_start)
    # -> (pos, lemma) so tagging cost is per-type, not per-token
    memo: dict[tuple[str, bool], tuple[str, str]] = {}
    for m in _TOKEN.finditer(content):
        # gaps are pure whitespace (the token regex consumes every
        # non-whitespace char), so: break on newline, or on any whitespace
        # following sentence-final punctuation
        gap = content[prev_end:m.start()]
        if tok_id > 0 and gap and ("\n" in gap or prev_last_char in ".!?"):
            sent_id += 1
            tok_id = 0
        tok_id += 1
        word = m.group(0)
        key = (word, tok_id == 1)
        hit = memo.get(key)
        if hit is None:
            pos = _tag_word(word, tok_id == 1)
            hit = (pos, _lemma(word, pos))
            memo[key] = hit
        rows.append(
            (doc_id, sent_id, tok_id, word, hit[1], hit[0], m.start(), m.end())
        )
        prev_end = m.end()
        prev_last_char = word[-1]
    return rows


def _annotate_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["doc_id", "sentence_id", "token_id", "word", "lemma", "pos",
            "offset_begin", "offset_end"]
    for pdf in batches:
        out: list[tuple] = []
        for doc_id, content in zip(pdf["doc_id"].values, pdf["content"].values):
            if content:
                out.extend(_annotate_doc(doc_id, content))
        yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in zip(
                cols, [object, np.int32, np.int32, object, object, object, np.int64, np.int64])}
        )


def tokenize(docs: DataFrame) -> DataFrame:
    """``docs_clean -> tokens``: 1 doc row -> N token rows via mapInPandas.

    Only (doc_id, content) are shipped through Arrow — column pruning is
    explicit so a 100-TB scan never serializes unused columns into Python.
    """
    return docs.select("doc_id", "content").mapInPandas(_annotate_batches, TOKENS_SCHEMA)


def sentences_with_tokens(tokens: DataFrame) -> DataFrame:
    """Group the token table back to one row per sentence with an ordered
    token array — the unit the candidate miner consumes.

    Shuffle on (doc_id, sentence_id) only; sort_array makes the order
    explicit rather than relying on collect_list ordering.
    """
    tok_struct = F.struct(
        F.col("token_id"), F.col("word"), F.col("lemma"), F.col("pos"),
        F.col("offset_begin"), F.col("offset_end"),
    )
    return (
        tokens.groupBy("doc_id", "sentence_id")
        .agg(F.sort_array(F.collect_list(tok_struct)).alias("toks"))
    )
