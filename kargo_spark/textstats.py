"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

Everything is built-in Column expressions (whole-stage codegen) — these run
per-document over 100 TB, so no Python may touch the hot path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons (n-gram heuristic language ID).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "para"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "avec", "une"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "von", "ein"],
}

STOPWORDS_EN = (
    "the a an and or but of to in on at for with from by as is are was were "
    "be been it its this that these those they their we you he she not no"
).split()


def _tokens(col):
    return F.filter(F.split(F.lower(col), r"[^a-z0-9']+"), lambda t: t != "")


# Every signal builder below takes an optional pre-projected ``toks``
# array column. Motivation (r06 profile): higher-order-function lambdas
# are evaluated INTERPRETED (no whole-stage codegen), so they get no
# subexpression elimination — a query combining these signals re-split
# the document once per reference (42 split() nodes in q_lang_quality's
# physical plan; measured 1.8 s noop at sf0.1). Projecting the token
# array ONCE and passing it in leaves a single split in the plan
# (CollapseProject keeps a non-cheap alias that is referenced more than
# once) — measured 0.64 s, identical values. Callers that pass nothing
# get the old tokenize-inline behavior.


def token_count(col, toks=None):
    """Whitespace-word count + a BPE-ish subword estimate (chars/4 bound,
    the common rule-of-thumb for byte-pair tokenizers)."""
    words = F.size(toks if toks is not None else _tokens(col))
    bpe_est = F.ceil(F.length(col) / 4).cast("long")
    return words.cast("long").alias("n_words"), bpe_est.alias("n_tokens_bpe_est")


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    w, b = token_count(F.col(text_col))
    return docs.withColumn("n_words", w).withColumn("n_tokens_bpe_est", b)


def language_scores(col, toks=None) -> dict[str, "F.Column"]:
    """Per-language marker-hit ratio columns (exact rationals in double)."""
    toks = toks if toks is not None else _tokens(col)
    n = F.greatest(F.size(toks), F.lit(1))
    out = {}
    for lang, markers in _LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        out[lang] = hits / n
    return out


def language_id(col, toks=None):
    """Heuristic language ID: argmax of marker-lexicon hit ratio with
    FIRST-WINS tiebreak in lexicon order (en, es, fr, de) — deterministic
    and exactly replicable in ANSI SQL (chained CASE); 'und' if no hits."""
    s = language_scores(col, toks=toks)
    langs = list(_LANG_MARKERS)
    expr = F.lit(langs[-1])
    for i in range(len(langs) - 2, -1, -1):
        li = langs[i]
        cond = None
        for lj in langs[i + 1:]:
            c = s[li] >= s[lj]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(li)).otherwise(expr)
    no_hits = None
    for lang in langs:
        c = s[lang] == 0
        no_hits = c if no_hits is None else (no_hits & c)
    return F.when(no_hits, F.lit("und")).otherwise(expr)


def quality_score(col, stopwords: list[str] | None = None, toks=None):
    """Composite document-quality heuristics (Gopher/C4-style filters):

    * mean word length in [3, 10]
    * stopword ratio >= 0.05 (natural language, not code/tables)
    * alpha ratio (letters / chars) >= 0.6
    * non-empty

    Returns a struct(mean_word_len, stopword_ratio, alpha_ratio, quality)
    with quality in [0,1] = fraction of heuristics passed.
    """
    toks = toks if toks is not None else _tokens(col)
    n = F.greatest(F.size(toks), F.lit(1))
    mean_wl = F.aggregate(toks, F.lit(0).cast("long"),
                          lambda acc, t: acc + F.length(t)) / n
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    sw_ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / n
    alpha_ratio = (
        F.length(F.regexp_replace(col, r"[^A-Za-z]", "")) / F.greatest(F.length(col), F.lit(1))
    )
    checks = [
        (mean_wl >= 3) & (mean_wl <= 10),
        sw_ratio >= 0.05,
        alpha_ratio >= 0.6,
        F.length(F.trim(col)) > 0,
    ]
    quality = sum(F.when(c, 1).otherwise(0) for c in checks) / F.lit(float(len(checks)))
    return F.struct(
        mean_wl.cast("double").alias("mean_word_len"),
        sw_ratio.cast("double").alias("stopword_ratio"),
        alpha_ratio.cast("double").alias("alpha_ratio"),
        quality.cast("double").alias("quality"),
    )


def repetition_signals(col, toks=None):
    """Within-document repetition signals (Gopher/MassiveText repetition
    filters, the SQL-expressible subset): fraction of duplicate words and
    duplicate word-3-grams, plus the frequency share of the single most
    repeated word. High values mark boilerplate / template / spam docs a
    training pipeline should drop. Pure Column math — codegen, no UDF.

    Returns struct(n_words, dup_word_ratio, dup_3gram_ratio,
    top_word_ratio), ratios 0.0 on empty docs.
    """
    toks = toks if toks is not None else _tokens(col)
    n = F.size(toks)
    nd = F.greatest(n, F.lit(1)).cast("double")
    dup_word = (n - F.size(F.array_distinct(toks))) / nd
    idx = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, 3), " "))
    ng = F.greatest(F.size(grams), F.lit(1)).cast("double")
    dup_gram = (F.size(grams) - F.size(F.array_distinct(grams))) / ng
    # most-frequent-word share: sort, then a single fold tracking the
    # longest equal-run — O(n log n) per doc even for giant docs (an
    # O(distinct · words) nested scan would stall on 100k-word documents)
    run = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda a, t: F.struct(
            t.alias("prev"),
            F.when(t == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a["best"],
                F.when(t == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_ratio = run["best"] / nd
    return F.struct(
        n.cast("long").alias("n_words"),
        dup_word.cast("double").alias("dup_word_ratio"),
        dup_gram.cast("double").alias("dup_3gram_ratio"),
        top_ratio.cast("double").alias("top_word_ratio"),
    )


def quality_filter(
    col,
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stopword_ratio: float = 0.05,
    min_alpha_ratio: float = 0.6,
    max_dup_3gram_ratio: float = 0.5,
    max_top_word_ratio: float = 0.3,
    stopwords: list[str] | None = None,
    toks=None,
):
    """Composite Gopher/C4-style KEEP decision for a training corpus —
    the filter stage big-LM pipelines run between dedup and tokenization,
    assembled from this module's quality and repetition signals. Every
    underlying ratio is an exact rational of integer counts, so the
    boolean thresholds are engine-portable (no float-boundary flakiness
    between Spark and the DuckDB oracle). Pure Column codegen.

    Returns struct(words_ok, word_len_ok, stopword_ok, alpha_ok,
    repetition_ok, keep) — per-rule booleans so a pipeline can report WHY
    documents were dropped (filter observability), keep = all rules.
    """
    q = quality_score(col, stopwords, toks=toks)
    r = repetition_signals(col, toks=toks)
    words_ok = (r["n_words"] >= min_words) & (r["n_words"] <= max_words)
    word_len_ok = (
        (q["mean_word_len"] >= min_mean_word_len)
        & (q["mean_word_len"] <= max_mean_word_len)
    )
    stopword_ok = q["stopword_ratio"] >= min_stopword_ratio
    alpha_ok = q["alpha_ratio"] >= min_alpha_ratio
    repetition_ok = (
        (r["dup_3gram_ratio"] <= max_dup_3gram_ratio)
        & (r["top_word_ratio"] <= max_top_word_ratio)
    )
    keep = words_ok & word_len_ok & stopword_ok & alpha_ok & repetition_ok
    return F.struct(
        words_ok.alias("words_ok"),
        word_len_ok.alias("word_len_ok"),
        stopword_ok.alias("stopword_ok"),
        alpha_ok.alias("alpha_ok"),
        repetition_ok.alias("repetition_ok"),
        keep.alias("keep"),
    )


PII_PATTERNS = [
    # applied in order; counts are taken on the progressively redacted
    # text so an SSN is never double-counted by the phone rule
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\-\s()]{7,}\d", "<PHONE>"),
]


def redact_pii(col):
    """Training-corpus PII scrub (C4-style): emails, SSNs, IPv4 addresses
    and long digit runs (phones) replaced with typed placeholders. Pure
    Column regexp ops — whole-stage codegen, no UDF.

    Returns struct(n_email, n_ssn, n_ipv4, n_phone, redacted). Rules are
    ordered and each count is taken after the previous rule's replacement,
    so overlapping patterns resolve deterministically.
    """
    redacted = col
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(redacted, F.lit(pat)).alias(f"n_{name}"))
        redacted = F.regexp_replace(redacted, pat, repl)
    return F.struct(*counts, redacted.alias("redacted"))


def make_html_unescape():
    """html.unescape as a scalar-iterator pandas_udf (reference terms.py:80,
    corpus.py:539 call it per doc; no native Spark equivalent)."""
    import html

    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def unescape(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            yield s.map(lambda x: html.unescape(x) if x is not None else None)

    return unescape


def fingerprint(col, n: int = 4, toks=None):
    """Deterministic document fingerprint: md5 over the document's sorted
    distinct word n-gram hash set — a rolling-hash-style content signature
    robust to word order at the edges (winnowing-lite)."""
    toks = toks if toks is not None else _tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, n), " ")))
    return F.md5(F.array_join(F.array_sort(F.array_distinct(grams)), ","))
