"""Deterministic synthetic input: an (Iceberg-shaped) table of source-code
repositories ``(repo, path, commit, lang, content)``.

BASELINE.json input_hint requires the pipeline input to have exactly this
shape; no external data is allowed, so tests and benches synthesize it here
with fixed seeds. The generator is pure Spark (no driver-side row loops):
``spark.range`` -> Column expressions, so it scales to any row count.

Content is word-salad drawn from a small vocabulary via seeded hashes, with
deliberate edge rows mirroring the reference corpus quirks the engine must
handle (SURVEY.md / FIXTURES.md F1):

* empty content rows          -> filter_empty parity (corpus.py:315-322)
* exact duplicate rows        -> URL-dedup parity (corpus.py:254-256)
* curly quotes + newlines     -> unicodify parity (corpus.py:242-248)
* a few giant outliers        -> skew-path tests (north_star: giant docs)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = [
    "cargo", "freight", "airline", "shipment", "pallet", "container",
    "customs", "airport", "logistics", "carrier", "pharma", "handler",
    "capacity", "tonnage", "route", "hub", "warehouse", "cool", "chain",
    "animal", "transport", "dangerous", "goods", "charter", "express",
    "forwarder", "terminal", "network", "fleet", "schedule", "security",
    "temperature", "sensitive", "perishable", "valuable", "digital",
    "booking", "platform", "partnership", "expansion", "growth", "demand",
]

LANGS = ["py", "java", "js", "go", "md"]


def synth_documents(
    spark: SparkSession,
    n_rows: int = 200,
    seed: int = 42,
    words_per_doc: int = 40,
    n_repos: int = 20,
    giant_every: int = 97,
    dup_every: int = 13,
    empty_every: int = 29,
    distinct_paths: bool = False,
) -> DataFrame:
    """Build the (repo, path, commit, lang, content) input table.

    Deterministic in (n_rows, seed, ...): same args -> byte-identical rows,
    so per-row sha256 invariants hold across runs (BASELINE.json input_hint).

    ``distinct_paths=True`` makes every row's (repo, path) unique: the
    default path space (~500 mod names x languages) caps distinct
    (repo, path, commit) keys near 10k, and docs_clean's key dedup then
    collapses ANY larger corpus to ~10k real documents — fine for
    correctness fixtures, fatal for throughput measurement (a "200k-doc"
    scaling corpus was silently ~10k docs of real work past the first
    stage; discovered round 3). Scaling benches must set it.
    """
    df = spark.range(n_rows).withColumnRenamed("id", "i")
    h = F.abs(F.xxhash64(F.col("i"), F.lit(seed)))
    df = (
        df.withColumn("repo", F.concat(F.lit("org/repo-"), F.lpad((h % n_repos).cast("string"), 5, "0")))
        .withColumn(
            "path",
            F.concat(
                F.lit("src/pkg/mod_"),
                (
                    F.col("i") if distinct_paths
                    else (F.abs(F.xxhash64(F.col("i"), F.lit(seed + 1))) % 500)
                ).cast("string"),
                F.lit("."),
                F.element_at(F.array(*[F.lit(x) for x in LANGS]), (h % len(LANGS) + 1).cast("int")),
            ),
        )
        .withColumn("lang", F.element_at(F.array(*[F.lit(x) for x in LANGS]), (h % len(LANGS) + 1).cast("int")))
        .withColumn("commit", F.sha1(F.concat(F.col("repo"), F.lit("@"), F.col("path"), F.lit(seed))))
    )
    # content: sentences with function-word scaffolding so noun-phrase
    # chunks are realistic (1-2 word NPs, verbs/preps between them);
    # giant rows get 60x length
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    verbs = ["moved", "carried", "launched", "handles", "offers", "expanded"]
    n_sents = max(1, words_per_doc // 5)
    sent_cols = []
    for s in range(n_sents):
        def pick(slot: int):
            ix = (
                F.abs(F.xxhash64(F.col("i"), F.lit(seed + 2), F.lit(s * 7 + slot)))
                % len(VOCAB) + 1
            ).cast("int")
            return F.element_at(vocab_arr, ix)
        verb = verbs[s % len(verbs)]
        sent_cols.append(
            F.concat_ws(
                " ",
                F.lit("the"), pick(0), pick(1), F.lit(verb), pick(2),
                F.lit("to the"), pick(3), pick(4),
            )
        )
    content = F.concat(F.array_join(F.array(*sent_cols), ". "), F.lit("."))
    # sprinkle curly quotes + newlines for unicodify parity
    content = F.concat(
        content,
        F.lit(" "),
        F.lit("“quoted” ‘single’ text\nnext paragraph."),
    )
    giant = F.concat(F.lit(""), F.repeat(F.concat(content, F.lit(" ")), 60))
    df = df.withColumn(
        "content",
        F.when(F.col("i") % empty_every == 3, F.lit(""))
        .when(F.col("i") % giant_every == 7, giant)
        .otherwise(content),
    )
    # exact-duplicate rows: every dup_every-th row clones row i-1's identity
    dup = F.col("i") % dup_every == 5
    df = (
        df.withColumn("repo", F.when(dup, F.lit("org/repo-00000")).otherwise(F.col("repo")))
        .withColumn("path", F.when(dup, F.lit("src/pkg/dup.py")).otherwise(F.col("path")))
        .withColumn("commit", F.when(dup, F.sha1(F.col("repo"))).otherwise(F.col("commit")))
        .withColumn(
            "content",
            F.when(dup, F.lit("duplicate body duplicate body duplicate body.")).otherwise(
                F.col("content")
            ),
        )
    )
    return df.select("repo", "path", "commit", "lang", "content")
