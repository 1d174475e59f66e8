"""Graph-based term ranking.

Two tiers, per the north-star ("co-occurrence PageRank computed
per-partition then merged"):

1. **Per-document rankers** (SingleRank / PositionRank / TextRank family —
   reference: pke classes configured at main.py:122-141). Every document's
   co-occurrence graph is tiny, so each runs partition-local inside
   ``applyInPandas`` with a numpy power iteration — zero extra shuffles
   beyond the groupBy(doc_id).

2. **Corpus-level PageRank** over the global term co-occurrence graph:
   edges as a DataFrame, partial (map-side) contribution aggregation per
   iteration — the idiomatic Spark "compute per partition, merge" loop.
   Used for global term salience / canonical-entity weighting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RANK_SCHEMA = "doc_id string, ngram string, term string, score double"


def _rank_schema(df) -> str:
    """Output schema with the caller's doc_id type (string corpus ids vs
    long synthetic ids — Arrow refuses int64 under a string schema)."""
    id_type = df.schema["doc_id"].dataType.simpleString()
    return f"doc_id {id_type}, ngram string, term string, score double"

_CAND_POS = {"NOUN", "PROPN", "ADJ", "NUM"}


def _pagerank_numpy(adj: np.ndarray, personalization: np.ndarray | None = None,
                    d: float = 0.85, iters: int = 50, tol: float = 1e-6) -> np.ndarray:
    """Weighted PageRank power iteration on a dense doc-local matrix."""
    n = adj.shape[0]
    if n == 0:
        return np.zeros(0)
    out_w = adj.sum(axis=1)
    out_w[out_w == 0] = 1.0
    trans = adj / out_w[:, None]
    if personalization is None:
        p = np.full(n, 1.0 / n)
    else:
        p = personalization / max(personalization.sum(), 1e-12)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r_new = (1 - d) * p + d * (trans.T @ r)
        if np.abs(r_new - r).sum() < tol:
            r = r_new
            break
        r = r_new
    return r


def _window_graph_ref(seq_words, seq_glob_idx, vocab, window: int):
    """Reference (loop) builder of the window co-occurrence graph +
    position personalization — kept as the parity oracle for the
    vectorized ``_window_graph`` (a pytest asserts exact equality on
    randomized docs; the yake _yake_word_scores_ref convention)."""
    n = len(vocab)
    adj = np.zeros((n, n))
    pers = np.zeros(n)
    for i, (w, gi) in enumerate(zip(seq_words, seq_glob_idx)):
        wi = vocab[w]
        pers[wi] += 1.0 / (gi + 1)
        j = i + 1
        while j < len(seq_words) and seq_glob_idx[j] - gi < window:
            wj = vocab[seq_words[j]]
            if wj != wi:
                adj[wi, wj] += 1.0
                adj[wj, wi] += 1.0
            j += 1
    return adj, pers


def _window_graph(seq_words, seq_glob_idx, vocab, window: int):
    """Vectorized window co-occurrence graph — bitwise-identical to
    ``_window_graph_ref`` (adjacency entries are exact integer counts;
    ``np.add.at`` applies the personalization increments in the same
    ascending-position order as the loop) but O(window) numpy passes
    instead of an O(tokens x window) Python inner loop: the loop was
    ~25M interpreter iterations per sf0.1 pass of singlerank (r06)."""
    n = len(vocab)
    adj = np.zeros((n, n))
    pers = np.zeros(n)
    if not len(seq_words):
        return adj, pers
    codes = np.array([vocab[w] for w in seq_words], dtype=np.int64)
    gidx = np.asarray(seq_glob_idx, dtype=np.int64)
    np.add.at(pers, codes, 1.0 / (gidx + 1.0))
    # the loop's while-break equals "all j>i with glob gap < window"
    # because seq_glob_idx is strictly increasing; gap >= lag, so lags
    # beyond window-1 contribute nothing
    for lag in range(1, min(window, len(codes))):
        ok = (gidx[lag:] - gidx[:-lag]) < window
        wi, wj = codes[:-lag][ok], codes[lag:][ok]
        neq = wi != wj
        wi, wj = wi[neq], wj[neq]
        np.add.at(adj, (wi, wj), 1.0)
        np.add.at(adj, (wj, wi), 1.0)
    return adj, pers


def _doc_rank(pdf: pd.DataFrame, window: int, position_bias: bool,
              iters: int = 50, tol: float = 1e-6) -> pd.DataFrame:
    """SingleRank (position_bias=False) / PositionRank (True) for one doc.

    Graph nodes = lowercased candidate-POS words; edges = co-occurrence
    within ``window`` tokens (window=10 for SingleRank, main.py:123-128),
    weighted by co-occurrence count. Candidate score = sum of member word
    ranks (pke SingleRank semantics). PositionRank personalizes the
    restart vector with 1/position of each word's occurrences.
    """
    doc_id = pdf["doc_id"].iloc[0]
    toks = pdf.sort_values(["sentence_id", "token_id"])
    mask = toks["pos"].isin(_CAND_POS).values
    words = toks["word"].str.lower().values
    seq_words = words[mask]
    seq_glob_idx = np.flatnonzero(mask)
    vocab = {w: i for i, w in enumerate(pd.unique(seq_words))}
    adj, pers = _window_graph(seq_words, seq_glob_idx, vocab, window)
    ranks = _pagerank_numpy(adj, pers if position_bias else None, iters=iters, tol=tol)
    wscore = {w: ranks[i] for w, i in vocab.items()}
    out = []
    for ngram, term in (
        pdf[["ngram", "term"]].dropna().drop_duplicates("ngram").itertuples(index=False)
    ):
        s = sum(wscore.get(w, 0.0) for w in term.split(" "))
        out.append((doc_id, ngram, term, float(s)))
    return pd.DataFrame(out, columns=["doc_id", "ngram", "term", "score"])


def _spread_groups(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Pre-partition a per-doc applyInPandas input by ``key`` into the
    session's default parallelism. The per-doc ranker inputs are byte-LIGHT
    but CPU-DENSE (r06 measurement at sf0.1: ~2 MB of shuffle carrying
    ~73 s of kernel CPU), so AQE's byte-based partition coalescing — bound
    by the minPartitionSize floor — folds the exchange onto 1-2 tasks and
    serializes the Python stage (noop wall 32.6 s for topic_rank on 32
    cores). An explicit repartition(n, key) is exempt from AQE coalescing
    and already satisfies the groupBy's ClusteredDistribution, so no
    second exchange is planned. Width is defaultParallelism — scale-
    adaptive, never a local[32] constant; KARGO_SPREAD_INPUT=off disables
    (byte-heavy inputs at real scale get wide partitions naturally and
    can prefer AQE's size-based sizing)."""
    import os

    if os.environ.get("KARGO_SPREAD_INPUT", "auto") == "off":
        return df
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, key)


def _make_rank_fn(window: int, position_bias: bool, iters: int = 50, tol: float = 1e-6):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _doc_rank(pdf, window, position_bias, iters=iters, tol=tol)

    return fn


def _rank_input(tokens: DataFrame, cands: DataFrame) -> DataFrame:
    """Union token stream with candidate rows (ngram/term nulls on tokens)
    so one groupBy(doc_id) ships both to the ranker."""
    tok_part = tokens.select(
        "doc_id", "sentence_id", "token_id", "word", "pos",
        F.lit(None).cast("string").alias("ngram"),
        F.lit(None).cast("string").alias("term"),
    )
    cand_part = cands.select(
        "doc_id",
        F.lit(0).alias("sentence_id"),
        F.lit(0).alias("token_id"),
        F.lit("").alias("word"),
        F.lit("").alias("pos"),
        F.col("lemma_term").alias("ngram"),
        "term",
    ).dropDuplicates(["doc_id", "ngram"])
    return tok_part.unionByName(cand_part)


def single_rank(
    tokens: DataFrame, cands: DataFrame, window: int = 10,
    iters: int = 50, tol: float = 1e-6,
) -> DataFrame:
    """``iters``/``tol`` pass through to the power iteration; pinning
    (iters=3, tol=0) makes the ranking SQL-unrollable, which is how the
    driver's singlerank oracle certifies this code path (same device as
    the word_pagerank oracle)."""
    return _spread_groups(_rank_input(tokens, cands)).groupBy("doc_id").applyInPandas(
        _make_rank_fn(window, False, iters=iters, tol=tol), _rank_schema(tokens)
    )


def position_rank(tokens: DataFrame, cands: DataFrame, window: int = 10) -> DataFrame:
    return _spread_groups(_rank_input(tokens, cands)).groupBy("doc_id").applyInPandas(
        _make_rank_fn(window, True), _rank_schema(tokens)
    )


# --- TopicRank / MultipartiteRank (per-doc, candidate-topic graphs) -------

def _topic_clusters(cands: pd.DataFrame, threshold: float = 0.25) -> list[list[int]]:
    """Greedy agglomerative candidate clustering on word-overlap Jaccard
    (stand-in for pke's HAC over stem sets): candidates sharing >= threshold
    of words join a topic."""
    terms = cands["term"].values
    # singleton fast path (r06): DISTINCT single-word terms have pairwise
    # word-overlap Jaccard exactly 0 < threshold, so every topic is a
    # singleton — skip the O(n^2) Python set loop (the common shape when
    # candidates are unigrams; duplicates or multi-word terms fall back)
    if (
        threshold > 0
        and len(set(terms)) == len(terms)
        and not any(" " in t for t in terms)
    ):
        return [[i] for i in range(len(terms))]
    word_sets = [set(t.split(" ")) for t in terms]
    topics: list[list[int]] = []
    for i, ws in enumerate(word_sets):
        placed = False
        for top in topics:
            rep = word_sets[top[0]]
            j = len(ws & rep) / max(len(ws | rep), 1)
            if j >= threshold:
                top.append(i)
                placed = True
                break
        if not placed:
            topics.append([i])
    return topics


def _doc_topic_rank(pdf: pd.DataFrame, multipartite: bool, alpha: float = 1.1,
                    iters: int = 50, tol: float = 1e-6) -> pd.DataFrame:
    """TopicRank (multipartite=False): rank topics by PageRank over a
    complete topic graph weighted by inverse candidate-offset distance;
    score each topic's first-occurring candidate (pke TopicRank semantics).
    MultipartiteRank (True): node = candidate, edges only across topics,
    first-occurring candidate per topic gets an alpha position boost
    (pke MultipartiteRank, main.py:136-141)."""
    doc_id = pdf["doc_id"].iloc[0]
    occ = pdf[["ngram", "term", "offset_begin"]]
    cands = (
        occ.groupby("ngram", sort=True)
        .agg(term=("term", "first"), first_off=("offset_begin", "min"))
        .reset_index()
    )
    topics = _topic_clusters(cands)
    n = len(cands)
    if n == 0:
        return pd.DataFrame(columns=["doc_id", "ngram", "term", "score"])
    topic_of = np.empty(n, dtype=np.int64)
    for t, members in enumerate(topics):
        for m in members:
            topic_of[m] = t
    # candidate-pair weights sum(1/(|oi-oj|+1)) over all occurrence pairs,
    # vectorized: blocked outer |offset| differences scatter-added into the
    # candidate adjacency (the per-pair Python quadruple loop was
    # O(cands²·occ²) interpreter work — a giant doc stalled its task)
    cat = pd.Categorical(occ["ngram"], categories=cands["ngram"])
    cidx = np.asarray(cat.codes, dtype=np.int64)
    offs = occ["offset_begin"].to_numpy(dtype=np.float64)
    adj = np.zeros((n, n))
    # bound the dense (block x occ) slab to a FIXED byte budget (~256 MB of
    # float64) regardless of occurrence count: a constant block size made
    # the slab grow linearly with occurrences — ~32 GB transient for a
    # 1M-occurrence doc, OOMing the very task the vectorization was meant
    # to rescue (r02 ADVICE low #3)
    target_floats = 32 << 20
    block = max(1, target_floats // max(len(offs), 1))
    for s in range(0, len(offs), block):
        d = 1.0 / (np.abs(offs[s:s + block, None] - offs[None, :]) + 1.0)
        np.add.at(adj, (cidx[s:s + block, None], cidx[None, :]), d)
    same_topic = topic_of[:, None] == topic_of[None, :]
    if multipartite:
        adj = np.where(same_topic, 0.0, adj)  # edges only across topics
        # position boost: first candidate of each topic
        pers = np.ones(n)
        first_off = cands["first_off"].to_numpy()
        for members in topics:
            first = min(members, key=lambda m: first_off[m])
            pers[first] *= alpha * np.e ** (1.0 / (first_off[first] + 1))
        ranks = _pagerank_numpy(adj, pers, iters=iters, tol=tol)
        rows = [(doc_id, cands["ngram"][i], cands["term"][i], float(ranks[i])) for i in range(n)]
    else:
        k = len(topics)
        # topic graph: aggregate candidate weights by one-hot membership
        member = np.zeros((n, k))
        member[np.arange(n), topic_of] = 1.0
        tadj = member.T @ adj @ member
        np.fill_diagonal(tadj, 0.0)
        tr = _pagerank_numpy(tadj, iters=iters, tol=tol)
        first_off = cands["first_off"].to_numpy()
        rows = []
        for t, members in enumerate(topics):
            first = min(members, key=lambda m: first_off[m])
            rows.append((doc_id, cands["ngram"][first], cands["term"][first], float(tr[t])))
    return pd.DataFrame(rows, columns=["doc_id", "ngram", "term", "score"])


def topic_rank(cands: DataFrame, iters: int = 50, tol: float = 1e-6) -> DataFrame:
    """pke TopicRank parity shape (main.py:129-135): per-doc applyInPandas.

    ``iters``/``tol`` pass through to the topic-graph power iteration;
    pinning (iters=3, tol=0) makes the ranking SQL-unrollable when fed
    single-word candidates (every topic is then a singleton, so the topic
    graph IS the candidate graph) — the device the driver's topic_rank
    oracle uses to certify this code path."""
    inp = cands.select("doc_id", F.col("lemma_term").alias("ngram"), "term", "offset_begin")
    return _spread_groups(inp).groupBy("doc_id").applyInPandas(
        lambda pdf: _doc_topic_rank(pdf, multipartite=False, iters=iters, tol=tol),
        _rank_schema(cands),
    )


def multipartite_rank(cands: DataFrame) -> DataFrame:
    """pke MultipartiteRank parity shape (main.py:136-141)."""
    inp = cands.select("doc_id", F.col("lemma_term").alias("ngram"), "term", "offset_begin")
    return _spread_groups(inp).groupBy("doc_id").applyInPandas(
        lambda pdf: _doc_topic_rank(pdf, multipartite=True), _rank_schema(cands)
    )


# --- corpus-level distributed PageRank ------------------------------------

def cooccurrence_edges(cands: DataFrame) -> DataFrame:
    """Global term co-occurrence edges: candidate terms sharing a sentence.

    Self-join on (doc_id, sentence_id); hub-term skew is handled downstream
    by the salted contribution aggregation in ``distributed_pagerank``.
    """
    a = cands.select("doc_id", "sentence_id", F.col("lemma_term").alias("src"))
    b = cands.select("doc_id", "sentence_id", F.col("lemma_term").alias("dst"))
    return (
        a.join(b, ["doc_id", "sentence_id"])
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def distributed_pagerank(
    edges: DataFrame, d: float = 0.85, iters: int = 10, salt_buckets: int = 8
) -> DataFrame:
    """PageRank over an undirected weighted edge DataFrame, pure DataFrame
    ops: per-iteration map-side partial aggregation of contributions
    (Catalyst's partial+final agg = the "per-partition then merged" merge),
    with an explicit salted two-level aggregation so hub terms with huge
    in-degree don't hot-spot one reducer.

    Returns (ngram string, score double); scores sum to ~1.
    """
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    out_w = sym.groupBy("src").agg(F.sum("weight").alias("out_w"))
    sym = sym.join(out_w, "src").withColumn("frac", F.col("weight") / F.col("out_w"))
    sym = sym.select("src", "dst", "frac").persist()
    vertices = sym.select(F.col("src").alias("ngram")).distinct().persist()
    n = vertices.count()
    ranks = vertices.withColumn("score", F.lit(1.0 / n))
    for _ in range(iters):
        contribs = (
            sym.join(ranks.withColumnRenamed("ngram", "src"), "src")
            .withColumn("salt", F.pmod(F.abs(F.hash("dst", "src")), F.lit(salt_buckets)))
            .groupBy("dst", "salt")
            .agg(F.sum(F.col("score") * F.col("frac")).alias("partial"))
            .groupBy("dst")
            .agg(F.sum("partial").alias("contrib"))
        )
        ranks = (
            vertices.join(contribs.withColumnRenamed("dst", "ngram"), "ngram", "left")
            .fillna({"contrib": 0.0})
            .select("ngram", (F.lit((1 - d) / n) + F.lit(d) * F.col("contrib")).alias("score"))
        )
        # keep the lineage short: local[32] handles 10 iterations fine, but
        # at cluster scale checkpoint every few iterations
        ranks = ranks.localCheckpoint(eager=False)
    return ranks
