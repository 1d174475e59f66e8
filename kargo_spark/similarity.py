"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set, cross-join against the corpus, JVM-side dot products via
  ``F.zip_with``/``F.aggregate``, per-query top-k window. The baseline and
  the oracle for the approximate paths.
* ``lsh_topk``         — random-hyperplane LSH-bucketed candidate
  generation + exact re-rank within buckets: the scale path (corpus side
  shuffles once on bucket key; queries broadcast).
* ``ivf_topk``         — IVF-style: k-means-lite centroids (deterministic
  seeded sample + one Lloyd step in pandas), assign corpus to nearest
  centroid (partition pruning analog), probe the ``n_probe`` nearest
  centroids per query.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .embedding import cosine_expr


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. queries: (query_id, embedding)."""
    c = corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "nbr_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cos", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    plane_dist: str = "gaussian",
) -> DataFrame:
    """ANN top-k: candidates = corpus rows sharing any LSH bucket with the
    query across n_tables hash tables; exact cosine re-rank of candidates.
    ``plane_dist="rademacher_md5"`` makes the buckets (and hence recall)
    DuckDB-reproducible for the driver's recall_audit oracle."""
    from .clustering import _lsh_buckets

    c = corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"))
    cb, qb = None, None
    for t in range(n_tables):
        cbt = _lsh_buckets(c, "cv", n_planes, seed + 101 * t, dim, plane_dist).withColumn("table", F.lit(t))
        qbt = _lsh_buckets(q, "qv", n_planes, seed + 101 * t, dim, plane_dist).withColumn("table", F.lit(t))
        cb = cbt if cb is None else cb.unionByName(cbt)
        qb = qbt if qb is None else qb.unionByName(qbt)
    cand = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .dropDuplicates(["query_id", "nbr_id"])
        .select("query_id", "nbr_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("nbr_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cos", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    sample_order: str = "xxhash",
) -> DataFrame:
    """IVF ANN: coarse quantizer = deterministic sampled centroids refined
    by one Lloyd iteration (driver-side numpy on a bounded sample), corpus
    assigned to nearest centroid (this is the 'inverted file'); each query
    probes its n_probe nearest centroids' lists only.
    ``sample_order="md5"`` orders the centroid-init sample by
    md5(f"{seed}:{id}") instead of xxhash64 — same determinism, but
    DuckDB-reproducible so the driver's recall_audit oracle can rebuild
    the centroids (and hence the probe sets) exactly."""
    c = corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("cv"))
    # bounded, seeded sample for centroid init (never full collect)
    if sample_order == "md5":
        order = F.md5(F.concat(F.lit(f"{seed}:"), F.col("nbr_id").cast("string")))
    else:
        order = F.xxhash64("nbr_id", F.lit(seed))
    sample = np.array(
        c.orderBy(order).limit(max(n_centroids * 20, 256))
        .select("cv").toPandas()["cv"].tolist()
    )
    # md5-based choice, not Python hash() — deterministic by construction
    # and consistent with the repo's no-Python-hash rule (dedup docstring)
    import hashlib

    def _h(i: int) -> int:
        return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)

    rng_idx = np.argsort(np.array([_h(i) for i in range(len(sample))]))[:n_centroids]
    cents = sample[rng_idx]
    # one Lloyd step on the sample
    sims = sample @ cents.T
    assign = sims.argmax(axis=1)
    for j in range(n_centroids):
        m = sample[assign == j]
        if len(m):
            cents[j] = m.mean(axis=0)
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-9)
    cent_rows = [(int(j), [float(x) for x in cents[j]]) for j in range(n_centroids)]
    cent_df = corpus.sparkSession.createDataFrame(cent_rows, "cid int, cvec array<double>")

    assigned = (
        c.crossJoin(F.broadcast(cent_df))
        .withColumn("sim", cosine_expr(F.col("cv"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(Window.partitionBy("nbr_id").orderBy(F.desc("sim"), "cid")))
        .filter(F.col("rn") == 1)
        .select("nbr_id", "cv", "cid")
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv"))
    q_probe = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("sim", cosine_expr(F.col("qv"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(Window.partitionBy("query_id").orderBy(F.desc("sim"), "cid")))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cid")
    )
    cand = assigned.join(F.broadcast(q_probe), "cid").select(
        "query_id", "nbr_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("nbr_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cos", "rank")
    )
