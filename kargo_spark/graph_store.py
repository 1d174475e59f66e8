"""Graph-table materialization: the triple store as node/edge tables.

The north rule materializes the deduplicated (subj, pred, obj) triples as
graph tables (nodes + edges) for downstream graph queries. Pure Column
ops: node ids are content hashes (deterministic across runs/partitions),
degrees are partial-aggregated, and both tables are plain DataFrames the
checkpoint writer persists like any stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def node_id(col):
    """Deterministic 12-hex node id from the canonical surface."""
    return F.substring(F.md5(F.lower(col)), -12, 12)


def two_hop(triples: DataFrame, max_mid_degree: int | None = None) -> DataFrame:
    """2-hop reachability over the triple store — the downstream graph
    query the materialized tables exist for. (src, dst) pairs connected
    via some middle node, with n_paths = #distinct middles and
    path_support = sum over paths of min(hop supports).

    Scale: a self-join on the middle key — hub middles (top-degree terms)
    square their row counts, so ``max_mid_degree`` optionally anti-joins
    middles above a degree cutoff (same shape as the hot-shingle guard in
    dedup.ngram_jaccard_pairs) before the join.
    """
    # collapse parallel edges (multiple preds between the same node pair,
    # e.g. the pipeline's rel_0/rel_1 clusters) BEFORE the join: without
    # this, a single a→b→c path is counted once per pred combination and
    # path_support inflates by the cross-product
    hop = triples.groupBy("subj", "obj").agg(F.sum("support").alias("support"))
    t1 = hop.select(
        F.col("subj").alias("src"), F.col("obj").alias("mid"), F.col("support").alias("s1")
    )
    t2 = hop.select(
        F.col("subj").alias("mid"), F.col("obj").alias("dst"), F.col("support").alias("s2")
    )
    if max_mid_degree is not None:
        hot = (
            t2.groupBy("mid").agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") > max_mid_degree)
        )
        t1 = t1.join(hot, "mid", "left_anti")
        t2 = t2.join(hot, "mid", "left_anti")
    return (
        t1.join(t2, "mid")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(
            F.countDistinct("mid").alias("n_paths"),
            F.sum(F.least("s1", "s2")).alias("path_support"),
        )
    )


def merge_triples(existing: DataFrame, new: DataFrame) -> DataFrame:
    """Incremental-ingest merge: fold a new batch's triples into the
    existing store, accumulating support for triples seen again and
    inserting unseen ones — the upsert the pipeline runs per ingest cycle
    instead of recomputing the store from scratch. Pure union +
    partial-agg groupBy (one shuffle on the triple key); pairs with the
    bucketed store so repeated merges reuse the layout, and with
    iceberg_lite commits so every merge is a snapshot
    (tests/test_iceberg_lite.py::test_incremental_triple_merge_snapshots).
    """
    return (
        existing.unionByName(new)
        .groupBy("subj", "pred", "obj")
        .agg(F.sum("support").alias("support"))
    )


def k_hop_reach(edges: DataFrame, k: int = 3) -> DataFrame:
    """BFS reachability counts over the (directed) edge table: for every
    node, how many distinct nodes it reaches within <= k hops (start
    excluded; cycles and revisits deduplicated per level — true BFS set
    semantics, not path counts).

    Distributed shape: k frontier-expansion rounds, each ONE join of the
    current frontier with the edge table plus a distinct against the
    visited set — the standard iterative-join BFS; the visited/frontier
    tables are localCheckpointed per round so lineage stays O(1) instead
    of O(k) (the pointer-jumping CC uses the same device). Frontier
    growth is bounded by dedup; hub fan-out skew lands on AQE's skew
    splitting of the join. k is small and fixed (graph queries, not
    transitive closure) — for unbounded closure use
    clustering.connected_components.
    """
    e = edges.select("src", "dst").distinct().persist()
    # frontier/visited derive from e, so give the join side fresh names
    # (Spark's ambiguous-self-join check rightly rejects e["dst"] here)
    e_step = e.select(F.col("src").alias("e_src"), F.col("dst").alias("e_dst"))
    visited = e.select(F.col("src").alias("start"), F.col("dst").alias("node")).distinct()
    frontier = visited
    for _ in range(k - 1):
        nxt = (
            frontier.join(e_step, frontier["node"] == F.col("e_src"))
            .select("start", F.col("e_dst").alias("node"))
            .distinct()
            .join(visited, ["start", "node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    # e stays persisted for the caller's action (k rounds re-read it);
    # blocks release via ContextCleaner when the plan is GC'd
    return (
        visited.filter(F.col("start") != F.col("node"))
        .groupBy("start")
        .agg(F.count(F.lit(1)).alias("n_reach"))
    )


def two_hop_bucketed(
    triples: DataFrame,
    max_mid_degree: int | None = None,
    prefix: str = "kargo_2hop",
    n_buckets: int = 16,
    assert_shuffle_free: bool = True,
) -> DataFrame:
    """``two_hop`` with the self-join routed through bucketed tables —
    the 100-TB substrate engaged end-to-end (r03 verdict next-step #5).

    The two join sides (t1 keyed by its middle = hop.obj, t2 keyed by its
    middle = hop.subj) are persisted as tables bucketed+sorted on ``mid``
    with the same bucket count, so the join on ``mid`` runs with ZERO
    Exchange on either side: the shuffle is paid once at write time and
    amortized over every later 2-hop / merge pass, which is exactly the
    economics that matter when the hop table is 10^12 rows. With
    ``assert_shuffle_free`` the function RAISES if the composed 2-hop
    query plans MORE than the one expected hash-partitioning Exchange
    (the final (src, dst) aggregation) — i.e. if the join itself would
    shuffle — making the layout property an operational contract rather
    than a hope. Results are identical to ``two_hop`` (same hub guard,
    same aggregation).
    """
    from .storage import write_bucketed

    spark = triples.sparkSession
    hop = triples.groupBy("subj", "obj").agg(F.sum("support").alias("support"))
    t1 = hop.select(
        F.col("subj").alias("src"), F.col("obj").alias("mid"), F.col("support").alias("s1")
    )
    t2 = hop.select(
        F.col("subj").alias("mid"), F.col("obj").alias("dst"), F.col("support").alias("s2")
    )
    if max_mid_degree is not None:
        hot = (
            t2.groupBy("mid").agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") > max_mid_degree)
        )
        t1 = t1.join(hot, "mid", "left_anti")
        t2 = t2.join(hot, "mid", "left_anti")
    write_bucketed(t1, f"{prefix}_t1", ["mid"], n_buckets)
    write_bucketed(t2, f"{prefix}_t2", ["mid"], n_buckets)
    joined = spark.table(f"{prefix}_t1").join(spark.table(f"{prefix}_t2"), "mid")
    result = (
        joined.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(
            F.countDistinct("mid").alias("n_paths"),
            F.sum(F.least("s1", "s2")).alias("path_support"),
        )
    )
    if assert_shuffle_free:
        # probe the FULL composed query (not just the bare join subplan —
        # the consumer query is what actually executes): the only
        # hash-partitioning Exchange allowed is the final (src, dst)
        # aggregation; a second one means the join itself shuffled and the
        # bucket layout was not engaged. Checked at plan time; AQE can
        # only downgrade the join to broadcast (still shuffle-free), never
        # add an Exchange this probe would miss.
        plan = result._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hashpartitioning")
        if n_exchanges > 1:
            raise AssertionError(
                f"bucketed 2-hop query planned {n_exchanges} shuffles "
                "(expected only the final aggregation) — bucket layout not "
                "engaged (check bucket counts / join key):\n" + plan
            )
    return result


def graph_tables(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(subj, pred, obj, support) -> (nodes, edges).

    nodes: (node_id, surface, out_degree, in_degree, degree,
            total_support) — one shuffle per side + one join.
    edges: (src, pred, dst, support) with hashed endpoint ids.
    """
    edges = triples.select(
        node_id(F.col("subj")).alias("src"),
        "pred",
        node_id(F.col("obj")).alias("dst"),
        "support",
    )
    out_deg = triples.groupBy(F.lower("subj").alias("surface")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.sum("support").alias("out_support"),
    )
    in_deg = triples.groupBy(F.lower("obj").alias("surface")).agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.sum("support").alias("in_support"),
    )
    nodes = (
        out_deg.join(in_deg, "surface", "full_outer")
        .fillna({"out_degree": 0, "in_degree": 0, "out_support": 0, "in_support": 0})
        .select(
            node_id(F.col("surface")).alias("node_id"),
            "surface",
            "out_degree",
            "in_degree",
            (F.col("out_degree") + F.col("in_degree")).alias("degree"),
            (F.col("out_support") + F.col("in_support")).alias("total_support"),
        )
    )
    return nodes, edges
