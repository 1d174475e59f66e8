"""DBSCAN (exact vs scalable) and entity-linking tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from kargo_spark.clustering import _dbscan_numpy, connected_components, dbscan_exact, dbscan_scalable
from kargo_spark.linking import canonical_entities, link_mentions, normalize_surface


def _blob_vectors(spark, seed=11):
    """Three well-separated direction blobs + far-out noise points."""
    rng = np.random.default_rng(seed)
    centers = np.eye(3)
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(12):
            v = centers[c] + rng.normal(0, 0.05, 3)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for i in range(3):  # noise: isolated directions
        v = np.array([1.0, 1.0, 1.0]) * (-1) ** i + rng.normal(0, 0.4, 3)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, vec array<double>"), rows


def test_dbscan_numpy_three_blobs():
    rng = np.random.default_rng(5)
    X = np.vstack([np.eye(3)[c] + rng.normal(0, 0.03, (10, 3)) for c in range(3)])
    labels = _dbscan_numpy(X, eps=0.05, min_samples=3)
    assert len({l for l in labels if l >= 0}) == 3
    # each blob one cluster
    for c in range(3):
        assert len(set(labels[c * 10:(c + 1) * 10])) == 1


def test_dbscan_exact_vs_scalable_agree(spark):
    vdf, _ = _blob_vectors(spark)
    ex = {r["vec_id"]: r["cluster"] for r in dbscan_exact(vdf, eps=0.1, min_samples=4).collect()}
    sc = {r["vec_id"]: r["cluster"] for r in
          dbscan_scalable(vdf, eps=0.1, min_samples=4, dim=3, n_planes=2).collect()}
    def groups(d):
        g = {}
        for k, v in d.items():
            g.setdefault(v, set()).add(k)
        noise = g.pop(-1, set())
        return {frozenset(s) for s in g.values()}, noise
    ge, ne = groups(ex)
    gs, ns = groups(sc)
    assert ge == gs, (ge, gs)
    assert ne == ns


def test_connected_components_chain(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "src long, dst long"
    )
    out = {r["vec_id"]: r["component"] for r in connected_components(edges).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == 10
    assert out[20] == out[21] == out[22] == 20


def test_normalize_surface(spark):
    df = spark.createDataFrame([("  Cool   Chains ",), ("containers",)], "t string")
    out = [r["n"] for r in df.select(normalize_surface(F.col("t")).alias("n")).collect()]
    assert out == ["cool chain", "container"]


def test_canonical_entities_merge_plurals(spark):
    m = spark.createDataFrame(
        [("d1", "cool chain"), ("d2", "cool chains"), ("d3", "cool chain"), ("d4", "airport")],
        "doc_id string, term string",
    )
    ents = canonical_entities(m)
    rows = {r["norm"]: r for r in ents.collect()}
    assert rows["cool chain"]["canonical"] == "cool chain"  # most frequent surface
    assert rows["cool chain"]["support"] == 3
    assert len(rows) == 2


def test_link_mentions_exact_and_embedding(spark):
    m = spark.createDataFrame(
        [("d1", "cool chains"), ("d2", "kool chain"), ("d3", "zzz qqq vvv")],
        "doc_id string, term string",
    )
    ents = canonical_entities(
        spark.createDataFrame([("d0", "cool chain"), ("d0", "airport hub")], "doc_id string, term string")
    )
    out = link_mentions(m, ents, threshold=0.3)
    rows = {r["term"]: r for r in out.collect()}
    assert rows["cool chains"]["link_kind"] == "exact"  # normalizes to 'cool chain'
    assert rows["cool chains"]["link_sim"] == 1.0
    # unlinkable garbage stays NULL
    assert rows["zzz qqq vvv"]["entity_id"] is None


def test_connected_components_long_path_converges(spark):
    """r02 defect: a >20-hop chain silently split under plain min-label
    propagation capped at 20 rounds. Pointer jumping must close a 150-node
    path (propagation distance 149) within the default 20 rounds."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(149)], "src long, dst long"
    )
    out = {r["vec_id"]: r["component"] for r in connected_components(edges).collect()}
    assert len(out) == 150
    assert set(out.values()) == {0}


def test_connected_components_raises_when_unconverged(spark):
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iters=1)


def test_connected_components_matches_union_find(spark):
    """Random multi-component graph vs a driver-side union-find oracle."""
    import random

    rng = random.Random(7)
    edges_py = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    parent = list(range(80))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges_py:
        parent[find(a)] = find(b)
    touched = {v for e in edges_py for v in e}
    want = {}
    for v in touched:
        want.setdefault(find(v), set()).add(v)
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    got_rows = connected_components(edges).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["component"], set()).add(r["vec_id"])
    assert sorted(map(frozenset, got.values()), key=min) == sorted(
        map(frozenset, want.values()), key=min
    )


def test_link_sim_value_set_is_round2_portable():
    """The link_entities driver query rounds cosines to 2 decimals and
    thresholds at 0.55 (__spark_entry__.q_link_entities). Its phrases
    carry exactly 5 hashing features, so norm^2 = sum of per-bucket
    signed-count squares is ODD (parity of 5) and <= 25; achievable
    cosines are k/sqrt(m*n) with 1<=k<=5 and odd m,n<=25. Certify the
    float-portability claims: no achievable sim within 1e-4 of the 0.55
    threshold, and none within 5e-6 of a 2-decimal rounding boundary —
    i.e. the embedder's float32 noise (~1e-7) can never flip a
    threshold decision or a rounded output digit."""
    import math

    vals = {
        k / math.sqrt(m * n)
        for k in range(1, 6)
        for m in range(1, 26, 2)
        for n in range(1, 26, 2)
        if k / math.sqrt(m * n) <= 1.0
    }
    assert all(abs(v - 0.55) > 1e-4 for v in vals)
    assert all(abs((v * 100) % 1 - 0.5) > 5e-4 for v in vals)


def test_link_mentions_md5_planes_all_three_kinds(spark):
    """link_mentions with lsh_dist='rademacher_md5': exact-normalized
    mentions take the cheap path, shared-token phrases link by embedding,
    alien phrases stay unlinked — deterministic across runs."""
    from pyspark.sql import functions as F

    from kargo_spark.linking import canonical_entities, link_mentions

    ents_src = spark.createDataFrame(
        [(1, "hash join"), (2, "merge sort"), (3, "hash joins")],
        "doc_id long, term string",
    )
    ents = canonical_entities(ents_src)
    mentions = spark.createDataFrame(
        [(10, "hash join"),      # exact (normalized identical)
         (11, "hash table"),     # embedding: shares the 'hash' token
         (12, "zzz qqq")],       # none: no shared feature
        "doc_id long, term string",
    )
    out = link_mentions(
        mentions, ents, threshold=0.3, lsh_dist="rademacher_md5"
    ).collect()
    kinds = {r["term"]: r["link_kind"] for r in out}
    assert kinds["hash join"] == "exact"
    assert kinds["zzz qqq"] is None
    # run twice -> identical (md5 planes are seed-deterministic)
    out2 = link_mentions(
        mentions, ents, threshold=0.3, lsh_dist="rademacher_md5"
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
