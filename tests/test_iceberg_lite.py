"""Iceberg-semantics snapshot tables: atomic commit, append lineage,
time travel, rollback, expiry, and snapshot-mode pipeline checkpoints."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from kargo_spark.iceberg_lite import IcebergLiteTable, write_graph_tables


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def test_commit_read_roundtrip(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "t"))
    assert not t.exists()
    sid = t.commit(_df(spark, 0, 10))
    assert t.exists() and t.current_snapshot_id() == sid
    assert t.read().count() == 10
    snap = t.snapshots()[0]
    assert snap["operation"] == "overwrite"
    assert snap["summary"]["added_rows"] == 10
    assert sum(snap["summary"]["added_partitions"].values()) == 10


def test_append_inherits_parent_data(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "t"))
    s1 = t.commit(_df(spark, 0, 10))
    s2 = t.commit(_df(spark, 10, 15), operation="append")
    assert t.read().count() == 15
    assert t.read(snapshot_id=s1).count() == 10  # time travel
    snap2 = t._snapshot(s2)
    assert snap2["parent_snapshot_id"] == s1
    assert len(snap2["data_dirs"]) == 2


def test_overwrite_then_rollback(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "t"))
    s1 = t.commit(_df(spark, 0, 10))
    t.commit(_df(spark, 0, 3))  # overwrite shrinks the table
    assert t.read().count() == 3
    t.rollback(s1)
    assert t.read().count() == 10
    # history preserved: both snapshots still listed
    assert len(t.snapshots()) == 2


def test_atomic_pointer_swap(spark, tmp_path):
    """The version hint always points at complete metadata: after any
    commit, reading via the hint parses and resolves data dirs."""
    t = IcebergLiteTable(spark, str(tmp_path / "t"))
    for i in range(3):
        t.commit(_df(spark, 0, 5 + i))
        v = t.current_version()
        with open(os.path.join(t.meta_dir, f"v{v}.metadata.json")) as f:
            meta = json.load(f)
        cur = [s for s in meta["snapshots"] if s["snapshot_id"] == meta["current_snapshot_id"]]
        assert cur and all(os.path.isdir(d) for d in cur[0]["data_dirs"])
    assert not os.path.exists(t._hint_path() + ".tmp")


def test_expire_snapshots_keeps_current_readable(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "t"))
    for i in range(4):
        t.commit(_df(spark, 0, 4 + i))
    expired = t.expire_snapshots(keep_last=2)
    assert len(expired) == 2
    assert t.read().count() == 7
    assert len(t.snapshots()) == 2


def test_graph_tables_materialize(spark, tmp_path):
    triples = spark.createDataFrame(
        [("air cargo", "related_to", "freight", 3), ("freight", "related_to", "rates", 1)],
        "subj string, pred string, obj string, support long",
    )
    sids = write_graph_tables(spark, triples, str(tmp_path / "g"))
    nodes = IcebergLiteTable(spark, str(tmp_path / "g/nodes")).read()
    edges = IcebergLiteTable(spark, str(tmp_path / "g/edges")).read()
    assert sids == {"nodes": 1, "edges": 1}
    assert nodes.count() == 3 and edges.count() == 2
    hub = {r["surface"]: r["degree"] for r in nodes.collect()}
    assert hub["freight"] == 2


def test_pipeline_snapshot_checkpoints_resume(spark, tmp_path):
    from kargo_spark.pipeline import run_pipeline
    from kargo_spark.synth import synth_documents

    docs = synth_documents(spark, n_rows=20)
    wd = str(tmp_path / "wd")
    out1 = run_pipeline(
        spark, docs, wd, cluster_relations=False, linking=False, use_snapshots=True
    )
    n1 = out1["triples"].count()
    m1 = {r["stage"]: r["resumed"] for r in out1["metrics"].collect()}
    assert not any(m1.values())
    # snapshot metadata exists per stage
    t = IcebergLiteTable(spark, os.path.join(wd, "triples"))
    assert t.exists() and t.snapshots()[0]["summary"]["added_rows"] == n1
    out2 = run_pipeline(
        spark, docs, wd, cluster_relations=False, linking=False, use_snapshots=True
    )
    m2 = {r["stage"]: r["resumed"] for r in out2["metrics"].collect()}
    assert all(m2.values())
    assert out2["triples"].count() == n1


def test_append_schema_mismatch_rejected(spark, tmp_path):
    import pytest as _pytest

    t = IcebergLiteTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 5))
    bad = spark.range(3).select(F.col("id"), F.lit("x").alias("other"))
    with _pytest.raises(ValueError, match="append schema mismatch"):
        t.commit(bad, operation="append")
    t.commit(bad)  # overwrite may evolve the schema
    assert t.read().columns == ["id", "other"]


def test_two_hop_paths_and_hub_cutoff(spark):
    from kargo_spark.graph_store import two_hop

    triples = spark.createDataFrame(
        [("a", "p", "hub", 5), ("b", "p", "hub", 2), ("hub", "p", "c", 3),
         ("hub", "p", "d", 1), ("a", "p", "e", 9), ("e", "p", "f", 4)],
        "subj string, pred string, obj string, support long",
    )
    out = {(r["src"], r["dst"]): (r["n_paths"], r["path_support"])
           for r in two_hop(triples).collect()}
    assert out[("a", "c")] == (1, 3)       # a->hub->c, min(5,3)
    assert out[("a", "f")] == (1, 4)       # a->e->f, min(9,4)
    assert out[("b", "d")] == (1, 1)
    # hub has out-degree 2: cutoff at 1 removes all hub-mediated paths
    pruned = {(r["src"], r["dst"]) for r in
              two_hop(triples, max_mid_degree=1).collect()}
    assert ("a", "c") not in pruned and ("a", "f") in pruned


def test_two_hop_bucketed_matches_plain_on_nonempty_result(spark):
    """r04 ADVICE medium: the bucketed/plain parity was only ever compared
    on EMPTY result sets (the old driver query's cutoff dropped every
    middle). Certify value parity on data where rows actually survive,
    both with the hub guard off and with it binding on one hub."""
    from kargo_spark.graph_store import two_hop, two_hop_bucketed

    triples = spark.createDataFrame(
        [("a", "p", "hub", 5), ("b", "p", "hub", 2), ("hub", "p", "c", 3),
         ("hub", "p", "d", 1), ("a", "p", "e", 9), ("e", "p", "f", 4)],
        "subj string, pred string, obj string, support long",
    )
    for cutoff in (None, 1):
        plain = sorted(map(tuple, two_hop(triples, max_mid_degree=cutoff).collect()))
        bucketed = sorted(map(tuple, two_hop_bucketed(
            triples, max_mid_degree=cutoff, prefix="kargo_2hop_paritytest"
        ).collect()))
        assert plain == bucketed and len(plain) > 0


def test_commit_after_rollback_never_reuses_snapshot_ids(spark, tmp_path):
    """Code-review finding: snapshot ids were parent+1, so committing
    after rollback(1) reused id 2 and clobbered snapshot 2's data dir."""
    t = IcebergLiteTable(spark, str(tmp_path / "t"))
    s1 = t.commit(_df(spark, 0, 10))
    s2 = t.commit(_df(spark, 0, 3))
    t.rollback(s1)
    s3 = t.commit(_df(spark, 0, 7))
    assert s3 not in (s1, s2)
    ids = [s["snapshot_id"] for s in t.snapshots()]
    assert len(ids) == len(set(ids))
    # snapshot 2's data survives: time travel still returns its 3 rows
    assert t.read(snapshot_id=s2).count() == 3
    assert t.read().count() == 7


def test_commit_optimistic_concurrency_collision(spark, tmp_path):
    """A writer that loses the version-file race must retry against the
    winner's state instead of overwriting it (r02 ADVICE med #1)."""
    import json
    import os

    from kargo_spark.iceberg_lite import IcebergLiteTable

    root = str(tmp_path / "tbl")
    t = IcebergLiteTable(spark, root)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    s1 = t.commit(df, "overwrite")

    # simulate a concurrent winner: claim v2 out from under the next commit
    winner_meta = t._metadata()
    with open(os.path.join(t.meta_dir, "v2.metadata.json"), "w") as f:
        json.dump(winner_meta, f)

    s2 = t.commit(spark.createDataFrame([(2, "b")], "id long, v string"), "overwrite")
    assert s2 > s1
    # the loser committed at v3, past the claimed file, losing nothing
    assert t.current_version() == 3
    assert {r["id"] for r in t.read().collect()} == {2}
    # history intact: both real snapshots retained
    assert [s["snapshot_id"] for s in t.snapshots()][-1] == s2


def test_current_version_probes_past_stale_hint(spark, tmp_path):
    """The hint is a hint (Iceberg HadoopTableOperations): a stale pointer
    must not hide a newer committed version."""
    from kargo_spark.iceberg_lite import IcebergLiteTable

    root = str(tmp_path / "tbl2")
    t = IcebergLiteTable(spark, root)
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    t.commit(df1, "overwrite")
    t.commit(df2, "overwrite")
    with open(t._hint_path(), "w") as f:
        f.write("1")  # stale
    assert t.current_version() == 2
    assert {r["id"] for r in t.read().collect()} == {2}


def test_torn_metadata_file_does_not_wipe_history(spark, tmp_path):
    """A claimed-but-unparseable newest version file (the pre-os.link torn
    window, r03 ADVICE med #1) must NOT make the table look empty: reads
    fall back to the last parseable version and the next commit preserves
    history instead of committing with parent=None."""
    import os

    from kargo_spark.iceberg_lite import IcebergLiteTable

    root = str(tmp_path / "tbl3")
    t = IcebergLiteTable(spark, root)
    s1 = t.commit(spark.createDataFrame([(1, "a")], "id long, v string"), "overwrite")
    # simulate a racer's torn claim: empty newest version file
    open(os.path.join(t.meta_dir, "v2.metadata.json"), "w").close()
    assert t.current_version() == 2
    assert t._metadata()["current_snapshot_id"] == s1  # fell back to v1
    assert {r["id"] for r in t.read().collect()} == {1}
    s2 = t.commit(spark.createDataFrame([(2, "b")], "id long, v string"), "append")
    snaps = [s["snapshot_id"] for s in t.snapshots()]
    assert snaps == [s1, s2]  # history intact, parent chain preserved
    assert t._snapshot(s2)["parent_snapshot_id"] == s1
    # append inherited the parent's data
    assert {r["id"] for r in t.read().collect()} == {1, 2}


def test_commit_metadata_publishes_complete_files_only(spark, tmp_path):
    """os.link publish: every v{N}.metadata.json on disk parses, and no
    temp files are left behind."""
    import json
    import os

    from kargo_spark.iceberg_lite import IcebergLiteTable

    root = str(tmp_path / "tbl4")
    t = IcebergLiteTable(spark, root)
    for i in range(3):
        t.commit(spark.createDataFrame([(i, "x")], "id long, v string"), "overwrite")
    names = sorted(os.listdir(t.meta_dir))
    assert not [n for n in names if n.endswith(".tmp")]
    for n in names:
        if n.endswith(".metadata.json"):
            with open(os.path.join(t.meta_dir, n)) as f:
                json.load(f)  # raises if torn


def test_expire_commits_prune_before_deleting_data(spark, tmp_path, monkeypatch):
    """r03 ADVICE med #2: if the metadata prune cannot land (loses every
    race), expire must raise and delete NOTHING — data dirs referenced by
    current metadata survive."""
    import os

    import pytest

    from kargo_spark.iceberg_lite import IcebergLiteTable

    root = str(tmp_path / "tbl5")
    t = IcebergLiteTable(spark, root)
    for i in range(4):
        t.commit(spark.createDataFrame([(i, "x")], "id long, v string"), "overwrite")
    all_dirs = [d for s in t.snapshots() for d in s["data_dirs"]]
    monkeypatch.setattr(t, "_commit_metadata", lambda *a, **k: False)
    with pytest.raises(RuntimeError, match="optimistic-concurrency races"):
        t.expire_snapshots(keep_last=1)
    for d in all_dirs:
        assert os.path.isdir(d), f"data dir {d} deleted despite failed prune commit"


def test_expire_still_prunes_and_deletes_on_success(spark, tmp_path):
    import os

    from kargo_spark.iceberg_lite import IcebergLiteTable

    root = str(tmp_path / "tbl6")
    t = IcebergLiteTable(spark, root)
    for i in range(4):
        t.commit(spark.createDataFrame([(i, "x")], "id long, v string"), "overwrite")
    old_dirs = [d for s in t.snapshots()[:-1] for d in s["data_dirs"]]
    expired = t.expire_snapshots(keep_last=1)
    assert len(expired) == 3
    assert len(t.snapshots()) == 1
    assert {r["id"] for r in t.read().collect()} == {3}
    for d in old_dirs:
        assert not os.path.isdir(d)


def test_incremental_triple_merge_snapshots(spark, tmp_path):
    """The incremental-ingest cycle: commit a triple store, merge a new
    batch (support accumulates, unseen triples insert), commit again —
    two snapshots, time travel returns the pre-merge store."""
    from kargo_spark.graph_store import merge_triples
    from kargo_spark.iceberg_lite import IcebergLiteTable

    t = IcebergLiteTable(spark, str(tmp_path / "triples"))
    base = spark.createDataFrame(
        [("a", "rel", "b", 2), ("b", "rel", "c", 1)],
        "subj string, pred string, obj string, support long",
    )
    s1 = t.commit(base, "overwrite")
    batch = spark.createDataFrame(
        [("a", "rel", "b", 3), ("c", "rel", "d", 5)],
        "subj string, pred string, obj string, support long",
    )
    merged = merge_triples(t.read(), batch)
    s2 = t.commit(merged, "overwrite")
    now = {(r["subj"], r["obj"]): r["support"] for r in t.read().collect()}
    assert now == {("a", "b"): 5, ("b", "c"): 1, ("c", "d"): 5}
    before = {(r["subj"], r["obj"]): r["support"] for r in t.read(snapshot_id=s1).collect()}
    assert before == {("a", "b"): 2, ("b", "c"): 1}
    assert s2 > s1


def test_compact_rewrites_small_files_same_rows(spark, tmp_path):
    """Ten appends -> many tiny files; compact() folds them into few
    files in ONE replace snapshot with identical rows, and the parent
    snapshot still time-travels to the pre-compaction state."""
    t = IcebergLiteTable(spark, str(tmp_path / "t"))
    for i in range(10):
        t.commit(_df(spark, 10 * i, 10 * (i + 1)), operation="append")
    pre_sid = t.current_snapshot_id()
    pre_rows = sorted(r["id"] for r in t.read().collect())
    r = t.compact(target_file_mb=128.0)
    assert r["compacted"] and r["rows"] == 100
    assert r["output_files"] < r["input_files"]
    snap = t._snapshot(r["snapshot_id"])
    assert snap["operation"] == "replace"
    assert snap["parent_snapshot_id"] == pre_sid
    assert len(snap["data_dirs"]) == 1
    assert sorted(x["id"] for x in t.read().collect()) == pre_rows
    # history intact: the rewritten snapshot still reads its old files
    assert t.read(snapshot_id=pre_sid).count() == 100


def test_compact_noop_on_healthy_table(spark, tmp_path):
    t = IcebergLiteTable(spark, str(tmp_path / "t"))
    t.commit(_df(spark, 0, 10).coalesce(1))
    r = t.compact(target_file_mb=128.0)
    assert not r["compacted"] and r["reason"] == "within target"
    assert t.read().count() == 10


def test_compact_aborts_rather_than_dropping_concurrent_append(
    spark, tmp_path, monkeypatch
):
    """A writer committing between compact's rewrite-read and its
    metadata swap must NOT lose rows: the first swap attempt sees a
    moved table, discards the orphaned rewrite, and redoes it from the
    racer's state — final table has the racer's rows."""
    t = IcebergLiteTable(spark, str(tmp_path / "t"))
    for i in range(5):
        t.commit(_df(spark, 10 * i, 10 * (i + 1)), operation="append")

    real_write = IcebergLiteTable._write_data
    raced = {"done": False}

    def write_then_race(self, df, data_dir):
        counts = real_write(self, df, data_dir)
        if not raced["done"] and "compact-" in data_dir:
            raced["done"] = True
            racer = IcebergLiteTable(spark, self.root)
            monkeypatch.setattr(IcebergLiteTable, "_write_data", real_write)
            racer.commit(_df(spark, 50, 60), operation="append")
            monkeypatch.setattr(IcebergLiteTable, "_write_data", write_then_race)
        return counts

    monkeypatch.setattr(IcebergLiteTable, "_write_data", write_then_race)
    r = t.compact(target_file_mb=128.0)
    monkeypatch.setattr(IcebergLiteTable, "_write_data", real_write)
    assert raced["done"] and r["compacted"]
    assert r["rows"] == 60  # racer's append survived the compaction race
    assert t.read().count() == 60


def test_maintain_tables_compact_then_expire_reclaims_files(spark, tmp_path):
    """The compact+expire pair: after maintenance the table reads the
    same rows, holds few snapshots, and the superseded per-batch dirs
    are physically gone (the 10^12-scale small-file reclamation path)."""
    from kargo_spark.iceberg_lite import maintain_tables

    root = str(tmp_path / "ledger")
    t = IcebergLiteTable(spark, root)
    for i in range(8):
        t.commit(_df(spark, 10 * i, 10 * (i + 1)), operation="append")
    pre_dirs = set(t._snapshot(t.current_snapshot_id())["data_dirs"])
    rep = maintain_tables(spark, [root], keep_last=1)[root]
    assert rep["compacted"] and len(rep["expired_snapshots"]) == 8
    assert t.read().count() == 80
    assert len(t.snapshots()) == 1
    assert all(not os.path.isdir(d) for d in pre_dirs)
    # untracked root is reported, not crashed on
    missing = str(tmp_path / "nope")
    assert maintain_tables(spark, [missing])[missing]["reason"] == "no table"


def test_file_skipping_stats_prune_selective_read(spark, tmp_path):
    """r05 verdict next-step #5: per-file min/max stats recorded at write
    time let read(where=...) scan a strict SUBSET of files with identical
    results. Files get disjoint id ranges via repartitionByRange, so a
    selective predicate must prune most of them."""
    t = IcebergLiteTable(spark, str(tmp_path / "t"))
    df = _df(spark, 0, 1000).repartitionByRange(8, "id")
    sid = t.commit(df)
    # stats landed in the snapshot summary, one entry per data file
    fs = t._snapshot(sid)["summary"]["file_stats"]
    assert len(fs) >= 4
    assert all("id" in st and "v" in st for st in fs.values())

    stats = {}
    sel = t.read(where=("id", ">=", 900), scan_stats=stats)
    assert stats["files_scanned"] < stats["files_total"]
    assert stats["files_total"] >= 4
    # identical results to the unpruned read with the same filter
    full = sorted(r["id"] for r in t.read().where(F.col("id") >= 900).collect())
    got = sorted(r["id"] for r in sel.collect())
    assert got == full == list(range(900, 1000))

    # append inherits parent files; pruning still sees the parent stats
    t.commit(
        _df(spark, 1000, 2000).repartitionByRange(8, "id"), operation="append"
    )
    stats2 = {}
    sel2 = t.read(where=("id", "<", 100), scan_stats=stats2)
    assert stats2["files_total"] > stats["files_total"]
    assert stats2["files_scanned"] < stats2["files_total"]
    assert sorted(r["id"] for r in sel2.collect()) == list(range(100))

    # a predicate nothing satisfies: zero rows, schema intact
    stats3 = {}
    empty = t.read(where=("id", ">", 10**9), scan_stats=stats3)
    assert stats3["files_scanned"] == 0 and empty.count() == 0
    assert set(empty.columns) == {"id", "v"}
