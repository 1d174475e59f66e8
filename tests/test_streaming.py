"""Structured Streaming smoke tests via the memory sink."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kargo_spark import streaming as S
from kargo_spark.synth import synth_documents


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream"))
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(2000) \
        .coalesce(2).write.mode("overwrite").parquet(path)
    return path


def test_windowed_event_counts_matches_batch(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = S.stream_events(spark, events_stream_dir, schema)
    agg = S.windowed_event_counts(stream, window="1 hour", watermark="0 seconds")
    got = S.process_all(agg, "win_counts", output_mode="append")
    batch = (
        spark.read.parquet(events_stream_dir)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # append mode emits only closed windows; every emitted row must match batch
    got_rows = {(r["window_start"], r["event_type"]): r["n"] for r in got.collect()}
    batch_rows = {(r["win"]["start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got_rows
    for k, v in got_rows.items():
        assert batch_rows[k] == v


def test_streaming_docs_clean_dedups(spark, tmp_path):
    path = str(tmp_path / "docs_stream")
    synth_documents(spark, n_rows=40).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.format("parquet").schema(schema).load(path)
    cleaned = S.streaming_docs_clean(stream)
    got = S.process_all(cleaned, "docs_clean_stream", output_mode="append")
    batch_keys = (
        spark.read.parquet(path)
        .filter(F.length(F.trim("content")) > 0)
        .select("repo", "path", "commit").distinct().count()
    )
    assert got.count() == batch_keys
    assert got.select("doc_id").distinct().count() == got.count()


def test_stateful_sessionize_state_spans_batches(spark, tmp_path):
    """applyInPandasWithState sessionizer: per-user state must survive
    micro-batch boundaries (maxFilesPerTrigger=1 -> one batch per file).
    user 1: two sessions split by a > gap pause; user 2: ONE session whose
    events span the two batches (the cross-batch continuation proof)."""
    import os
    import time

    from kargo_spark.streaming import stateful_sessionize

    base = int(time.time() // 86400 * 86400)  # stable day-aligned epoch

    def write(path, rows):
        spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp") \
            .coalesce(1).write.mode("overwrite").parquet(path)

    d = str(tmp_path / "events")
    f1, f2 = f"{d}/b1", f"{d}/b2"
    from datetime import datetime, timezone

    def t(sec):
        return datetime.fromtimestamp(base + sec, tz=timezone.utc).replace(tzinfo=None)

    write(f1, [(1, 1, t(0)), (1, 2, t(100)), (2, 1, t(0))])
    write(f2, [(1, 3, t(4000)), (1, 4, t(4100)), (2, 2, t(500))])
    now = time.time()
    for p, age in ((f1, 120), (f2, 60)):
        for fn in os.listdir(p):
            os.utime(os.path.join(p, fn), (now - age, now - age))

    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
    )
    out = stateful_sessionize(stream, gap_seconds=1800)
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("sess_test").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT user_id, session_id, max(n_events) AS n FROM sess_test "
        "GROUP BY user_id, session_id"
    ).collect()
    got = {(r["user_id"], r["session_id"]): r["n"] for r in rows}
    assert got[(1, 1)] == 2 and got[(1, 2)] == 2   # gap split two sessions
    assert got[(2, 1)] == 2                        # one session across batches
    assert (2, 2) not in got


def test_streaming_triples_appends_idempotent_batches(spark, tmp_path):
    """Micro-batches append to the Iceberg-lite triple table keyed by
    batch id; a replayed batch id (fresh stream checkpoint over the same
    files) is skipped, so rows never duplicate."""
    from kargo_spark.iceberg_lite import IcebergLiteTable

    src = tmp_path / "docs_src"
    src.mkdir()
    docs = synth_documents(spark, n_rows=60)
    schema = docs.schema
    docs.filter(F.col("content").isNotNull()).limit(30).coalesce(1) \
        .write.mode("overwrite").parquet(str(src / "f0"))
    docs.subtract(docs.limit(30)).coalesce(1) \
        .write.mode("overwrite").parquet(str(src / "f1"))

    table_root = str(tmp_path / "triples_tbl")
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(str(src) + "/*")
    )
    q = S.streaming_triples(stream, table_root, str(tmp_path / "ck1"))
    q.awaitTermination(120)

    tbl = IcebergLiteTable(spark, table_root)
    snaps = tbl.snapshots()
    batch_ids = [s["summary"]["streaming_batch_id"] for s in snaps]
    assert len(snaps) >= 2 and len(set(batch_ids)) == len(batch_ids)
    assert snaps[0]["operation"] == "overwrite"
    assert all(s["operation"] == "append" for s in snaps[1:])
    total = tbl.read().count()
    assert total == sum(s["summary"]["added_rows"] for s in snaps)
    assert total > 0

    # same-query restart: the stream checkpoint already acknowledged all
    # files -> no batches fire, the table is unchanged
    stream2 = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(str(src) + "/*")
    )
    q2 = S.streaming_triples(stream2, table_root, str(tmp_path / "ck1"))
    q2.awaitTermination(120)
    assert len(IcebergLiteTable(spark, table_root).snapshots()) == len(snaps)
    assert IcebergLiteTable(spark, table_root).read().count() == total

    # crash replay within ONE query: plant a ledger entry for (ck3, batch 0)
    # as if the commit had landed but the stream checkpoint ack was lost —
    # the re-delivered batch 0 must be skipped while batch 1 commits.
    # (The ledger key is (checkpoint, batch_id): a DIFFERENT query's batch 0
    # must NOT be skipped just because this one committed a batch 0.)
    ck3 = str(tmp_path / "ck3")
    tbl2_root = str(tmp_path / "triples_tbl2")
    tbl2 = IcebergLiteTable(spark, tbl2_root)
    marker = spark.createDataFrame(
        [], IcebergLiteTable(spark, table_root).read().schema
    )
    tbl2.commit(marker, summary_extra={"streaming_batch_id": 0, "streaming_checkpoint": ck3})
    stream3 = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(str(src) + "/*")
    )
    q3 = S.streaming_triples(stream3, tbl2_root, ck3)
    q3.awaitTermination(120)
    snaps2 = IcebergLiteTable(spark, tbl2_root).snapshots()
    replayed = [s for s in snaps2 if s["summary"].get("streaming_batch_id") == 0]
    assert len(replayed) == 1          # batch 0 skipped: only the marker
    assert any(s["summary"].get("streaming_batch_id") == 1 for s in snaps2)


def test_quality_filter_and_domain_mix_are_stream_safe(spark, tmp_path):
    """The round-4 corpus filters are pure stateless Column expressions,
    so they run UNCHANGED on a readStream: streaming output == batch
    output row-for-row. (This is the property that lets the same
    filter/mix code serve both the bulk backfill and the incremental
    ingest path.)"""
    from kargo_spark.corpus import domain_mix
    from kargo_spark.textstats import quality_filter

    path = str(tmp_path / "docs_qf_stream")
    synth_documents(spark, n_rows=40).withColumn(
        "lang", F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                             (F.abs(F.hash("path")) % 3 + 1).cast("int"))
    ).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.format("parquet").schema(schema).load(path)

    def shape(df):
        qf = quality_filter(F.col("content"))
        kept = domain_mix(
            df, {"en": 1.0, "de": 0.5}, key_col="lang", id_col="path"
        )
        return kept.select("path", "lang", qf["keep"].alias("keep"))

    got = S.process_all(shape(stream), "qf_stream", output_mode="append")
    want = shape(spark.read.parquet(path))
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in want.collect())
    assert a == b and len(a) > 0


def test_streaming_graph_ingest_builds_and_merges_store(spark, tmp_path):
    """Micro-batches fold into the bucketed graph substrate: batch 0
    bootstraps, later batches merge incrementally (only the batch's
    just-committed ledger files are read back), the serving tables always
    equal the ledger aggregate, and a crash-replay (fresh stream
    checkpoint, same ledger) rebuilds from the ledger — including from a
    torn serving state."""
    from kargo_spark.graph_store import two_hop, two_hop_from_store
    from kargo_spark.iceberg_lite import IcebergLiteTable

    PREFIX = "t_sgi"
    for suf in ("_triples", "_nodes", "_edges", "_hop_t1", "_hop_t2", "__covered"):
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}{suf}")
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}__stage{suf}")
    src = tmp_path / "docs_src"
    src.mkdir()
    docs = synth_documents(spark, n_rows=60, distinct_paths=True)
    schema = docs.schema
    docs.limit(30).coalesce(1).write.mode("overwrite").parquet(str(src / "f0"))
    docs.subtract(docs.limit(30)).coalesce(1).write.mode("overwrite").parquet(
        str(src / "f1")
    )
    ledger_root = str(tmp_path / "ledger")

    def _stream():
        return (
            spark.readStream.format("parquet").schema(schema)
            .option("maxFilesPerTrigger", 1).load(str(src) + "/*")
        )

    q = S.streaming_graph_ingest(_stream(), PREFIX, ledger_root, str(tmp_path / "ck1"))
    q.awaitTermination(180)

    tbl = IcebergLiteTable(spark, ledger_root)
    assert len(tbl.snapshots()) >= 2  # one ledger snapshot per batch
    expect = sorted(
        map(tuple,
            tbl.read().groupBy("subj", "pred", "obj")
            .agg(F.sum("support").alias("support")).collect())
    )
    got = sorted(map(tuple, spark.table(f"{PREFIX}_triples").collect()))
    assert got == expect and len(got) > 0
    # the substrate serves 2-hop shuffle-free over the merged graph
    served = sorted(map(tuple, two_hop_from_store(spark, PREFIX).collect()))
    assert served == sorted(
        map(tuple, two_hop(spark.table(f"{PREFIX}_triples")).collect())
    )

    # same-checkpoint restart: stream checkpoint acked everything -> no
    # batches re-fire, ledger and store untouched
    n_snaps = len(tbl.snapshots())
    q2 = S.streaming_graph_ingest(
        _stream(), PREFIX, ledger_root, str(tmp_path / "ck1")
    )
    q2.awaitTermination(180)
    assert len(IcebergLiteTable(spark, ledger_root).snapshots()) == n_snaps
    assert sorted(map(tuple, spark.table(f"{PREFIX}_triples").collect())) == expect

    # TRUE crash replay: the ledger committed batch 0 but the app died
    # before the serving refresh AND before the stream-checkpoint ack
    # (simulated: plant the (ck3, batch 0) ledger entry on a fresh
    # ledger, no serving store at all). The re-delivered batch 0 must be
    # skipped ledger-side and trigger the rebuild; batch 1 then merges
    # incrementally on top.
    from kargo_spark.pipeline import triples_chain

    for suf in ("_triples", "_nodes", "_edges", "_hop_t1", "_hop_t2", "__covered"):
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}{suf}")
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}__stage{suf}")
    ledger2 = str(tmp_path / "ledger2")
    t0, cached = triples_chain(spark.read.parquet(str(src / "f0")))
    ck3 = str(tmp_path / "ck3")
    IcebergLiteTable(spark, ledger2).commit(
        t0.select("subj", "pred", "obj", "support"),
        operation="overwrite",
        summary_extra={"streaming_batch_id": 0, "streaming_checkpoint": ck3},
    )
    for df in cached:
        df.unpersist()
    q3 = S.streaming_graph_ingest(_stream(), PREFIX, ledger2, ck3)
    q3.awaitTermination(180)
    tbl2 = IcebergLiteTable(spark, ledger2)
    ids = [s["summary"]["streaming_batch_id"] for s in tbl2.snapshots()]
    assert sorted(ids) == [0, 1]  # batch 0 deduped, batch 1 appended
    expect2 = sorted(
        map(tuple,
            tbl2.read().groupBy("subj", "pred", "obj")
            .agg(F.sum("support").alias("support")).collect())
    )
    assert sorted(map(tuple, spark.table(f"{PREFIX}_triples").collect())) == expect2
    assert spark.catalog.tableExists(f"{PREFIX}_hop_t1")  # rebuilt + refreshed
    for suf in ("_triples", "_nodes", "_edges", "_hop_t1", "_hop_t2", "__covered"):
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}{suf}")
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}__stage{suf}")


def test_streaming_graph_ingest_amortized_refresh(spark, tmp_path):
    """refresh_every=3: the ledger commits every batch exactly-once, but
    the serving store refreshes only at the cadence — after a 2-file
    drain it reflects the bootstrap batch only (lag < refresh_every);
    refresh_graph_serving forces the sync and stamps the marker."""
    from kargo_spark.iceberg_lite import IcebergLiteTable
    from kargo_spark.streaming import refresh_graph_serving

    PREFIX = "t_sgi_amort"
    for suf in ("_triples", "_nodes", "_edges", "_hop_t1", "_hop_t2", "__covered"):
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}{suf}")
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}__stage{suf}")
    src = tmp_path / "docs_src"
    src.mkdir()
    docs = synth_documents(spark, n_rows=50, distinct_paths=True)
    docs.limit(25).coalesce(1).write.mode("overwrite").parquet(str(src / "f0"))
    docs.subtract(docs.limit(25)).coalesce(1).write.mode("overwrite").parquet(
        str(src / "f1")
    )
    ledger_root = str(tmp_path / "ledger")
    stream = (
        spark.readStream.format("parquet").schema(docs.schema)
        .option("maxFilesPerTrigger", 1).load(str(src) + "/*")
    )
    q = S.streaming_graph_ingest(
        stream, PREFIX, ledger_root, str(tmp_path / "ck"), refresh_every=3
    )
    q.awaitTermination(180)
    tbl = IcebergLiteTable(spark, ledger_root)
    assert len(tbl.snapshots()) == 2  # both batches durable in the ledger
    agg = lambda df: sorted(
        map(tuple, df.groupBy("subj", "pred", "obj")
            .agg(F.sum("support").alias("support")).collect())
    )
    first_only = agg(tbl.read(snapshot_id=tbl.snapshots()[0]["snapshot_id"]))
    full = agg(tbl.read())
    got = sorted(map(tuple, spark.table(f"{PREFIX}_triples").collect()))
    assert got == first_only and got != full  # serving lags by design
    refresh_graph_serving(spark, PREFIX, ledger_root)
    assert sorted(map(tuple, spark.table(f"{PREFIX}_triples").collect())) == full
    from kargo_spark.streaming import _covered_marker
    assert _covered_marker(spark, PREFIX) == tbl.current_snapshot_id()
    for suf in ("_triples", "_nodes", "_edges", "_hop_t1", "_hop_t2", "__covered"):
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}{suf}")
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}__stage{suf}")


def test_full_lifecycle_ingest_compact_expire_serve(spark, tmp_path):
    """r05 verdict next-step #8 — the 100-TB maintenance story end to end
    in ONE test: N streaming batches -> amortized serving refresh ->
    forced sync -> ledger compaction -> snapshot expiry -> 2-hop served
    off the bucketed store. Asserts the ledger's live file count SHRINKS
    across compact+expire while the served 2-hop result is invariant at
    every step."""
    import os

    from kargo_spark.graph_store import two_hop, two_hop_from_store
    from kargo_spark.iceberg_lite import IcebergLiteTable
    from kargo_spark.streaming import refresh_graph_serving

    PREFIX = "t_lifecycle"
    for suf in ("_triples", "_nodes", "_edges", "_hop_t1", "_hop_t2", "__covered"):
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}{suf}")
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}__stage{suf}")
    src = tmp_path / "docs_src"
    src.mkdir()
    docs = synth_documents(spark, n_rows=80, distinct_paths=True)
    quarter = 20
    parts = [docs.limit(quarter)]
    rest = docs.subtract(docs.limit(quarter))
    parts.append(rest.limit(quarter))
    rest2 = rest.subtract(rest.limit(quarter))
    parts.append(rest2.limit(quarter))
    parts.append(rest2.subtract(rest2.limit(quarter)))
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("overwrite").parquet(str(src / f"f{i}"))
    ledger_root = str(tmp_path / "ledger")
    stream = (
        spark.readStream.format("parquet").schema(docs.schema)
        .option("maxFilesPerTrigger", 1).load(str(src) + "/*")
    )
    # 4 batches, serving refreshed every 2nd ledger snapshot
    q = S.streaming_graph_ingest(
        stream, PREFIX, ledger_root, str(tmp_path / "ck"), refresh_every=2
    )
    q.awaitTermination(300)
    tbl = IcebergLiteTable(spark, ledger_root)
    assert len(tbl.snapshots()) == 4  # every batch durable, exactly once
    refresh_graph_serving(spark, PREFIX, ledger_root)  # force final sync

    agg = lambda df: sorted(
        map(tuple, df.groupBy("subj", "pred", "obj")
            .agg(F.sum("support").alias("support")).collect())
    )
    ledger_full = agg(tbl.read())
    assert sorted(map(tuple, spark.table(f"{PREFIX}_triples").collect())) == ledger_full
    served_before = sorted(map(tuple, two_hop_from_store(spark, PREFIX).collect()))
    assert served_before == sorted(
        map(tuple, two_hop(spark.table(f"{PREFIX}_triples")).collect())
    )

    def _live_files():
        live = set()
        sid = tbl.current_snapshot_id()
        for d in tbl._snapshot(sid)["data_dirs"]:
            for base, _dirs, names in os.walk(d):
                live.update(
                    os.path.join(base, n) for n in names if n.endswith(".parquet")
                )
        return live

    files_before = _live_files()
    assert len(files_before) >= 4  # one data dir per append batch

    # compact the ledger (binpack rewrite), then expire pre-compaction
    # snapshots — files must shrink, data must not change
    res = tbl.compact(target_file_mb=64, min_input_files=2)
    assert res["compacted"] is True
    removed = tbl.expire_snapshots(keep_last=1)
    assert removed  # the four append snapshots are reclaimed
    files_after = _live_files()
    assert len(files_after) < len(files_before)
    assert agg(tbl.read()) == ledger_full

    # the serving store still answers the same 2-hop after maintenance,
    # and a rebuild from the compacted ledger converges to the same state
    assert sorted(
        map(tuple, two_hop_from_store(spark, PREFIX).collect())
    ) == served_before
    refresh_graph_serving(spark, PREFIX, ledger_root)
    assert sorted(map(tuple, spark.table(f"{PREFIX}_triples").collect())) == ledger_full
    assert sorted(
        map(tuple, two_hop_from_store(spark, PREFIX).collect())
    ) == served_before
    for suf in ("_triples", "_nodes", "_edges", "_hop_t1", "_hop_t2", "__covered"):
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}{suf}")
        spark.sql(f"DROP TABLE IF EXISTS {PREFIX}__stage{suf}")
