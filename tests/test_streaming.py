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
