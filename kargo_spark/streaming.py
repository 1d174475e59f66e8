"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.8) — this module is the
beyond-reference streaming path a production ingest needs: documents (or
events) arriving continuously get the same normalization + windowed
analytics, exactly-once, with late data bounded by a watermark.

Jobs are defined against ``readStream`` inputs and are testable
synchronously with the memory sink (``process_all``): a directory of
parquet becomes a bounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_events(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.readStream.format("parquet").schema(schema).load(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts + value sums per type."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    # watermarks require session-TZ timestamps; parquet NTZ columns cast up
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n", "total_value",
        )
    )


def streaming_docs_clean(docs: DataFrame) -> DataFrame:
    """The ingest stage as a streaming transformation: normalization and
    ids are stateless Column ops so they apply to a stream unchanged;
    exact dedup becomes streaming ``dropDuplicates`` (state-backed)."""
    from .corpus import unicodify, with_content_sha, with_doc_id

    out = with_content_sha(docs)
    out = out.dropDuplicates(["repo", "path", "commit"])
    out = unicodify(out)
    out = out.filter(F.length(F.trim("content")) > 0)
    out = with_doc_id(out)
    return with_content_sha(out)


def process_all(stream_df: DataFrame, query_name: str, output_mode: str = "append") -> DataFrame:
    """Drive a streaming DataFrame to completion against bounded input via
    the memory sink; returns the materialized result table."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
