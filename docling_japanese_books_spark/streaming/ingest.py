"""Structured Streaming veneer (SURVEY §2.9 — the reference is batch-only;
these are the standard Spark-idiomatic streaming counterparts the north rule
wants for incremental crawling):

- ``incremental_extract``: readStream over the pages table + availableNow
  trigger -> boilerplate strip -> append sink. Each invocation processes
  exactly the files that arrived since the last checkpointed offset — the
  streaming face of the batch pipeline's bucket-resume.
- ``windowed_event_metrics``: watermark + tumbling window throughput
  metrics (late data handled by the watermark).
- ``dedup_recrawls``: drop late re-crawls of the same url within the
  watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extraction.html import extract_pages
from ..extraction.pages import PAGES_SCHEMA


def incremental_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
) -> None:
    """Process NEW page files only (availableNow + checkpoint), then stop.

    Scale: on a cluster this is the continuous-crawl ingestion job; the
    checkpoint directory holds the exactly-once file-source offsets, so a
    crashed run resumes where it left off — no manifest needed because the
    source (not the sink) tracks progress."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_path)
    )
    extracted = extract_pages(stream).select(
        "url",
        "warc_ts",
        "lang",
        F.col("extracted.text").alias("text"),
        F.col("extracted.status").alias("status"),
        F.col("extracted.blocks_kept").alias("blocks_kept"),
        F.col("extracted.blocks_dropped").alias("blocks_dropped"),
    )
    q = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_metrics(
    events: DataFrame,
    watermark: str = "10 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type. Works identically
    on a batch DataFrame (watermark is a no-op there) and a stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def dedup_recrawls(pages_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Keep the first crawl of each url within the watermark horizon
    (dropDuplicatesWithinWatermark bounds the dedup state — an unbounded
    dropDuplicates would OOM a long-running stream)."""
    return pages_stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )


def incremental_late_chunk(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    schema: str = "doc_id long, text string",
    max_chunk_length: int = 200,
) -> None:
    """Streaming late chunking (S11 on a stream): new document files ->
    span-pooled chunk embeddings, exactly-once via the file-source
    checkpoint. The late_chunk operator is a stateless mapInPandas, so it
    composes with Structured Streaming unchanged — the streaming face of
    the flagship batch path. The pooled vector is stored alongside a
    digest column so downstream vector sinks and relational sinks both
    read it directly."""
    from ..operators.late_chunking import late_chunk

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_path)
    )
    chunks = late_chunk(
        stream, method="words", max_chunk_length=max_chunk_length
    ).withColumn("emb_digest", F.xxhash64(F.to_json("embedding")))
    q = (
        chunks.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
