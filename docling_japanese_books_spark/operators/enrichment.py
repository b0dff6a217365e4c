"""C4/J1: chunk-image reference resolution + text enrichment.

The reference builds a dict {self_ref -> image meta} and probes it per
chunk (``processor.py:337-349`` build, ``:385-389`` probe) — a hash join.
Then enriches chunk text with "[Image: <hash>.png - <caption>]" plus the
first 2 annotations truncated to 200 chars (``processor.py:351-401``).

Spark-first: posexplode the chunk's refs (order preserved), broadcast-join
the per-document images (tiny build side at any corpus size), re-aggregate
per chunk sorting by ref position, concat the enrichment suffix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ANNOTATIONS = 2  # ref processor.py:364
ANNOTATION_TRUNC = 200  # ref image_processor.py:327-331


def image_line(hash_col, caption_col) -> "F.Column":
    return F.concat(
        F.lit("\n[Image: "), hash_col, F.lit(".png - "), caption_col, F.lit("]")
    )


def enrich_chunks_with_images(
    chunks: DataFrame,
    images: DataFrame,
    chunk_key=("doc_id", "chunk_index"),
) -> DataFrame:
    """chunks(doc_id, chunk_index, text, refs:array<string>) ⋈
    images(self_ref, hash, caption, annotations:array<string>) ->
    chunks + enriched_text."""
    keys = list(chunk_key)
    exploded = chunks.select(
        *keys, F.posexplode_outer("refs").alias("ref_pos", "ref")
    )
    annos = F.array_join(
        F.transform(
            F.slice(F.coalesce(F.col("annotations"), F.array()), 1, MAX_ANNOTATIONS),
            lambda a: F.concat(F.lit("\n  - "), F.substring(a, 1, ANNOTATION_TRUNC)),
        ),
        "",
    )
    matched = (
        exploded.join(
            F.broadcast(images), exploded.ref == images.self_ref, "left"
        )
        .select(
            *keys,
            "ref_pos",
            F.when(
                F.col("self_ref").isNotNull(),
                F.concat(image_line(F.col("hash"), F.col("caption")), annos),
            ).alias("suffix"),
        )
    )
    suffixes = matched.groupBy(*keys).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("ref_pos"), F.col("suffix"))
                    )
                ),
                lambda s: F.coalesce(s["suffix"], F.lit("")),
            ),
            "",
        ).alias("_suffix")
    )
    return (
        chunks.join(suffixes, keys, "left")
        .withColumn(
            "enriched_text",
            F.concat(F.col("text"), F.coalesce(F.col("_suffix"), F.lit(""))),
        )
        .drop("_suffix")
    )
