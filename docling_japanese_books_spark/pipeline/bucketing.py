"""Bucketed table layout — pay the shuffle once at write time.

The chunk tables this engine produces are joined on ``doc_id`` over and
over (chunks x docs metadata propagation J3, chunks x images J1, chunks x
embeddings, eval joins): at 100 TB every one of those is a full shuffle
of the fact table UNLESS the storage layout already clusters by the key.
Spark's bucketed tables (``bucketBy`` + ``saveAsTable``) record the hash
clustering in the catalog, so:

- joins between co-bucketed tables (same key, same bucket count) run as
  zipper sort-merge joins with NO Exchange on either side;
- aggregations keyed on the bucket column skip their shuffle too;
- the cost is one clustering at write time — amortized across every
  downstream join of the table's lifetime.

Pinned by tests/test_bucketing.py (executed-plan assertions: no Exchange
under a forced non-broadcast join). On a real cluster the same layout
comes from Iceberg's bucket partition transform; this is the
vanilla-Spark equivalent that works against any Hive-compatible catalog
(including local-session catalogs — point the database LOCATION at the
target filesystem).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and by default sorted)
    by ``key``. Tables meant to be joined together MUST use the same
    ``n_buckets`` — mismatched counts silently reintroduce the shuffle."""
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode(mode).format("parquet").saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left: str, right: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key: with equal
    bucket counts the physical plan is a shuffle-free zipper merge."""
    return spark.table(left).join(spark.table(right), key, how)
