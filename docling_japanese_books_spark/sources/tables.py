"""Table-format abstraction: Iceberg when available, parquet layout otherwise.

The north rule targets Iceberg tables of Common-Crawl pages. This container
ships no Iceberg runtime jars, so the catalog wiring is gated: with the jars
on the classpath (`spark.jars.packages org.apache.iceberg:...`),
``configure_iceberg`` + ``read_table``/``write_table`` speak real Iceberg
(snapshot isolation, hidden partitioning, time travel); without them the
same call sites fall back to directory-partitioned parquet with dynamic
partition overwrite — the exact layout the pipeline driver already uses, so
swapping formats is a config change, not a code change.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PACKAGE = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13"


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j resolves packages lazily — only Class.forName truly checks
        spark._jvm.java.lang.Class.forName(  # type: ignore[attr-defined]
            "org.apache.iceberg.Schema"
        )
        return True
    except Exception:
        return False


def configure_iceberg(builder, warehouse: str):
    """SparkSession.Builder configs for a local Iceberg hadoop catalog.
    No-op cost if the jars are absent (Spark just won't resolve the catalog)."""
    return (
        builder.config(
            "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", warehouse)
    )


def _is_catalog_identifier(identifier: str) -> bool:
    """True only for catalog.db.table-shaped names — a filesystem path like
    '/data/documents.parquet' contains '.' but must stay on the parquet
    path, so the check requires dotted bare identifiers, no separators, and
    no data-file extension as the last segment (a bare relative filename
    like 'documents.parquet' is a file, not a table)."""
    import re

    if not re.fullmatch(
        r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*){1,2}", identifier
    ):
        return False
    ext = identifier.rsplit(".", 1)[-1].lower()
    return ext not in {"parquet", "json", "jsonl", "csv", "orc", "avro", "txt"}


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """identifier: 'local.db.pages' (Iceberg) or a parquet path (fallback)."""
    if _is_catalog_identifier(identifier) and iceberg_available(spark):
        return spark.read.format("iceberg").load(identifier)
    return spark.read.parquet(identifier)


def write_table(
    df: DataFrame,
    identifier: str,
    mode: str = "overwrite",
    partition_by: Optional[list] = None,
) -> None:
    spark = df.sparkSession
    if _is_catalog_identifier(identifier) and iceberg_available(spark):
        writer = df.writeTo(identifier)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(identifier)
