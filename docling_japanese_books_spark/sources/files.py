"""File-corpus sources (reference §2.1 S1-S3 rebuilt as table scans).

The reference discovers documents with ``rglob`` + extension + stat-size
predicates (``processor.py:218-244``). Spark-first: the corpus IS a scan —
``binaryFile`` format with recursive lookup; the extension filter becomes a
pushed ``pathGlobFilter``, the size guard a Catalyst filter on the
``length`` column the source exposes, both applied before a single payload
byte reaches Python.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ref config.py:52-66 supported suffixes
SUPPORTED_EXTENSIONS = (
    "pdf docx pptx html htm md txt png jpg jpeg".split()
)
MAX_FILE_SIZE_MB = 100  # ref config.py:47-49


def discover_files(
    spark: SparkSession,
    directory: str,
    extensions: Optional[Sequence[str]] = None,
    max_size_mb: int = MAX_FILE_SIZE_MB,
) -> DataFrame:
    """S1+S2+S3: recursive discovery with extension + size predicates.

    Returns (path, modificationTime, length, content). The glob and the
    length predicate are evaluated at the source — oversized or
    unsupported files are never opened (same short-circuit as the
    reference's stat() check, ref processor.py:231-237)."""
    exts = list(extensions or SUPPORTED_EXTENSIONS)
    glob = "*.{" + ",".join(exts) + "}"
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(directory)
    )
    return df.filter(F.col("length") <= max_size_mb * 1024 * 1024)


def file_extension(path: "F.Column") -> "F.Column":
    """Lower-cased extension of a path column (S2 predicate building block)."""
    return F.lower(F.regexp_extract(path, r"\.([^./\\]+)$", 1))


def extension_histogram(files: DataFrame) -> DataFrame:
    """A15 file-type histogram (ref cli.py:84-92)."""
    return (
        files.select(file_extension(F.col("path")).alias("ext"))
        .groupBy("ext")
        .agg(F.count("*").alias("n"))
    )
