"""Table-format abstraction: parquet fallback works; Iceberg gated cleanly."""

import shutil
import tempfile

from docling_japanese_books_spark.sources.tables import (
    iceberg_available,
    read_table,
    write_table,
)


def test_parquet_fallback_roundtrip(spark):
    d = tempfile.mkdtemp()
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        write_table(df, f"{d}/t", partition_by=["v"])
        back = read_table(spark, f"{d}/t")
        assert {(r.id, r.v) for r in back.collect()} == {(1, "a"), (2, "b")}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_iceberg_gate_detects_absence(spark):
    # this container ships no iceberg jars; the gate must say so (and the
    # read/write paths above must have used the parquet fallback)
    assert iceberg_available(spark) is False
