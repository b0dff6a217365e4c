"""Bucketed-layout co-located joins (pipeline/bucketing.py): the
write-once shuffle that makes every later doc_id join exchange-free."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.pipeline.bucketing import (
    cobucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucket_db(spark):
    d = tempfile.mkdtemp(prefix="bucketdb_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS _buckets LOCATION '{d}'")
    yield "_buckets"
    spark.sql("DROP DATABASE IF EXISTS _buckets CASCADE")
    shutil.rmtree(d, ignore_errors=True)


def test_cobucketed_join_and_agg_are_shuffle_free(spark, bucket_db):
    docs = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("meta")
    )
    chunks = spark.range(20000).select(
        (F.col("id") % 5000).alias("doc_id"), F.col("id").alias("chunk_id")
    )
    write_bucketed(docs, f"{bucket_db}.docs_b", "doc_id", n_buckets=8)
    write_bucketed(chunks, f"{bucket_db}.chunks_b", "doc_id", n_buckets=8)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cobucketed_join(spark, f"{bucket_db}.docs_b", f"{bucket_db}.chunks_b", "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # forced sort-merge, yet NO exchange: the catalog bucketing
        # satisfies both sides' distribution requirement
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert j.count() == 20000

        agg = spark.table(f"{bucket_db}.chunks_b").groupBy("doc_id").count()
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan  # bucket layout feeds the agg too
        assert agg.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mismatched_bucket_counts_reintroduce_shuffle(spark, bucket_db):
    """The failure mode the docstring warns about must be observable:
    different bucket counts -> Exchange returns."""
    a = spark.range(2000).select(F.col("id").alias("doc_id"))
    b = spark.range(2000).select(F.col("id").alias("doc_id"))
    write_bucketed(a, f"{bucket_db}.mis_a", "doc_id", n_buckets=8)
    write_bucketed(b, f"{bucket_db}.mis_b", "doc_id", n_buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cobucketed_join(spark, f"{bucket_db}.mis_a", f"{bucket_db}.mis_b", "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
        assert j.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
