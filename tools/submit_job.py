"""spark-submit entry: resumable extraction over a pages table.

Run via tools/submit.sh (packages the library as --py-files). The session
comes from spark-submit's conf, not the local factory — this file must work
with nothing on sys.path but the shipped zip.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> int:
    input_path, output_dir, run_id = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = SparkSession.builder.appName(f"extract-{run_id}").getOrCreate()
    from docling_japanese_books_spark.pipeline.driver import run_extraction_pipeline

    pages = spark.read.parquet(input_path)
    result = run_extraction_pipeline(
        spark, pages, output_dir, run_id=run_id, source=input_path
    )
    print(
        f"run_id={run_id} buckets={len(result.buckets_processed)} "
        f"skipped={len(result.buckets_skipped)} rows_out={result.rows_out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
