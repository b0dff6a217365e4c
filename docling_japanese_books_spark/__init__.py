"""docling_japanese_books_spark — a PySpark-native extraction/analytics engine.

A from-scratch reimplementation of the capabilities of the reference repo
``paazmaya/docling-japanese-books`` (a single-process Docling → chunk → embed →
Milvus pipeline), re-architected for Spark:

- document corpus = DataFrame over parquet/Iceberg-style tables;
- extraction / chunking = Arrow-batched pandas UDFs (never per-row Python UDFs);
- search / scoring / rollups = declarative DataFrame plans optimized by Catalyst;
- pipeline runs are checkpoint-resumable per bucket with a manifest table.

Nothing here is a translation of the reference's code; reference files are
cited in docstrings (file:line) only to pin WHAT is computed.
"""

__version__ = "0.1.0"
