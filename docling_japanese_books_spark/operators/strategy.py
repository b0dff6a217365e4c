"""C7: model -> chunking-strategy map with fallback walk.

Mirrors the reference's strategy selection (``vector_db.py:71-93``
``_determine_chunking_strategies`` substring rules) and fallback chain
(``vector_db.py:95-129`` ``_initialize_chunking_strategy`` walks preferred
then fallbacks, first constructible wins, RuntimeError when all fail), with
the per-model settings table from ``config.py:160-197``.

Strategy names map onto our Spark operators:

- ``late``        -> ``operators/late_chunking.late_chunk`` (S11)
- ``hybrid``      -> C2 enhanced chunker (the reference's hybrid strategy
                     builds on enhanced_chunking.create_chunking_strategy)
- ``traditional`` -> C3 traditional chunker
- ``words``       -> our terminator-less-text fallback (always available)
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# per-model settings (ref config.py:160-197 model_specific_settings)
MODEL_SPECIFIC_SETTINGS: Dict[str, dict] = {
    "BAAI/bge-m3": dict(
        preferred_strategy="late",
        fallback_strategies=["hybrid", "traditional"],
        optimal_chunk_size=400,
        supports_late_chunking=True,
        task=None,
    ),
    "jinaai/jina-embeddings-v4": dict(
        preferred_strategy="hybrid",
        fallback_strategies=["traditional"],
        optimal_chunk_size=512,
        supports_late_chunking=False,
        task="retrieval",
    ),
    "Snowflake/snowflake-arctic-embed-l-v2.0": dict(
        preferred_strategy="traditional",
        fallback_strategies=["hybrid"],
        optimal_chunk_size=512,
        supports_late_chunking=False,
        task=None,
    ),
    "sentence-transformers/all-MiniLM-L6-v2": dict(
        preferred_strategy="traditional",
        fallback_strategies=["hybrid"],
        optimal_chunk_size=384,
        supports_late_chunking=False,
        task=None,
    ),
}


def determine_chunking_strategies(model_name: str) -> Tuple[str, List[str]]:
    """(preferred, fallbacks) by model-name substring (ref vector_db.py:71-93)."""
    m = model_name.lower()
    if "bge-m3" in m:
        return "late", ["hybrid", "traditional"]
    if "jina-embeddings-v4" in m:
        return "hybrid", ["traditional"]
    if "snowflake" in m:
        return "traditional", ["hybrid"]
    return "traditional", ["hybrid"]


def model_task(model_name: str) -> Optional[str]:
    """Task hint for task-aware models (ref vector_db.py:104-107)."""
    return "retrieval" if "jina-embeddings-v4" in model_name.lower() else None


def resolve_chunking_strategy(
    model_name: str,
    factories: Dict[str, Callable],
) -> Tuple[Callable, str]:
    """Fallback walk (ref vector_db.py:95-129): try the preferred strategy
    then each fallback; the first whose factory constructs wins. A factory
    raising (or a missing name) means 'unavailable' — exactly the
    reference's per-strategy try/except. RuntimeError when all fail."""
    preferred, fallbacks = determine_chunking_strategies(model_name)
    errors = []
    for strategy in [preferred] + fallbacks:
        factory = factories.get(strategy)
        if factory is None:
            errors.append(f"{strategy}: not registered")
            continue
        try:
            return factory(), strategy
        except Exception as ex:  # unavailable -> walk on
            errors.append(f"{strategy}: {ex}")
            continue
    raise RuntimeError(
        f"All chunking strategies failed for {model_name}: {'; '.join(errors)}"
    )


def default_strategy_factories(
    max_chunk_length: int = 500, token_chars: int = 16
) -> Dict[str, Callable]:
    """Factories returning Spark chunking callables (docs -> DataFrame)."""
    from .chunking import chunk_documents
    from .late_chunking import late_chunk

    def _chunker(method: str, tag: str):
        # tag = the STRATEGY name (what chunk_with_strategy reports), which
        # may differ from the underlying text-splitter method: 'hybrid'
        # rides the C2 'enhanced' splitter but must be labeled 'hybrid' so
        # the column and strategy_used never disagree
        def make():
            def run(docs: DataFrame) -> DataFrame:
                return chunk_documents(
                    docs, method=method, max_chunk_length=max_chunk_length
                ).withColumn("chunking_method", F.lit(tag))

            return run

        return make

    def _late():
        def run(docs: DataFrame) -> DataFrame:
            return late_chunk(
                docs, max_chunk_length=max_chunk_length, token_chars=token_chars
            )

        return run

    return {
        "late": _late,
        "hybrid": _chunker("enhanced", "hybrid"),  # C2 is the hybrid splitter
        "traditional": _chunker("traditional", "traditional"),
        "words": _chunker("words", "words"),
    }


def chunk_with_strategy(
    docs: DataFrame,
    model_name: str,
    max_chunk_length: int = 500,
    factories: Optional[Dict[str, Callable]] = None,
) -> Tuple[DataFrame, str]:
    """Chunk ``docs`` with the model's preferred strategy (fallback walk on
    unavailability). Returns (chunks, strategy_used)."""
    fs = factories or default_strategy_factories(max_chunk_length)
    run, strategy = resolve_chunking_strategy(model_name, fs)
    out = run(docs)
    if "chunking_method" not in out.columns:
        out = out.withColumn("chunking_method", F.lit(strategy))
    return out, strategy
