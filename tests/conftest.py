from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from docling_japanese_books_spark.session import get_spark

    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
