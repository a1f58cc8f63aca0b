from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from isidorus_web_scraper_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small core count + tiny shuffle partitioning keeps the iterative
    # crawl tests fast; correctness is partition-count-independent.
    s = get_spark("iws-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_correct() -> str:
    return "/root/testdata/sf0.01"
