from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from seqdatapipeline_spark.session import get_spark

    # Hermetic warehouse: a dirty working tree (e.g. ./spark-warehouse
    # leftovers from a bench run in another process) must never be able
    # to fail the suite, and the suite must never litter the repo.
    warehouse = tmp_path_factory.mktemp("spark-warehouse")
    s = get_spark(
        "seqdatapipeline-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(warehouse)},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(autouse=True)
def _fresh_curated_detection():
    """Curated-layout detection is memoized per session
    (io.layout._DETECT_CACHE); tests create and DROP curated tables
    with raw SQL, which the memo cannot see. Clearing it per test
    keeps every test's detection decision honest — production
    sessions don't drop curated tables mid-run (and call
    detect_cache_clear if they do)."""
    from seqdatapipeline_spark.io.layout import detect_cache_clear

    detect_cache_clear()
    yield
