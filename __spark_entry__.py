"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (the htseq-count analog —
interval join + grouped count, the reference's raison d'être,
tools.py:625-674) at sf0.001. `queries()` / `oracle_sql()` expose
every implemented operator from SURVEY.md §2 plus the training-data
extensions; the driver checks each against DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from seqdatapipeline_spark import registry  # noqa: E402
from seqdatapipeline_spark import registry_ext  # noqa: E402,F401 — populates registry
from seqdatapipeline_spark import registry_scalars  # noqa: E402,F401 — populates registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interval join (bin-and-explode equi-join rewrite) +
    grouped count on sf0.001 — gene_read_count end-to-end."""
    return registry.QUERIES["feature_interval_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query above."""
    return dict(registry.ORACLES)
