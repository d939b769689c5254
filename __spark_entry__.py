"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (kernel-backed multi-series
temporal disaggregation over the sf0.001 tables); ``queries()`` /
``oracle_sql()`` expose the full operator inventory from SURVEY.md section 2
plus the large-scale pipeline extensions, each paired with a DuckDB oracle
where ANSI SQL can express the semantics.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tsdisagg_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: chow-lin disaggregation of yearly revenue per order
    priority to monthly frequency, guided by monthly shipped value — the
    full scan -> aggregate -> union -> grouped-kernel pipeline."""
    return _registry.QUERIES["disagg_chow_lin_priority"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
