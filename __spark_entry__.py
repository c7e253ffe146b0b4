"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over the engine package: the query registry lives in
``automated_etl_pipeline_spark/queries*.py`` (PySpark + DuckDB-oracle
pairs per SURVEY.md §2); this module adapts it to the driver's
entry/queries/oracle_sql interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from automated_etl_pipeline_spark import queries as _q
from automated_etl_pipeline_spark import queries_ext  # noqa: F401  (registers)
from automated_etl_pipeline_spark import queries_llm  # noqa: F401  (registers)
from automated_etl_pipeline_spark import queries_ml  # noqa: F401  (registers)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1) on sf0.001: per-priority
    multi-aggregate of orders — scan → groupBy multi-agg → orderBy."""
    return _q.QUERIES["flagship_priority_agg"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
