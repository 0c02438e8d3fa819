"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship blocked binary MEC linkage at sf0.001
queries()     — operator registry (SURVEY.md §2 + training-data ops)
oracle_sql()  — DuckDB equivalents (omitted for iterative fits → rows-only)
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from automatedreclin_spark.entry_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: blocked unsupervised binary
    MEC over the customer-derived record sets; returns matched pairs."""
    return QUERIES["mec_binary_customer"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
