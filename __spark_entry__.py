"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1-style pricing
summary) at sf0.001. ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with DuckDB oracles; the
registry lives in tera_spark/queries/.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _registry():
    import tera_spark.queries as Q

    Q.load_all()
    return Q.QUERIES, Q.ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs, _ = _registry()
    return qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = _registry()
    return dict(qs)


def oracle_sql() -> dict[str, str]:
    _, oracles = _registry()
    return dict(oracles)
