"""Query registry: every implemented operator from SURVEY.md §2 gets a
(spark, sf_dir) -> DataFrame entry in QUERIES and, when SQL-expressible,
a DuckDB oracle in ORACLES with identical column names/types.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    from tera_spark.queries import (  # noqa: F401
        cellops,
        curation,
        llmops,
        relational,
        streaming_batch,
        temporal,
    )
