"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pricing-summary aggregation at sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 (plus the north-star dedup/similarity/text/multimodal
extensions) for the DuckDB correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from duo_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from duo_spark.queries import q_pricing_summary

    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
