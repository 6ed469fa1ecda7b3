"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``website_traffic_etl_gcp_spark.plans.registry`` — the
single source of truth for every implemented query (SURVEY.md §2) and
its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from website_traffic_etl_gcp_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full reference ETL transform on sf0.001."""
    return plans.REGISTRY["etl_traffic_transform"].builder(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()
