"""Driver-facing query registry.

Binds every engine operator (SURVEY.md §2 inventory + the LLM-data-
pipeline extensions) to the driver's testdata tables, pairing each
Spark DataFrame query with the exact ANSI-SQL DuckDB oracle. The
registry is assembled from per-area binding modules; each binding
aliases its output columns identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gapless_deribit_clickhouse_spark.bindings import ALL_BINDINGS

QueryFn = Callable[[SparkSession, str], DataFrame]

FLAGSHIP = "feature_pipeline"


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, fn, _sql in ALL_BINDINGS}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, _fn, sql in ALL_BINDINGS if sql is not None}


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    qs = queries()
    fn = qs.get(FLAGSHIP) or next(iter(qs.values()))
    return fn(spark, sf_dir)
