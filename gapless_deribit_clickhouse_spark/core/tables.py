"""Test-data table registration.

The driver provides TPC-H-ish parquet tables plus ``events`` (an event
stream), ``documents`` (text corpus) and ``embeddings`` (vectors) at
``/root/testdata/sf*/``. Every engine query addresses them as temp
views so the same code runs over any scale factor directory — and, on
a real deployment, over a catalog table instead (swap ``load_tables``
for ``spark.table``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) in the parquet footer; with
        # nanosAsLong=true it arrives as long — integer-truncate to
        # microsecond TimestampType, bit-identical to DuckDB's ns read.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load each parquet table lazily; no action is triggered."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every table as a temp view (idempotent)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
