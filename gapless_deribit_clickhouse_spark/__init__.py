"""gapless_deribit_clickhouse_spark — a PySpark-native analytics engine.

A brand-new engine with the query & data-processing capabilities of the
reference project terrylica/gapless-deribit-clickhouse (a ClickHouse +
pandas vertical analytics pipeline over Deribit options trades), re-
expressed Spark-first: every operator is a DataFrame -> DataFrame
combinator whose logical plan Catalyst optimizes (predicate pushdown,
column pruning, broadcast joins, whole-stage codegen), instead of the
reference's SQL-string templates + client-side pandas split.

Layout
------
core/        SparkSession factory + table registration
schema/      declarative schema SSoT -> StructType / DDL / contracts
functions/   column-level helpers (conditional aggs, time buckets,
             instrument parsing, Black-Scholes, text hashing)
operators/   generic engine operators (dedup, top-k, OHLC resample,
             conditional pivot, rolling windows, gap analysis,
             broadcast enrichment, as-of join)
features/    the reference's domain feature surface (contract
             selection, spot enrichment, moneyness, PCR, term
             structure, DTE buckets, IV percentile, Greeks, EGARCH)
pipelines/   large-scale training-data ops (dedup exact/minhash/
             simhash/ngram/embedding, ANN search, text stats,
             multimodal columns)
sources/     batch ingestion (paginated collector emulation,
             continuity validation, idempotent sinks, checkpoints)
streaming/   Structured Streaming ingestion (watermark + dedup)
validation/  data-quality metrics, gap reports, reporter
"""

from gapless_deribit_clickhouse_spark.exceptions import (
    GaplessSparkError,
    ConfigurationError,
    QueryError,
    SchemaError,
    InstrumentParseError,
    InsufficientDataError,
)

__version__ = "0.1.0"

__all__ = [
    "GaplessSparkError",
    "ConfigurationError",
    "QueryError",
    "SchemaError",
    "InstrumentParseError",
    "InsufficientDataError",
    "__version__",
]
