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


def __getattr__(name: str):
    """Lazy re-exports of the reference's public API (§2.11 parity:
    reference __init__.py:42-65) — deferred so importing the package
    does not import pyspark submodules eagerly."""
    from importlib import import_module

    home = {
        "fetch_trades": "api", "describe": "api",
        "collect_trades": "sources", "CheckpointStore": "sources",
        "validate_page_continuity": "sources",
        "parse_instrument": "functions.instrument",
        "is_valid_instrument": "functions.instrument",
        "quality_metrics": "validation", "coverage_by_group": "validation",
        "gap_analysis": "validation",
        "format_validation_report": "validation",
        "build_validation_report": "validation",
        "print_validation_summary": "validation",
        "load_schema": "schema", "validate_table": "schema",
        "get_spark": "core.session",
    }
    if name in home:
        return getattr(
            import_module(f"gapless_deribit_clickhouse_spark.{home[name]}"), name
        )
    if name == "features":
        return import_module("gapless_deribit_clickhouse_spark.features")
    raise AttributeError(name)


def get_capabilities() -> list[str]:
    """Flat capability list (reference probe.py:47-160)."""
    from gapless_deribit_clickhouse_spark.api import describe

    caps = describe()["capabilities"]
    return sorted(x for group in caps.values() for x in group)


def get_data_sources() -> list[str]:
    from gapless_deribit_clickhouse_spark.api import describe

    return describe()["data_sources"]


__all__ = [
    "GaplessSparkError",
    "ConfigurationError",
    "QueryError",
    "SchemaError",
    "InstrumentParseError",
    "InsufficientDataError",
    "__version__",
    "fetch_trades",
    "describe",
    "get_capabilities",
    "get_data_sources",
    "collect_trades",
    "CheckpointStore",
    "validate_page_continuity",
    "parse_instrument",
    "is_valid_instrument",
    "quality_metrics",
    "coverage_by_group",
    "gap_analysis",
    "format_validation_report",
    "build_validation_report",
    "print_validation_summary",
    "load_schema",
    "validate_table",
    "get_spark",
]
