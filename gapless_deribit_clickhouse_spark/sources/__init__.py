from gapless_deribit_clickhouse_spark.sources.rest_collector import (
    CheckpointStore,
    SyntheticTradePages,
    collect_trades,
    validate_page_continuity,
)

__all__ = [
    "CheckpointStore",
    "SyntheticTradePages",
    "collect_trades",
    "validate_page_continuity",
]
