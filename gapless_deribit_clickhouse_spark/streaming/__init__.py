from gapless_deribit_clickhouse_spark.streaming.ingest import (
    dedup_stream,
    streaming_ohlc,
    write_stream_idempotent,
)

__all__ = ["dedup_stream", "streaming_ohlc", "write_stream_idempotent"]
