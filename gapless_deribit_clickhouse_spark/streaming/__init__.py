from gapless_deribit_clickhouse_spark.streaming.corpus_ingest import (
    stream_dedup_ingest,
)
from gapless_deribit_clickhouse_spark.streaming.ingest import (
    dedup_stream,
    streaming_ohlc,
    write_stream_idempotent,
)

__all__ = [
    "dedup_stream",
    "stream_dedup_ingest",
    "streaming_ohlc",
    "write_stream_idempotent",
]
