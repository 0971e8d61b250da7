"""Structured Streaming ingestion: the streaming-native story for the
reference's emulated-streaming semantics (SURVEY §2.9).

| Reference behavior                          | Here                         |
|---------------------------------------------|------------------------------|
| checkpoint file, resume same job            | ``checkpointLocation``       |
| dedup token per insert batch                | idempotent ``foreachBatch``  |
| inter-page dup detection + MergeTree dedup  | watermark + ``dropDuplicatesWithinWatermark`` |
| 15-min tumbling truncation                  | ``F.window(ts, '15 minutes')``|

The file source (parquet page-drops) stands in for the REST feed —
swap ``readStream.parquet`` for a Kafka source in production; nothing
downstream changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def read_trade_stream(
    spark: SparkSession, input_path: str, schema: T.StructType
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_path)
    )


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "timestamp",
    id_col: str = "trade_id",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Late/duplicate handling: events later than the watermark are
    dropped; duplicates of an id within the watermark window are
    dropped exactly-once (state is bounded by the delay — the
    streaming-native ReplacingMergeTree)."""
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        [id_col]
    )


def streaming_ohlc(
    stream: DataFrame,
    ts_col: str = "timestamp",
    value_col: str = "iv",
    amount_col: str = "amount",
    keys: tuple[str, ...] = (),
    window: str = "15 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming 15-min bars: watermarked tumbling-window aggregation
    (append mode emits a bar once the watermark passes its end)."""
    v = F.col(value_col)
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *keys)
        .agg(
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.min_by(v, F.col(ts_col)).alias("open"),
            F.max_by(v, F.col(ts_col)).alias("close"),
            F.sum(amount_col).alias("volume"),
            F.count(v).alias("n_obs"),
        )
        .select(F.col("w.start").alias("bucket_ts"), *keys, "open", "high", "low", "close", "volume", "n_obs")
    )


def write_stream_idempotent(
    stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Exactly-once sink: ``foreachBatch`` writes each micro-batch into
    its own ``batch_id`` partition with dynamic partition overwrite —
    a replayed epoch overwrites itself instead of appending twice
    (the Delta txnAppId/txnVersion pattern on plain parquet)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_path)
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
