from gapless_deribit_clickhouse_spark.operators.asof import asof_join
from gapless_deribit_clickhouse_spark.operators.dedup import compact_table, dedup_latest
from gapless_deribit_clickhouse_spark.operators.range_join import interval_join
from gapless_deribit_clickhouse_spark.operators.resample import ohlc_resample
from gapless_deribit_clickhouse_spark.operators.topk import ordered_limit, top1_per_group

__all__ = ["asof_join", "compact_table", "dedup_latest", "interval_join", "ohlc_resample", "ordered_limit", "top1_per_group"]
