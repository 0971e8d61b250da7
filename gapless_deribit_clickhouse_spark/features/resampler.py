"""Domain resampler: trades -> regular IV OHLC bars.

Reference: ``/root/reference/src/gapless_deribit_clickhouse/features/
resampler.py:25-170`` — pandas resample with iv first/max/min/last +
amount sum per 15-min bar (``resample_iv``), and a per-DTE-bucket
variant returning a dict of frames (``resample_by_dte_bucket``).

Spark design: thin wrappers over ``operators.resample.ohlc_resample``
(deterministic min_by/max_by open/close); the per-bucket variant is
ONE groupBy with the bucket label as an extra key — not a Python loop
of filters (reference dte loop at resampler.py:114-170).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.features.config import DEFAULT, FeatureConfig
from gapless_deribit_clickhouse_spark.features.dte_buckets import dte_bucket_col
from gapless_deribit_clickhouse_spark.functions.timeutils import dte_days
from gapless_deribit_clickhouse_spark.operators.resample import ohlc_resample


def resample_iv(
    df: DataFrame,
    ts_col: str = "timestamp",
    iv_col: str = "iv",
    amount_col: str = "amount",
    id_col: str = "trade_id",
    keys: tuple[str, ...] = (),
    config: FeatureConfig = DEFAULT,
) -> DataFrame:
    """15-min IV bars: iv_open/high/low/close + volume + n_obs; empty
    bars dropped, null IVs dropped pre-resample (reference
    resampler.py:77)."""
    return ohlc_resample(
        df,
        ts_col=ts_col,
        value_col=iv_col,
        volume_col=amount_col,
        step_seconds=config.resample_seconds,
        keys=keys,
        tiebreak_col=id_col,
        prefix="iv_",
    )


def resample_by_dte_bucket(
    df: DataFrame,
    ts_col: str = "timestamp",
    expiry_col: str = "expiry",
    iv_col: str = "iv",
    amount_col: str = "amount",
    id_col: str = "trade_id",
    config: FeatureConfig = DEFAULT,
) -> DataFrame:
    """Per-DTE-bucket OHLC bars in one pass (long format keyed by
    ``dte_bucket`` instead of the reference's dict of frames)."""
    with_bucket = df.withColumn(
        "dte_bucket", dte_bucket_col(dte_days(F.col(ts_col), F.col(expiry_col)), config)
    ).filter(F.col("dte_bucket").isNotNull())
    return resample_iv(
        with_bucket,
        ts_col=ts_col,
        iv_col=iv_col,
        amount_col=amount_col,
        id_col=id_col,
        keys=("dte_bucket",),
        config=config,
    )
