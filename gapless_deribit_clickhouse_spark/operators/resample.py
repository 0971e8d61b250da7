"""OHLC resampling: irregular events -> regular time-grid bars.

Reference: pandas ``.resample("15min")`` with
``iv: first/max/min/last, amount: sum`` then dropping empty bars
(``/root/reference/src/gapless_deribit_clickhouse/features/resampler.py:74-111``).

Spark-first design: one ``groupBy(bucket, *keys)`` aggregation —
a single shuffle, map-side partial aggregation for free. pandas
``first/last`` are order-dependent; Spark's ``first/last`` in groupBy
are NON-deterministic under shuffle (SURVEY §7.3.2), so open/close are
``min_by/max_by`` keyed on (timestamp, tiebreak) — deterministic on any
cluster. Empty bars never materialize (groupBy only emits observed
groups), which matches the reference's ``dropna`` of empty bins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.functions.timeutils import time_bucket


def ohlc_resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    volume_col: str | None = None,
    step_seconds: int = 900,
    keys: Sequence[str] = (),
    tiebreak_col: str | None = None,
    prefix: str = "",
) -> DataFrame:
    """Aggregate ``value_col`` into OHLC bars of ``step_seconds`` per
    (``bucket_ts``, ``*keys``).

    Output columns: ``bucket_ts``, *keys, ``{prefix}open/high/low/close``,
    ``volume`` (sum of ``volume_col``), ``n_obs``.
    """
    order = F.struct(F.col(ts_col), F.col(tiebreak_col)) if tiebreak_col else F.col(ts_col)
    aggs = [
        F.min_by(F.col(value_col), order).alias(f"{prefix}open"),
        F.max(value_col).alias(f"{prefix}high"),
        F.min(value_col).alias(f"{prefix}low"),
        F.max_by(F.col(value_col), order).alias(f"{prefix}close"),
        F.count(value_col).alias("n_obs"),
    ]
    if volume_col is not None:
        aggs.insert(4, F.sum(volume_col).alias("volume"))
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(time_bucket(F.col(ts_col), step_seconds).alias("bucket_ts"), *keys)
        .agg(*aggs)
    )
