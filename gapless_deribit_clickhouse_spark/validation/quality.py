"""Data-quality metrics, per-group coverage, and gap analysis.

Reference: ``/root/reference/src/gapless_deribit_clickhouse/validation/
data_quality.py`` — server-side SQL aggregates:
- global quality (count, uniqExact, span, null/zero rates, trades/hr)
  at :30-45, 84-136;
- coverage GROUP BY underlying at :69-81, 182-226;
- gap report via ``leadInFrame`` at :48-66, 139-179.

Scale notes: ``countDistinct`` is exact to match ``uniqExact``; at
100 TB swap for ``approx_count_distinct`` (noted in SURVEY §2.4 A11).
The gap window orders globally within each group key — group first
(per underlying/event_type) so no single-partition global sort occurs
on the full fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.functions.conditional import count_if


def quality_metrics(
    df: DataFrame,
    id_col: str = "trade_id",
    ts_col: str = "timestamp",
    null_rate_cols: tuple[str, ...] = ("iv", "index_price"),
    approx_distinct: bool = False,
) -> DataFrame:
    """One-row global quality aggregate (reference data_quality.py:30-45):
    total rows, exact distinct ids, dedup rate, time span, null-or-zero
    counts per monitored column, rows per hour.

    ``approx_distinct=True`` swaps exact ``countDistinct`` (which
    inserts an Expand + second shuffle keyed by the id — the one
    expensive term at 100 TB) for HyperLogLog++
    ``approx_count_distinct`` (single-pass, constant memory, ~2%
    relative error); the reference's `uniqExact` semantics remain the
    default."""
    n = F.count(F.lit(1))
    uniq = (
        F.approx_count_distinct(F.col(id_col))
        if approx_distinct
        else F.countDistinct(F.col(id_col))
    )
    span_hours = (
        F.max(ts_col).cast("long") - F.min(ts_col).cast("long")
    ).cast("double") / 3600.0
    aggs = [
        n.alias("total_rows"),
        uniq.alias("unique_ids"),
        (uniq.cast("double") / n).alias("dedup_rate"),
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
        span_hours.alias("span_hours"),
        (n.cast("double") / F.greatest(span_hours, F.lit(1e-9))).alias("rows_per_hour"),
    ]
    for c in null_rate_cols:
        bad = count_if(F.col(c).isNull() | (F.col(c) == 0))
        aggs.append((bad.cast("double") / n).alias(f"{c}_null_or_zero_rate"))
    return df.agg(*aggs)


def coverage_by_group(
    df: DataFrame,
    group_col: str = "underlying",
    id_col: str = "trade_id",
    distinct_col: str = "instrument_name",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Per-group coverage stats (reference data_quality.py:69-81)."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct(F.col(id_col)).alias("unique_ids"),
        F.countDistinct(F.col(distinct_col)).alias("unique_instruments"),
        F.min(ts_col).alias("min_ts"),
        F.max(ts_col).alias("max_ts"),
    )


def gap_analysis(
    df: DataFrame,
    ts_col: str = "timestamp",
    group_cols: tuple[str, ...] = (),
    threshold_hours: float = 1.0,
    top_n: int = 100,
    bucket_seconds: float = 86400.0,
) -> DataFrame:
    """Top-N inter-row gaps exceeding ``threshold_hours`` (reference
    data_quality.py:48-66): lead(ts) per group, gap in hours, DESC
    limit. Output: group cols + gap_start, gap_end, gap_hours.

    Bucketed (VERDICT r2 #9): with ``group_cols=()`` a plain
    ``lead() OVER (ORDER BY ts)`` is a single-partition global sort of
    the whole fact table. Instead the lead runs within (group, day
    bucket) partitions, and each bucket's LAST row takes its successor
    from a boundary table — per-bucket first timestamps, metadata-scale
    (one row per non-empty bucket), broadcast back. The only
    single-partition sort left orders that tiny boundary table."""
    epoch = F.col(ts_col).cast("double")
    base = df.select(*group_cols, F.col(ts_col)).withColumn(
        "__b", F.floor(epoch / F.lit(float(bucket_seconds)))
    )
    w = Window.partitionBy(*group_cols, "__b").orderBy(F.col(ts_col))
    next_in_bucket = F.lead(F.col(ts_col)).over(w)
    # one row per non-empty (group, bucket): the bucket's first ts and,
    # via lead over the bucket sequence, the NEXT non-empty bucket's
    # first ts (empty buckets in between are skipped correctly)
    wb = Window.partitionBy(*group_cols).orderBy("__b")
    bounds = (
        base.groupBy(*group_cols, "__b")
        .agg(F.min(ts_col).alias("__first"))
        .withColumn("__next_first", F.lead("__first").over(wb))
        .select(*group_cols, "__b", "__next_first")
    )
    next_ts = F.coalesce(next_in_bucket, F.col("__next_first"))
    gap_hours = (next_ts.cast("double") - F.col(ts_col).cast("double")) / 3600.0
    out = (
        base.join(F.broadcast(bounds), on=[*group_cols, "__b"], how="left")
        .withColumn("gap_end", next_ts)
        .withColumn("gap_hours", gap_hours)
        .filter(F.col("gap_hours") > threshold_hours)
        .select(*group_cols, F.col(ts_col).alias("gap_start"), "gap_end", "gap_hours")
    )
    return out.orderBy(F.col("gap_hours").desc(), F.col("gap_start")).limit(top_n)
