"""Slowly-changing-dimension (SCD type 2) history from a change log.

The reference keeps only current state (ReplacingMergeTree FINAL,
`/root/reference/schema/clickhouse/options_trades.yaml:26`); a
training-data / feature-store pipeline additionally needs the FULL
validity history so facts can be joined as-of their event time without
leakage. :func:`scd2_history` builds that history from an append-only
change stream; the companion point-in-time join is
``operators/asof.py`` / ``operators/range_join.py``.

Scale design: one shuffle on the key, then three window functions
(lag for change detection, lead for interval close, row_number for the
version) all over the SAME (key, order) window — Spark plans a single
exchange and a single sort. The change-compression filter runs between
lag and lead so closed intervals skip over suppressed duplicates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str | None = None,
) -> DataFrame:
    """One validity row per (key, attribute-state run): consecutive
    rows whose ``attr_cols`` are unchanged collapse into one version
    (classic SCD2 change compression; NULL-safe comparison, so
    NULL -> NULL is "unchanged" and NULL -> value is a change).

    Output: key_cols + attr_cols + ``valid_from`` (first ``ts_col`` of
    the run), ``valid_to`` (next run's valid_from; NULL while current),
    ``version`` (1-based per key), ``is_current``.
    """
    ts_col = ts_col or order_cols[0]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    is_first = F.row_number().over(w) == 1
    runs = df.withColumn("__chg", is_first | changed).filter("__chg")
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return runs.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Leakage-free fact enrichment against an SCD2 history: each fact
    joins the dimension version valid AT its event time — half-open
    ``[valid_from, valid_to)`` semantics, so a fact stamped exactly at
    a change instant sees the NEW version, and zero-duration versions
    are never observable.

    Open (current) intervals are closed at the facts' max timestamp —
    a 1-row scalar broadcast (the bounded-NLJ shape PLANS.md
    allowlists), so no unbounded interval ever reaches the bucketed
    :func:`~gapless_deribit_clickhouse_spark.operators.range_join.interval_join`
    this delegates to. Cost: one metadata-scale aggregate + the range
    join's one shuffle per side; no fact-fact pairing.
    """
    from gapless_deribit_clickhouse_spark.operators.range_join import interval_join

    horizon = facts.agg(F.max(ts_col).alias("__horizon"))
    closed = (
        history.join(F.broadcast(horizon))
        .withColumn(
            "__end",
            F.coalesce(
                F.col(valid_to) - F.expr("INTERVAL 1 MICROSECOND"),
                F.col("__horizon"),
            ),
        )
        .drop("__horizon")
    )
    return interval_join(
        facts,
        closed,
        ts_col,
        valid_from,
        "__end",
        on=list(keys),
        bucket_seconds=bucket_seconds,
        how=how,
    ).drop("__end")
