"""As-of (backward) join: enrich each left row with the most recent
right row at or before its timestamp, per key.

The reference emulates as-of semantics by truncating to 15-minute
buckets and equi-joining (``/root/reference/src/gapless_deribit_
clickhouse/features/spot_provider.py:43-95``; SURVEY §2.3 J7). This
operator provides the exact event-time version as a first-class
primitive.

Scale design — the union-window formulation, not a range join:
tag both inputs, union them, and run ``last(value, ignorenulls=True)``
over ``partitionBy(keys).orderBy(ts, side)``. That is ONE shuffle of
left+right on the join keys and a linear per-partition pass — a
range-condition join would be O(|L|·|R|) per key without an interval
index. Right-side rows at exactly the left timestamp win (ASOF ``<=``
semantics) because the right tag sorts first on ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics): every left row, plus ``value_cols`` from the latest
    right row with ``right_ts <= left_ts`` on the same key (NULLs when
    none exists or it is older than ``tolerance_seconds``)."""
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    out_names = [f"{c}{suffix}" for c in value_cols]

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
        F.lit(None).cast("double").alias("__rts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(right_ts).cast("double").alias("__rts"),
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        "__side",
        "__row",
        F.col("__ts"),
        *[F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in value_cols],
        F.last("__rts", ignorenulls=True).over(w).alias("__rts_f"),
    )
    matched = filled.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        within = (F.col("__ts").cast("double") - F.col("__rts_f")) <= float(tolerance_seconds)
        matched = matched.select(
            "__row",
            *[
                F.when(within, F.col(name)).alias(name)
                for name in out_names
            ],
        )
    else:
        matched = matched.select("__row", *out_names)
    return matched.select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns], *out_names
    )
