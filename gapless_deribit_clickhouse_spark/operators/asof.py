"""As-of (backward) join: enrich each left row with the most recent
right row at or before its timestamp, per key.

The reference emulates as-of semantics by truncating to 15-minute
buckets and equi-joining (``/root/reference/src/gapless_deribit_
clickhouse/features/spot_provider.py:43-95``; SURVEY §2.3 J7). This
operator provides the exact event-time version as a first-class
primitive.

Scale design — bucketed union-window, not a range join and not a
single per-key window:

1. Tag both inputs and assign a coarse time bucket
   ``floor(epoch / bucket_seconds)``. The fill window partitions by
   ``(keys, bucket)`` — parallelism is keys x buckets, so two symbols
   over a year of daily buckets is ~730 independent tasks, not 2
   (the failure mode of ``partitionBy(keys)`` alone).
2. Within each bucket, ``last(value, ignorenulls=True)`` over
   ``orderBy(ts, side)`` fills every left row from right rows at or
   before it in the SAME bucket. One shuffle of left+right on
   (keys, bucket), linear per partition.
3. Cross-bucket carry: ONE combined groupBy over narrow projections
   of both sides reduces each (key, bucket) to the right side's last
   row plus a left-presence flag (map-side-combinable ``max_by`` /
   ``max``), then a per-key window over BUCKETS (tiny: one row per
   key per bucket, not per event) computes each bucket's carry-in =
   last right row of any earlier bucket. Carries are injected into
   the union as pseudo right rows at the bucket start (sorting before
   any real row in the bucket), so step 2's window resolves in-bucket
   vs carried values with no join operator anywhere in the plan.

A range-condition join would be O(|L|*|R|) per key without an
interval index; the single-window form serializes per key. This form
is one wide shuffle + two metadata-scale passes and stays correct for
any bucket width (carry rows keep their ORIGINAL right timestamp, so
``tolerance_seconds`` still measures true staleness).
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
    bucket_seconds: float = 86400.0,
) -> DataFrame:
    """Backward as-of join (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics): every left row, plus ``value_cols`` from the latest
    right row with ``right_ts <= left_ts`` on the same key (NULLs when
    none exists or it is older than ``tolerance_seconds``).

    ``bucket_seconds`` sets the parallelism grain: the heavy window
    partitions by (keys, floor(ts/bucket_seconds)). Any width is
    correct; pick one that yields partitions fitting executor memory
    (default: daily).
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in on and c != right_ts
        ]
    out_names = [f"{c}{suffix}" for c in value_cols]
    step = float(bucket_seconds)

    def bucket_of(ts_col: str):
        return F.floor(F.col(ts_col).cast("double") / step).cast("long")

    # The right row travels as ONE struct (__payload): the in-bucket
    # fill must carry the latest right ROW atomically — per-column
    # last(ignorenulls) would stitch values from DIFFERENT right rows
    # when the latest row has nulls (merge_asof/ASOF JOIN semantics
    # are row-atomic, and the cross-bucket carry below already is).
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).cast("double").alias("__rts"),
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        ).alias("__payload"),
    ).withColumn("__bucket", bucket_of("__ts"))
    payload_t = r_tag.schema["__payload"].dataType
    l_tag = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_t).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
    ).withColumn("__bucket", bucket_of("__ts"))
    r_tag = r_tag.withColumn(
        "__row", F.lit(None).cast(l_tag.schema["__row"].dataType)
    )

    # --- cross-bucket carry (metadata-scale) ---
    # ONE combined aggregation over narrow projections of BOTH sides:
    # per (key, bucket), the right side reduces to its last row
    # (``max_by`` skips the left rows' NULL order keys) while
    # ``max(__has_left)`` remembers whether the LEFT touches the
    # bucket — every left bucket needs a carry-in, including buckets
    # with no right rows at all. Both aggregates partial-combine
    # map-side, shuffling one row per (key, bucket) per map task.
    # (Round 6: this replaces a right-side groupBy + a left-side
    # distinct + a union — two shuffle stages fused into one.)
    kb = (
        r_tag.select(
            *on, "__bucket", "__payload", F.lit(0).alias("__has_left")
        )
        .unionByName(
            l_tag.select(
                *on, "__bucket", "__payload", F.lit(1).alias("__has_left")
            )
        )
        .groupBy(*on, "__bucket")
        .agg(
            F.max_by(F.col("__payload"), F.col("__payload.__rts")).alias("__p"),
            F.max("__has_left").alias("__has_left"),
        )
    )
    # Per-key running last over buckets, frame excluding the current
    # row: bucket b's carry-in is the last right payload of any bucket
    # < b. Row count here is #distinct (key, bucket) — the "tiny
    # second pass".
    wk = (
        Window.partitionBy(*on)
        .orderBy(F.col("__bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        kb.withColumn("__carry", F.last("__p", ignorenulls=True).over(wk))
        .filter((F.col("__has_left") == 1) & F.col("__carry").isNotNull())
    )
    # Pseudo right row at the bucket start (sorts before every real
    # row of the bucket: ts = bucket floor, side = -1). Keeps the
    # ORIGINAL right timestamp in __rts for tolerance checks.
    pseudo = carry.select(
        *on,
        # cast to the tagged __ts type, not a hard timestamp: left_ts
        # may be a numeric epoch column and unionByName must line up
        (F.col("__bucket").cast("double") * step)
        .cast(l_tag.schema["__ts"].dataType)
        .alias("__ts"),
        F.lit(-1).alias("__side"),
        F.col("__carry").alias("__payload"),
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
        F.col("__bucket"),
    )

    # --- in-bucket fill (the one wide shuffle) ---
    w = (
        Window.partitionBy(*on, "__bucket")
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l_tag.unionByName(r_tag).unionByName(pseudo).select(
            "__side",
            "__row",
            F.col("__ts"),
            # one row-atomic carry: the latest right ROW, nulls and all
            F.last("__payload", ignorenulls=True).over(w).alias("__pf"),
        )
    )
    matched = filled.filter(F.col("__side") == 1)
    rts_f = F.col("__pf").getField("__rts")
    if tolerance_seconds is not None:
        within = (F.col("__ts").cast("double") - rts_f) <= float(tolerance_seconds)
        matched = matched.select(
            "__row",
            *[
                F.when(within, F.col("__pf").getField(name)).alias(name)
                for name in out_names
            ],
        )
    else:
        matched = matched.select(
            "__row",
            *[F.col("__pf").getField(name).alias(name) for name in out_names],
        )
    return matched.select(
        *[F.col(f"__row.{c}").alias(c) for c in left.columns], *out_names
    )
