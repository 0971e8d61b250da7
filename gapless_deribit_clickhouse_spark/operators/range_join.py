"""Interval (range) join: match point events to containing intervals.

The reference has no range join (SURVEY §2.3 J7 — it emulates temporal
lookup by 15-minute truncation + equi-join); this is the general
first-class primitive, needed whenever enrichment windows are
variable-length (sessions, maintenance windows, quote validity spans).

Scale design — bucketed equi-join, not a range-predicate join: Spark
compiles a bare ``l.ts BETWEEN r.start AND r.end`` join into
BroadcastNestedLoopJoin (O(|L|·|R|) work, driver-sized broadcast) —
unusable at fact-table scale. Instead both sides are mapped onto
fixed-width time buckets: each left row to the single bucket containing
its timestamp, each right interval to every bucket it overlaps
(``sequence`` + ``explode``). The join is then a plain hash equi-join
on ``(keys..., bucket)`` with the exact containment predicate applied
as a post-filter. One shuffle per side, no nested loop; a matching
pair meets in exactly one bucket (the left row's), so no dedup pass is
needed. Pick ``bucket_seconds`` near the typical interval length: the
explode factor is ceil(interval/bucket)+1 and the per-bucket fan-in
stays bounded.

``multi_resolution=True`` removes the single-width assumption for
interval sets with heavy span skew (an SCD2 history whose current
versions stay open for months next to minute-scale churn): each
interval is assigned to the power-of-two level where its span fits in
one bucket width (so it explodes into at most TWO cells, whatever its
length), and each left row probes every level that actually occurs on
the right — a broadcast of the distinct-level set, at most
``_MAX_LEVEL+1`` rows. Right-side explode is O(1) instead of
O(span/bucket); left-side explode is the number of DISTINCT span
magnitudes (log-bounded), not the magnitude itself. A matching pair
still meets exactly once: the interval lives at one level, and the
left row has one bucket there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from gapless_deribit_clickhouse_spark.core.barrier import BARRIER_STORAGE

# Level cap for multi-resolution mode: bucket width at level L is
# bucket_seconds << L, so even a 60 s base covers ~2,000 years of span
# at level 30 — any longer interval just lands in the top level (which
# stays correct: it explodes into a handful of cells instead of two).
_MAX_LEVEL = 30


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
    multi_resolution: bool = False,
) -> DataFrame:
    """Join each left row to every right interval with
    ``start_col <= left_ts <= end_col`` (and equal ``on`` keys).

    ``how`` may be ``inner`` or ``left`` (unmatched left rows kept with
    NULL right columns). Right columns clashing with left names are
    dropped except the interval bounds, which are kept under a
    ``_right`` suffix when their names clash (keeping the bare name
    would make every reference to them ambiguous).

    ``multi_resolution=True`` (see module docstring) bounds the
    explode factor under span skew; it reads the right side twice (once
    for the distinct-level broadcast, once for the join) — checkpoint
    or cache an expensive right subtree before calling.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = list(on or [])
    if multi_resolution:
        return _interval_join_ml(
            left, right, left_ts, start_col, end_col, on, bucket_seconds, how
        )

    b = F.lit(int(bucket_seconds))
    lb = left.withColumn("__b", F.floor(F.unix_timestamp(F.col(left_ts)) / b))
    rb, s_name, e_name = _dedup_right(left, right, start_col, end_col, on)
    rb = rb.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(s_name)) / b),
                F.floor(F.unix_timestamp(F.col(e_name)) / b),
            )
        ),
    )
    contained = F.col(left_ts).between(F.col(s_name), F.col(e_name))
    if how == "inner":
        return lb.join(rb, on=on + ["__b"], how="inner").filter(contained).drop("__b")
    # left join: containment must be part of the join condition, not a
    # post-filter, or unmatched rows vanish; a matching pair still
    # meets in exactly one bucket so no dedup is needed
    cond = contained
    for k in on + ["__b"]:
        cond = cond & (lb[k] == rb[k])
    out = lb.join(rb, on=cond, how="left")
    return out.drop(rb["__b"]).drop(lb["__b"]).drop(*[rb[k] for k in on])


def _dedup_right(
    left: DataFrame,
    right: DataFrame,
    start_col: str,
    end_col: str,
    on: list[str],
) -> tuple[DataFrame, str, str]:
    """Drop right columns that clash with left names (except the join
    keys and the interval bounds, which get a ``_right`` suffix when
    they clash) so the joined frame has unambiguous references."""
    dup = [c for c in right.columns if c in left.columns and c not in on]
    rb = right.drop(*[c for c in dup if c not in (start_col, end_col)])
    s_name, e_name = start_col, end_col
    if start_col in dup:
        s_name = f"{start_col}_right"
        rb = rb.withColumnRenamed(start_col, s_name)
    if end_col in dup:
        e_name = f"{end_col}_right"
        rb = rb.withColumnRenamed(end_col, e_name)
    if {s_name, e_name} & set(left.columns):
        raise ValueError(
            f"cannot disambiguate interval bounds {s_name!r}/{e_name!r}: "
            "suffixed name also exists on the left side"
        )
    return rb, s_name, e_name


def _interval_join_ml(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    on: list[str],
    bucket_seconds: int,
    how: str,
) -> DataFrame:
    """Multi-resolution bucketed interval join (module docstring):
    interval → the power-of-two level where one bucket holds its whole
    span (``level = ceil(log2(ceil(span/base)))``, capped at
    ``_MAX_LEVEL``), so it explodes into ≤ 2 cells — except above the
    cap, where it covers ``span / (base << _MAX_LEVEL)`` cells, still
    tiny.  Left rows probe every level the right side actually uses
    (broadcast cross join with the ≤ ``_MAX_LEVEL+1``-row distinct-level
    set).  Uniqueness of a matched pair is per-level: the interval is
    assigned to exactly one level and the left row has exactly one
    bucket there."""
    base = F.lit(int(bucket_seconds))
    if how == "left":
        # left join needs a row id for the unmatched-recovery anti-join
        # below; monotonically_increasing_id is only stable within one
        # materialization, so the id-stamped frame is pinned with a
        # lazy localCheckpoint (both join branches must see the SAME
        # assignment) — the how="left" multi-resolution path therefore
        # materializes the left side once.
        left = left.withColumn(
            "__lid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False, storageLevel=BARRIER_STORAGE)
    rb, s_name, e_name = _dedup_right(left, right, start_col, end_col, on)

    span_cells = F.greatest(
        F.ceil(
            (F.unix_timestamp(F.col(e_name)) - F.unix_timestamp(F.col(s_name)))
            / base
        ),
        F.lit(1),
    )
    rb = rb.withColumn(
        "__lvl",
        F.least(F.ceil(F.log2(span_cells)), F.lit(_MAX_LEVEL)).cast("int"),
    )
    width = base * F.expr("shiftleft(1L, __lvl)")
    rb = rb.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(s_name)) / width),
                F.floor(F.unix_timestamp(F.col(e_name)) / width),
            )
        ),
    )

    # Second read of the right subtree — metadata-sized result (≤ 31
    # rows), broadcast so the left-side explode is a codegen-local
    # nested loop over a handful of level values, not a shuffle. The
    # probe column is re-aliased (__plvl → fresh exprId) so the left
    # frame does not share the right frame's attribute lineage — a
    # bare reuse trips Spark's ambiguous-self-join detection in the
    # how="left" condition join.
    levels = rb.select(F.col("__lvl").alias("__plvl")).distinct()
    lb = (
        left.crossJoin(F.broadcast(levels))
        .withColumn(
            "__b",
            F.floor(
                F.unix_timestamp(F.col(left_ts))
                / (base * F.expr("shiftleft(1L, __plvl)"))
            ),
        )
        .withColumnRenamed("__plvl", "__lvl")
    )

    contained = F.col(left_ts).between(F.col(s_name), F.col(e_name))
    matched = (
        lb.join(rb, on=on + ["__lvl", "__b"], how="inner")
        .filter(contained)
        .drop("__b", "__lvl")
    )
    if how == "inner":
        return matched
    # left join: a left row probes EVERY level, so a per-level outer
    # join would emit one NULL-extended copy per non-matching level —
    # and whether any OTHER level matched is cross-copy knowledge no
    # per-row filter has. Instead: inner-join, then recover the rows
    # that matched at NO level by anti-joining on the row id stamped
    # above, NULL-extending them via unionByName.
    unmatched = left.join(matched.select("__lid"), on="__lid", how="left_anti")
    return matched.unionByName(unmatched, allowMissingColumns=True).drop("__lid")


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval-INTERVAL overlap join: every (left, right) pair with
    equal ``on`` keys whose closed intervals intersect
    (``l.start <= r.end AND r.start <= l.end``) — the primitive behind
    session-overlap, concurrent-validity, and availability-window
    questions, where both sides are ranges (the existing
    :func:`interval_join` is point-in-interval).

    Scale design: both sides explode onto the same fixed-width bucket
    grid (one hash equi-join on ``(keys, bucket)``, one shuffle per
    side, never a nested loop). An overlapping pair shares every
    bucket its intersection covers, so a dedup guard is needed — and
    an aggregation-free one exists: the pair is KEPT only in the
    bucket containing ``greatest(l.start, r.start)``, the
    intersection's first instant, which both sides' ranges cover by
    definition. Each surviving pair therefore appears exactly once,
    with no distinct() pass over the (potentially large) pair set.
    Right columns clashing with left names are dropped except the
    bounds, which keep a ``_right`` suffix when they clash.
    """
    on = list(on or [])
    b = F.lit(int(bucket_seconds))
    rb, s_name, e_name = _dedup_right(left, right, right_start, right_end, on)
    lb = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(left_start)) / b),
                F.floor(F.unix_timestamp(F.col(left_end)) / b),
            )
        ),
    )
    rb = rb.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(s_name)) / b),
                F.floor(F.unix_timestamp(F.col(e_name)) / b),
            )
        ),
    )
    overlaps = (F.col(left_start) <= F.col(e_name)) & (
        F.col(s_name) <= F.col(left_end)
    )
    meet_once = F.col("__b") == F.floor(
        F.unix_timestamp(F.greatest(F.col(left_start), F.col(s_name))) / b
    )
    return (
        lb.join(rb, on=on + ["__b"], how="inner")
        .filter(overlaps & meet_once)
        .drop("__b")
    )
