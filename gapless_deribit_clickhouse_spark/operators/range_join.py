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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to every right interval with
    ``start_col <= left_ts <= end_col`` (and equal ``on`` keys).

    ``how`` may be ``inner`` or ``left`` (unmatched left rows kept with
    NULL right columns). Right columns clashing with left names are
    dropped except the interval bounds, which are kept under a
    ``_right`` suffix when their names clash (keeping the bare name
    would make every reference to them ambiguous).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = list(on or [])

    b = F.lit(int(bucket_seconds))
    lb = left.withColumn("__b", F.floor(F.unix_timestamp(F.col(left_ts)) / b))
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
