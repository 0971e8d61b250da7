"""Skew-tolerant two-phase aggregation (salting).

AQE's skew handling covers sort-merge JOINS, but a groupBy whose key
distribution is pathological (one underlying with 99% of trades, one
Zipf-head token) still lands the hot key's entire partial-agg output
on ONE reducer. For algebraic aggregates the fix is classic salting:
aggregate on (key, salt) first — spreading the hot key over
``n_salts`` reducers — then combine the per-salt partials in a second,
tiny aggregation keyed by the original key.

Note Spark's map-side partial aggregation already absorbs most skew
(each map task emits one row per key); salting matters when the
DISTINCT-key-per-partition count is low but per-key row count is
huge, or when the partial row itself is heavy (e.g. large collect
sets). The API keeps the same result contract as a plain groupBy, so
tests pin equivalence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial expr builder, final expr builder) per supported aggregate;
# partial runs per (key, salt), final recombines per key.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """``aggs`` maps output column -> (op, input column) with op in
    {sum, count, min, max} (the algebraic ops that re-combine; avg =
    sum/count composed by the caller). Result equals
    ``df.groupBy(keys).agg(...)`` row-for-row."""
    for name, (op, _) in aggs.items():
        if op not in _ALGEBRAIC:
            raise ValueError(f"{name}: op {op!r} is not algebraic-salt-safe")
    # partition id as salt: rows of a hot key living in different map
    # tasks land on different reducers; rows in the SAME map task are
    # already collapsed by map-side partial aggregation
    salt = F.spark_partition_id() % n_salts
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                _ALGEBRAIC[op][0](F.col(src)).alias(f"__p_{name}")
                for name, (op, src) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[op][1](F.col(f"__p_{name}")).alias(name)
            for name, (op, src) in aggs.items()
        ]
    )
