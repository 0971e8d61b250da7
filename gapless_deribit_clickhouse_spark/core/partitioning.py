"""Partition-count guards.

Expensive per-row expression trees (shingling, hashing, feature
extraction) inherit the scan's split count. A small file arrives as
ONE split, so the whole pipeline runs in one task regardless of
cluster size — invisible at 100 TB (plenty of splits), pathological
on dimension-sized inputs. ``ensure_parallelism`` is a no-op whenever
the input already has enough splits, so it is safe to leave in place
at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_expansion(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Unconditional round-robin repartition to core count, for
    stages whose OUTPUT explodes past their input (in-bucket pair
    generation, window explodes). AQE sizes a post-shuffle stage by
    the exchange's input bytes, so an expansion stage gets coalesced
    to a handful of tasks no matter how much work it emits (guide
    §2.5). Unlike :func:`ensure_parallelism` this never inspects
    ``df.rdd`` — on a post-shuffle plan that inspection would force
    the upstream query stages to execute during CONSTRUCTION under
    AQE. The cost is one exchange of the (narrow) pre-expansion rows;
    the target is executor-core count, which is what saturation
    needs at any scale."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if target <= 0:
        return df
    return df.repartition(target)


def ensure_parallelism(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Round-robin repartition up to ``defaultParallelism * multiplier``
    iff the plan currently has fewer partitions; metadata-only check,
    no job is triggered."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if target <= 0 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
