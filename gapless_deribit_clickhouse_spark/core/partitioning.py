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


def ensure_parallelism(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Round-robin repartition up to ``defaultParallelism * multiplier``
    iff the plan currently has fewer partitions; metadata-only check,
    no job is triggered."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if target <= 0 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
