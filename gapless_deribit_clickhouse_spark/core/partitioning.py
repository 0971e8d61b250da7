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
    """Unconditional round-robin repartition for stages whose OUTPUT
    explodes past their input (in-bucket pair generation, window
    explodes). AQE sizes a post-shuffle stage by the exchange's input
    bytes, so an expansion stage gets coalesced to a handful of tasks
    no matter how much work it emits (guide §2.5). Unlike
    :func:`ensure_parallelism` this never inspects ``df.rdd`` — on a
    post-shuffle plan that inspection would force the upstream query
    stages to execute during CONSTRUCTION under AQE. The cost is one
    exchange of the (narrow) pre-expansion rows.

    The target is a FLOOR of executor-core count and the session's
    configured shuffle parallelism (ADVICE r12): pinning to
    ``defaultParallelism`` alone could repartition a wider input DOWN
    on a cluster whose shuffle partitioning exceeds its core count,
    shrinking parallelism and fattening partitions. Locally both
    values are the core count, so the bench shape is unchanged."""
    spark = df.sparkSession
    sc = spark.sparkContext
    try:
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        shuffle_parts = 0
    target = max(sc.defaultParallelism * multiplier, shuffle_parts)
    if target <= 0:
        return df
    return df.repartition(target)


# analyzed-plan node names through which ``df.rdd`` stays a pure
# metadata conversion: no exchange can appear below them, so AQE has
# no query stage to materialize at construction time. Anything else
# (Join/Aggregate/Window/Sort/Repartition/...) plans an exchange, and
# inspecting ``df.rdd`` there would EXECUTE the upstream stages.
_SCAN_SHAPED_NODES = frozenset(
    {
        "Project",
        "Filter",
        "LogicalRelation",
        "LogicalRDD",
        "LocalRelation",
        "SubqueryAlias",
        "View",
        "Generate",
        "Range",
    }
)


def _scan_shaped(df: DataFrame, max_nodes: int = 32) -> bool:
    """True iff the analyzed plan is a narrow chain over a leaf — the
    only shape where ``df.rdd.getNumPartitions()`` is guaranteed
    job-free under AQE. Bounded py4j walk, no execution (ADVICE r12:
    exported operators may receive arbitrary post-shuffle frames)."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        seen = 0
        while stack:
            node = stack.pop()
            seen += 1
            if seen > max_nodes:
                return False
            if node.getClass().getSimpleName() not in _SCAN_SHAPED_NODES:
                return False
            for i in range(node.children().size()):
                stack.append(node.children().apply(i))
        return True
    except Exception:
        return False


def ensure_parallelism(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Round-robin repartition up to ``defaultParallelism * multiplier``
    iff the plan currently has fewer partitions; metadata-only check,
    no job is triggered. On inputs that are not scan-shaped the check
    itself would execute upstream query stages under AQE, so the
    helper is a no-op there — such plans are post-shuffle and already
    carry the session's shuffle parallelism."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiplier
    if target <= 0 or not _scan_shaped(df):
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
