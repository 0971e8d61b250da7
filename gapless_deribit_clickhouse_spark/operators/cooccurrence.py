"""Co-occurrence / association mining over (group, item) pairs.

The market-basket shape: which items appear together in the same
group (user, session, document), how often, and is that more or less
than independence predicts. ClickHouse pipelines express this as a
self-join over a deduplicated (group, item) projection; the reference
has the per-group event machinery (journeys, funnels) but no pairwise
association surface — this extends that family (SURVEY §2.9 events
tier).

Scale design: the self-join key is the GROUP id, and each side is the
DISTINCT (group, item) projection — so per-group work is bounded by
the item-catalog size, never by the raw event count. Item counts and
pair counts are plain map-side-combinable aggregations; the item
catalog is small by construction (categorical), so the two count
joins broadcast. The only event-scale stage is the initial distinct
(one shuffle on (group, item)). Skew note: a group containing every
item produces |catalog|^2/2 pair rows, still catalog-bounded, not
data-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from gapless_deribit_clickhouse_spark.core.barrier import BARRIER_STORAGE


def cooccurrence_stats(
    df: DataFrame,
    group_col: str,
    item_col: str,
) -> DataFrame:
    """For every unordered pair of distinct items, the number of
    groups containing both, plus Jaccard overlap and lift.

    Returns columns ``item_a, item_b, n_a, n_b, n_both, jaccard,
    lift`` with ``item_a < item_b``. All counts are exact integers;
    the two ratios are single double divisions at the very end, so
    the values are reproducible bit-for-bit across engines:

    - ``jaccard = n_both / (n_a + n_b - n_both)``
    - ``lift = (n_both * n_groups) / (n_a * n_b)``
    """
    # The distinct projection feeds FOUR consumers (both self-join
    # sides, item counts, group count) — a diamond that would rescan
    # the event table per consumer; the lazy localCheckpoint
    # materializes it once (it is catalog x groups rows, tiny next to
    # the raw events).
    g = (
        df.select(F.col(group_col).alias("g"), F.col(item_col).alias("item"))
        .distinct()
        .localCheckpoint(eager=False, storageLevel=BARRIER_STORAGE)
    )
    item_counts = g.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    n_groups = g.select(
        F.count_distinct("g").alias("n_groups")
    )
    pairs = (
        g.alias("a")
        .join(g.alias("b"), on="g")
        .filter(F.col("a.item") < F.col("b.item"))
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(item_counts.withColumnRenamed("n", "n_a")),
            F.col("item_a") == F.col("item"),
        )
        .drop("item")
        .join(
            F.broadcast(item_counts.withColumnRenamed("n", "n_b")),
            F.col("item_b") == F.col("item"),
        )
        .drop("item")
        .join(F.broadcast(n_groups))
        .select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_both",
            (
                F.col("n_both") / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            ).alias("jaccard"),
            (
                (F.col("n_both") * F.col("n_groups"))
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )
