"""Dedup-at-read: ReplacingMergeTree/FINAL semantics.

The reference's fact table is a ClickHouse ReplacingMergeTree keyed by
its ORDER BY tuple ending in ``trade_id``; readers append ``FINAL`` to
collapse duplicate versions (``/root/reference/schema/clickhouse/
options_trades.yaml:26,30``; ``api.py:167-171``). ClickHouse keeps an
arbitrary "last" row; we pin a deterministic winner (SURVEY §7.3.3):
max of the version columns, with the full remaining row as final
tiebreak so results are stable under shuffle.

Scale note: this is a shuffle on the key columns. At 100 TB you do NOT
run this per query — you maintain a compacted table (the streaming
ingest path does exactly that via ``dropDuplicatesWithinWatermark``)
and the read-side dedup view is the escape hatch (`use_final=True`
parity). The window variant below lets AQE handle skew, and because
the key usually contains the partition column (e.g. ``underlying``)
the shuffle is partition-pruned first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[str],
) -> DataFrame:
    """Keep exactly one row per ``keys``: the one with the greatest
    ``version_cols`` tuple (nulls last, then arbitrary-but-deterministic
    by remaining columns).

    Oracle SQL shape::

        SELECT * EXCLUDE rn FROM (
          SELECT *, row_number() OVER (
            PARTITION BY <keys> ORDER BY <version_cols> DESC, <rest>) rn
          FROM t) WHERE rn = 1
    """
    order = [F.col(c).desc_nulls_last() for c in version_cols]
    # deterministic tiebreak on everything else
    rest = [c for c in df.columns if c not in set(keys) | set(version_cols)]
    order += [F.col(c).desc_nulls_last() for c in rest]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
