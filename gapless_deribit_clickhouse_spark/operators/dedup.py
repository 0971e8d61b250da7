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

import shutil
from collections.abc import Mapping, Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
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


def compact_table(
    spark: SparkSession,
    path: str,
    keys: Sequence[str],
    version_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    only_partitions: Sequence[Mapping[str, str]] | None = None,
    sort_within_partitions: Sequence[str] = (),
) -> dict:
    """ReplacingMergeTree background-merge parity: the maintenance job
    that makes dedup-at-read unnecessary (ClickHouse ``OPTIMIZE TABLE
    ... [PARTITION p] FINAL``; the reference relies on the implicit
    background merge, ``options_trades.yaml:26`` + ``api.py:121-124``).

    Rewrites the parquet table at ``path`` so each ``keys`` tuple keeps
    only its :func:`dedup_latest` winner. Plain parquet has no
    transactional overwrite (and Spark refuses to overwrite a path it
    is reading), so this stages the compacted partitions next to the
    table and swaps partition directories in — the same
    rewrite-then-rename a Delta/Iceberg ``OPTIMIZE`` performs, minus
    the transaction log.

    Scale design: pass ``only_partitions`` (list of
    ``{partition_col: value}`` selectors, CH ``OPTIMIZE PARTITION``
    parity) to touch only hot partitions — cost is proportional to the
    partitions rewritten, never the table. The dedup shuffle happens
    within the selected slice, and when ``keys`` contain the partition
    columns (they do for ``options_trades``: the ORDER-BY tuple starts
    with ``underlying``) no row crosses a partition boundary.
    """
    root = Path(path)
    df = spark.read.parquet(path)
    if only_partitions:
        sel = None
        for p in only_partitions:
            one = None
            for c, v in p.items():
                cond = F.col(c) == v
                one = cond if one is None else one & cond
            sel = one if sel is None else sel | one
        df = df.filter(sel)
    rows_before = df.count()
    out = dedup_latest(df, keys, version_cols)
    if sort_within_partitions:
        out = out.sortWithinPartitions(*sort_within_partitions)

    staging = root.with_name(root.name + "__compacting")
    if staging.exists():
        shutil.rmtree(staging)
    writer = out.write.mode("overwrite").format("parquet")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(str(staging))

    swapped = []
    if partition_cols:
        # leaf partition dirs, relative to the staging root
        leaves = {
            f.parent.relative_to(staging)
            for f in staging.rglob("*.parquet")
        }
        # aside area OUTSIDE the table root (an __old dir inside it
        # would be discovered as a bogus partition value on a crashed
        # run's next read)
        aside_root = root.with_name(root.name + "__old")
        if aside_root.exists():
            shutil.rmtree(aside_root)
        for rel in sorted(leaves):
            target = root / rel
            # rename the live partition ASIDE before moving the
            # replacement in: deleting it first opens a crash window
            # where the only surviving copy sits in the staging dir —
            # which a recovery rerun would rmtree. With rename-aside,
            # every instant has either the old or the new partition
            # complete under the table root.
            old = aside_root / rel
            had_old = target.exists()
            if had_old:
                old.parent.mkdir(parents=True, exist_ok=True)
                target.rename(old)
            target.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(staging / rel), str(target))
            if had_old:
                shutil.rmtree(old)
            swapped.append(str(rel))
        shutil.rmtree(aside_root, ignore_errors=True)
    else:
        old = root.with_name(root.name + "__old")
        if old.exists():
            shutil.rmtree(old)
        old.mkdir()
        for f in root.glob("*.parquet"):
            f.rename(old / f.name)
        for f in staging.glob("*.parquet"):
            shutil.move(str(f), str(root / f.name))
        shutil.rmtree(old)
        swapped.append(".")
    shutil.rmtree(staging, ignore_errors=True)

    # one real count on the rewritten slice keeps the stats honest
    compacted = spark.read.parquet(path)
    if only_partitions:
        compacted = compacted.filter(sel)
    rows_after = compacted.count()
    return {
        "rows_before": rows_before,
        "rows_after": rows_after,
        "removed": rows_before - rows_after,
        "partitions": swapped,
    }


def collapse_by_sign(
    df: DataFrame,
    keys: Sequence[str],
    sign_col: str,
    version_cols: Sequence[str],
) -> DataFrame:
    """(Versioned)CollapsingMergeTree read parity: each key's rows are
    a ledger of state rows (+1) and cancel rows (-1); a fully merged
    read keeps one row per key whose net sign is positive — the
    latest-version state row — and drops keys whose inserts and
    cancels annihilate (ClickHouse ``CollapsingMergeTree(sign)`` /
    ``VersionedCollapsingMergeTree(sign, version)``; sibling of the
    ReplacingMergeTree parity in :func:`dedup_latest`).

    One shuffle on ``keys``: the net sign is an unordered window sum
    and the winning row a row_number over the version order, both over
    the same partitioning — Spark plans a single exchange. Output: the
    latest row's full columns plus ``net`` (the surviving multiplicity,
    ClickHouse's "keep the last ``sum(sign)`` rows" generalized to the
    common keep-one case).
    """
    wp = Window.partitionBy(*keys)
    order = [F.col(c).desc_nulls_last() for c in version_cols]
    rest = [
        c
        for c in df.columns
        if c not in set(keys) | set(version_cols) | {sign_col}
    ]
    order += [F.col(c).desc_nulls_last() for c in rest]
    return (
        df.withColumn("net", F.sum(sign_col).over(wp))
        .withColumn("__rn", F.row_number().over(wp.orderBy(*order)))
        .filter((F.col("__rn") == 1) & (F.col("net") > 0))
        .drop("__rn", sign_col)
    )
