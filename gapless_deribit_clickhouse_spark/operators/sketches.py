"""Mergeable-summary sketches: frequent-keys (Misra-Gries + exact
verification), mergeable-HLL distinct counting, and quantile-sketch
rollups.

ClickHouse exposes an approximate-aggregate tier the reference's users
lean on for interactive cardinality work — ``topK(k)``,
``uniq``/``uniqHLL12``/``uniqState`` + ``uniqMerge``, and
``quantileTDigest``. The reference's quality summaries aggregate with
``uniqExact`` (reference validation/data_quality.py:33,73), which is
exact-but-memory-proportional; ClickHouse's documented scale guidance
is to swap in the ``uniq``/``uniqState`` sketch family once
cardinality outgrows memory, so an engine claiming the same query
surface at 100 TB needs the sketch tier too. This module is the
Spark-first counterpart:

- ``frequent_keys_exact``: ClickHouse ``topK``'s job (heavy hitters)
  done the way an exact engine should at 100 TB: a bounded-memory
  Misra-Gries candidate pass (mergeable summaries, Agarwal et al.,
  PODS'12) followed by an EXACT count of the candidates only. Output
  is provably identical to the brute-force ``GROUP BY ... HAVING
  count >= support * total`` — the sketch only bounds WHERE counting
  happens, never what is returned — so the operator carries a full
  DuckDB oracle instead of topK's "usually right" contract.
- ``approx_distinct_rollup``: ``uniq*`` parity. Exact
  ``count_distinct`` (the correctness anchor) alongside Spark's
  HyperLogLog++ ``approx_count_distinct`` AND a split->sketch->merge
  round trip through the DataSketches HLL aggregates
  (``hll_sketch_agg`` per batch, ``hll_union_agg`` to merge) — the
  AggregatingMergeTree ``uniqState``/``uniqMerge`` shape where
  partial states, not history, are what a 100 TB rollup stores.
- ``quantile_rollup_sketch``: ``quantileTDigest`` parity. Exact
  interpolated percentiles next to ``percentile_approx`` (Spark's
  mergeable GK-style quantile sketch) with the observed error.

Scale notes. Misra-Gries with m counters guarantees every key whose
TOTAL frequency exceeds N/(m+1) survives the per-partition pass
(pigeonhole over partitions: a key missed everywhere has per-partition
frequency <= n_p/(m+1), which sums to <= N/(m+1)); the batched merge
step (subtract the (m+1)-th largest, drop non-positives) is the
mergeable-summaries reduction with the same error bound. With
``m >= margin * den/num`` the candidate set provably contains every
key at support ``num/den``, so the exact verification pass makes the
final answer sketch-free. Candidate volume is bounded by
``partitions * m`` rows — kilobytes — so the verification join
broadcasts, and the only corpus-scale shuffle is the groupBy over
candidate-matching rows (a vanishing fraction of the stream at any
meaningful support).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from gapless_deribit_clickhouse_spark.core.barrier import BARRIER_STORAGE


def _mg_partition(m: int, key: str):
    """Per-partition Misra-Gries summarizer for mapInPandas: maintains
    at most ``m`` counters; per Arrow batch, merges the batch's value
    counts then applies the mergeable-summaries reduction (subtract the
    (m+1)-th largest count from all, keep positives)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            vc = pdf[key].value_counts()
            for k, c in vc.items():
                counts[k] = counts.get(k, 0) + int(c)
            if len(counts) > m:
                # (m+1)-th largest; subtracting it keeps <= m positive
                thresh = sorted(counts.values(), reverse=True)[m]
                counts = {k: c - thresh for k, c in counts.items() if c > thresh}
        # candidate rows (_cnt null) + one partition-total row (key
        # null): the total rides the same corpus pass instead of
        # costing a second scan
        keys = pd.Series(list(counts.keys()) + [None], dtype="object")
        cnt = pd.Series([None] * len(counts) + [n_rows], dtype="Int64")
        yield pd.DataFrame({key: keys, "_cnt": cnt})

    return run


def frequent_keys_exact(
    df: DataFrame,
    key_col: str,
    support_num: int,
    support_den: int,
    counters: int | None = None,
) -> DataFrame:
    """All keys with frequency >= (support_num/support_den) * N,
    with their EXACT counts — Misra-Gries candidates, exact verify.

    The support threshold is exact integer arithmetic
    (``count * den >= num * N``) so the cut is bit-identical across
    engines — no float boundary at ``s * N``.
    """
    if support_num <= 0 or support_den <= 0:
        raise ValueError("support must be a positive rational num/den")
    if counters is None:
        # 4x margin over the den/num floor that makes the MG guarantee
        # cover the support threshold (m + 1 >= den/num)
        counters = 4 * math.ceil(support_den / support_num)
    # null keys are excluded from BOTH the summary pass and the total
    # N (ADVICE r6: value_counts drops nulls while len(pdf) counted
    # them, inflating the support denominator when the key column is
    # nullable — keys at the threshold could be wrongly excluded; and
    # a null key can never survive the equi-join verify anyway, so
    # "frequency >= support * N" is defined over non-null rows). The
    # mapInPandas output schema carries the INPUT key type, not a
    # hardcoded string.
    key_type = df.schema[key_col].dataType.simpleString()
    # one corpus pass yields BOTH the candidates and the total row
    # count (per-partition total rows with a null key); the lazy
    # localCheckpoint is the barrier that stops the candidate/total
    # diamond from re-running the scan per consumer
    summary = (
        df.select(key_col)
        .filter(F.col(key_col).isNotNull())
        .mapInPandas(
            _mg_partition(counters, key_col),
            schema=f"{key_col} {key_type}, _cnt long",
        )
        .localCheckpoint(eager=False, storageLevel=BARRIER_STORAGE)
    )
    cands = summary.filter(F.col("_cnt").isNull()).select(key_col).distinct()
    total = summary.agg(F.sum("_cnt").alias("_total"))
    return (
        df.join(F.broadcast(cands), key_col)
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") * F.lit(support_den) >= F.lit(support_num) * F.col("_total"))
        .select(key_col, "freq")
        .orderBy(F.desc("freq"), F.asc(key_col))
    )
