"""Public query API: ``fetch_trades`` and capability probe.

Reference: ``/root/reference/src/gapless_deribit_clickhouse/api.py``
(validation :29-64, timestamp normalization :67-97, predicates
:136-163, FINAL/ORDER/LIMIT :164-175) and ``probe.py:47-160``.

The SQL-template IR disappears: validation happens fail-fast in
Python, then the query is a DataFrame plan —
``table -> [dedup] -> filters -> orderBy desc -> limit`` — that
Catalyst pushes into the parquet scan (predicate pushdown + partition
pruning on ``underlying``/month).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.exceptions import QueryError
from gapless_deribit_clickhouse_spark.operators.dedup import dedup_latest


def _validate_fetch_params(
    start: str | None, end: str | None, limit: int | None
) -> None:
    """Fail-fast parameter contract (reference api.py:29-64)."""
    if start is None and end is None and limit is None:
        raise QueryError("provide at least one of start, end, limit")
    for name, v in (("start", start), ("end", end)):
        if v is not None and (not isinstance(v, str) or not v.strip()):
            raise QueryError(f"{name} must be a non-empty string")
    if limit is not None and limit <= 0:
        raise QueryError("limit must be positive")
    if start and end and _parse_ts(start) > _parse_ts(end):
        raise QueryError("start must be <= end")


def _parse_ts(value: str, end_side: bool = False) -> datetime:
    """Timestamp normalization (reference api.py:67-97): a date-only
    ``end`` expands to next-day midnight so ``timestamp < end`` is
    day-inclusive; ms-precision strings pass through."""
    value = value.strip()
    for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            dt = datetime.strptime(value, fmt)
            if fmt == "%Y-%m-%d" and end_side:
                dt += timedelta(days=1)
            return dt
        except ValueError:
            continue
    raise QueryError(f"unparseable timestamp {value!r}")


def fetch_trades(
    trades: DataFrame,
    underlying: str | None = None,
    start: str | None = None,
    end: str | None = None,
    option_type: str | None = None,
    expiry: str | None = None,
    strike: float | None = None,
    limit: int | None = None,
    use_final: bool = True,
) -> DataFrame:
    """Point/range query with the reference's exact predicate set
    (F1-F4, W5, O1). ``use_final`` toggles dedup-at-read (FINAL
    parity, reference api.py:121-124)."""
    _validate_fetch_params(start, end, limit)
    df = trades
    if use_final:
        df = dedup_latest(df, keys=["trade_id"], version_cols=["timestamp"])
    if underlying is not None:
        df = df.filter(F.col("underlying") == underlying)
    if option_type is not None:
        df = df.filter(F.col("option_type") == option_type)
    if expiry is not None:
        df = df.filter(F.col("expiry") == F.lit(expiry).cast("date"))
    if strike is not None:
        df = df.filter(F.col("strike") == float(strike))
    if start is not None:
        df = df.filter(F.col("timestamp") >= F.lit(_parse_ts(start)))
    if end is not None:
        df = df.filter(F.col("timestamp") < F.lit(_parse_ts(end, end_side=True)))
    df = df.orderBy(F.col("timestamp").desc(), F.col("trade_id").desc())
    if limit is not None:
        df = df.limit(limit)
    return df


def describe() -> dict:
    """Capability probe (reference probe.py:47-160)."""
    from gapless_deribit_clickhouse_spark import __version__

    return {
        "engine": "gapless_deribit_clickhouse_spark",
        "version": __version__,
        "execution": "pyspark",
        "capabilities": {
            "query": ["fetch_trades", "dedup_at_read", "time_range", "top_k"],
            "features": [
                "resample_iv", "iv_percentile", "iv_rank", "pcr_by_tenor",
                "pcr_aggregate", "term_structure", "dte_bucket_agg",
                "dte_distribution", "aggregate_by_moneyness",
                "select_contracts", "enrich_with_spot", "greeks", "egarch",
            ],
            "validation": ["quality_metrics", "coverage_by_group", "gap_analysis"],
            "ingest": ["paginated_backfill", "structured_streaming"],
            "pipelines": [
                "exact_dedup", "minhash_lsh", "simhash", "ngram_jaccard",
                "cosine_topk", "ivf_topk", "embedding_near_dup",
                "lang_id", "quality_score", "token_count", "fingerprint",
            ],
        },
        "data_sources": ["parquet", "parquet_stream"],
    }
