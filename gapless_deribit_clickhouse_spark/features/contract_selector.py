"""Contract-selection strategies.

Reference: ``/root/reference/src/gapless_deribit_clickhouse/features/
contract_selector.py`` — nested SQL-template CTEs:
  all | front_month (argMin per 15-min) [+ atm filter] [+ liquidity].
Here each strategy is a DataFrame -> DataFrame combinator; composition
is function composition and Catalyst fuses the stack into one plan.

Scale notes:
- front_month: ``min_by(struct(payload), (dte, trade_id))`` hash
  aggregate (the reference's argMin-over-ROW_NUMBER choice,
  contract_selector.py:10-15) — one shuffle, no sort.
- liquidity (J3): the reference inner-joins a daily-volume CTE; we use
  a window sum over (instrument, day), which Spark executes as ONE
  shuffle on the same key the join would need — strictly fewer
  exchanges, no broadcast dependency, skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.exceptions import QueryError
from gapless_deribit_clickhouse_spark.features.config import DEFAULT, FeatureConfig
from gapless_deribit_clickhouse_spark.functions.timeutils import dte_days, time_bucket
from gapless_deribit_clickhouse_spark.operators.topk import top1_per_group

STRATEGIES = ("all", "front_month", "front_month_atm", "front_month_atm_liquid")


def front_month(
    df: DataFrame,
    ts_col: str = "timestamp",
    expiry_col: str = "expiry",
    underlying_col: str = "underlying",
    id_col: str = "trade_id",
    config: FeatureConfig = DEFAULT,
) -> DataFrame:
    """Per (window, underlying) keep the whole row of the trade with
    minimum DTE (reference contract_selector.py:34-62), deterministic
    via id tiebreak."""
    payload = [c for c in df.columns]
    dte = dte_days(F.col(ts_col), F.col(expiry_col)).alias("__dte")
    with_bucket = df.withColumn(
        "__w", time_bucket(F.col(ts_col), config.resample_seconds)
    ).withColumn("__dte", dte)
    out = top1_per_group(
        with_bucket,
        group_cols=["__w", underlying_col],
        order_col=F.struct(F.col("__dte"), F.col(id_col)),
        payload_cols=[c for c in payload if c != underlying_col],
    )
    return out.drop("__w")


def atm_filter(
    df: DataFrame,
    strike_col: str = "strike",
    spot_col: str = "index_price",
    config: FeatureConfig = DEFAULT,
) -> DataFrame:
    """strike/spot within ±atm_width (reference contract_selector.py:64-72)."""
    ratio = F.col(strike_col) / F.col(spot_col)
    return df.filter(ratio.between(1 - config.atm_width, 1 + config.atm_width))


def liquidity_filter(
    df: DataFrame,
    ts_col: str = "timestamp",
    instrument_col: str = "instrument_name",
    amount_col: str = "amount",
    config: FeatureConfig = DEFAULT,
) -> DataFrame:
    """Keep rows of (instrument, day) groups whose daily volume >=
    min_volume (reference contract_selector.py:74-93) — window sum
    instead of the reference's self-join."""
    w = Window.partitionBy(F.col(instrument_col), F.to_date(F.col(ts_col)))
    return (
        df.withColumn("__daily_volume", F.sum(amount_col).over(w))
        .filter(F.col("__daily_volume") >= config.min_volume)
        .drop("__daily_volume")
    )


def select_contracts(
    df: DataFrame,
    strategy: str = "front_month_atm_liquid",
    config: FeatureConfig = DEFAULT,
    **cols: str,
) -> DataFrame:
    """Strategy dispatcher (reference contract_selector.py:117-191)."""
    if strategy not in STRATEGIES:
        raise QueryError(f"unknown strategy {strategy!r}; options: {STRATEGIES}")
    out = df
    if strategy != "all":
        out = front_month(out, config=config, **_pick(cols, "ts_col", "expiry_col", "underlying_col", "id_col"))
    if strategy in ("front_month_atm", "front_month_atm_liquid"):
        out = atm_filter(out, config=config, **_pick(cols, "strike_col", "spot_col"))
    if strategy == "front_month_atm_liquid":
        out = liquidity_filter(out, config=config, **_pick(cols, "ts_col", "instrument_col", "amount_col"))
    return out


def _pick(d: dict[str, str], *keys: str) -> dict[str, str]:
    return {k: d[k] for k in keys if k in d}


def get_contract_stats(
    df: DataFrame,
    config: FeatureConfig = DEFAULT,
    **cols: str,
) -> dict[str, int]:
    """Row count per selection strategy (reference
    contract_selector.py:263-302, ``get_contract_stats``) — shows the
    funnel effect of each filter stage. Four counts over the same
    (already filtered/pruned) input; each count is a partial-agg +
    single-row exchange, so the dominant cost is the shared scan."""
    return {
        strategy: select_contracts(df, strategy=strategy, config=config, **cols).count()
        for strategy in STRATEGIES
    }
