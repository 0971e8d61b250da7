"""API contract, dedup semantics, instrument parser, validation layer."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.api import describe, fetch_trades
from gapless_deribit_clickhouse_spark.exceptions import (
    InstrumentParseError,
    QueryError,
)
from gapless_deribit_clickhouse_spark.functions.instrument import (
    Instrument,
    format_instrument_col,
    is_valid_instrument,
    parse_instrument,
    with_parsed_instrument,
)
from gapless_deribit_clickhouse_spark.operators.dedup import dedup_latest
from gapless_deribit_clickhouse_spark.validation import (
    coverage_by_group,
    gap_analysis,
    quality_metrics,
)


# --- fetch_trades parameter contract (reference api.py:29-64) ---
def test_fetch_requires_a_bound(trades_df):
    with pytest.raises(QueryError):
        fetch_trades(trades_df)
    with pytest.raises(QueryError):
        fetch_trades(trades_df, start="  ")
    with pytest.raises(QueryError):
        fetch_trades(trades_df, limit=0)
    with pytest.raises(QueryError):
        fetch_trades(trades_df, start="2024-12-02", end="2024-12-01")


def test_fetch_desc_order_and_limit(trades_df):
    out = fetch_trades(trades_df, underlying="BTC", limit=10).toPandas()
    assert len(out) == 10
    ts = out.timestamp.tolist()
    assert ts == sorted(ts, reverse=True)


def test_fetch_day_inclusive_end(trades_df):
    # date-only end expands to next midnight (reference api.py:67-97)
    out = fetch_trades(trades_df, start="2024-12-01", end="2024-12-01")
    assert out.count() == trades_df.count()  # all fixture trades are on 12-01


def test_fetch_equality_predicates(trades_df):
    out = fetch_trades(trades_df, option_type="P", start="2024-12-01").toPandas()
    assert (out.option_type == "P").all()


def test_dedup_keeps_latest(spark):
    rows = [
        ("t1", dt.datetime(2024, 1, 1, 10), 1.0),
        ("t1", dt.datetime(2024, 1, 1, 11), 2.0),
        ("t2", dt.datetime(2024, 1, 1, 9), 3.0),
    ]
    df = spark.createDataFrame(rows, "trade_id string, timestamp timestamp, price double")
    out = dedup_latest(df, ["trade_id"], ["timestamp"]).toPandas().set_index("trade_id")
    assert len(out) == 2
    assert out.loc["t1"].price == 2.0


def test_compact_table_partition_selective(spark, tmp_path):
    from gapless_deribit_clickhouse_spark.operators.dedup import compact_table

    path = str(tmp_path / "fact")
    rows = [
        # month 202401: t1 duplicated (keep ts=11h / price=2.0)
        ("t1", dt.datetime(2024, 1, 1, 10), 1.0, "202401"),
        ("t1", dt.datetime(2024, 1, 1, 11), 2.0, "202401"),
        ("t2", dt.datetime(2024, 1, 2, 9), 3.0, "202401"),
        # month 202402: t3 duplicated — left alone by the selective pass
        ("t3", dt.datetime(2024, 2, 1, 10), 4.0, "202402"),
        ("t3", dt.datetime(2024, 2, 1, 12), 5.0, "202402"),
    ]
    df = spark.createDataFrame(
        rows, "trade_id string, timestamp timestamp, price double, trade_month string"
    )
    df.write.partitionBy("trade_month").parquet(path)

    stats = compact_table(
        spark, path, keys=["trade_id"], version_cols=["timestamp"],
        partition_cols=["trade_month"],
        only_partitions=[{"trade_month": "202401"}],
        sort_within_partitions=["timestamp"],
    )
    assert stats["removed"] == 1 and stats["rows_after"] == 2
    back = spark.read.parquet(path).toPandas()
    assert len(back) == 4  # 202402 dup untouched
    assert back[back.trade_id == "t1"].price.tolist() == [2.0]

    stats = compact_table(
        spark, path, keys=["trade_id"], version_cols=["timestamp"],
        partition_cols=["trade_month"],
    )
    assert stats["removed"] == 1
    back = spark.read.parquet(path).toPandas().set_index("trade_id")
    assert len(back) == 3
    assert back.loc["t3"].price == 5.0


def test_compact_table_unpartitioned(spark, tmp_path):
    from gapless_deribit_clickhouse_spark.operators.dedup import compact_table

    path = str(tmp_path / "flat")
    rows = [("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 3.0)]
    spark.createDataFrame(rows, "k string, v int, x double").write.parquet(path)
    stats = compact_table(spark, path, keys=["k"], version_cols=["v"])
    assert stats == {
        "rows_before": 3, "rows_after": 2, "removed": 1, "partitions": ["."],
    }
    got = spark.read.parquet(path).toPandas().set_index("k")
    assert got.loc["a"].x == 2.0


def test_use_final_flag(spark):
    rows = [("t1", dt.datetime(2024, 1, 1, 10), 1.0), ("t1", dt.datetime(2024, 1, 1, 11), 2.0)]
    df = spark.createDataFrame(rows, "trade_id string, timestamp timestamp, price double")
    df = (
        df.withColumn("underlying", F.lit("BTC"))
        .withColumn("option_type", F.lit("C"))
        .withColumn("expiry", F.lit("2024-02-01").cast("date"))
        .withColumn("strike", F.lit(1.0))
    )
    assert fetch_trades(df, limit=10, use_final=True).count() == 1
    assert fetch_trades(df, limit=10, use_final=False).count() == 2


# --- instrument parser (reference tests/test_instrument_parser.py) ---
def test_parse_roundtrip_all_months():
    for i, mon in enumerate(
        ["JAN", "FEB", "MAR", "APR", "MAY", "JUN", "JUL", "AUG", "SEP", "OCT", "NOV", "DEC"], 1
    ):
        name = f"BTC-7{mon}25-100000-C"
        inst = parse_instrument(name)
        assert inst.expiry.month == i and inst.expiry.day == 7
        assert inst.format() == name


def test_parse_single_and_double_digit_days():
    assert parse_instrument("ETH-1JAN25-3000-P").expiry.day == 1
    assert parse_instrument("ETH-27DEC24-3000-C").expiry.day == 27


def test_parse_invalid_inputs():
    for bad in ("", "BTC", "BTC-99XYZ25-1-C", "BTC-27DEC24-1000-X", "btc-27dec24-1000-c"):
        assert not is_valid_instrument(bad)
        with pytest.raises(InstrumentParseError):
            parse_instrument(bad)


def test_column_parser_matches_scalar(spark):
    names = ["BTC-27DEC24-100000-C", "ETH-7MAR25-3000-P", "garbage", "BTC-1JAN25-50000-P"]
    df = spark.createDataFrame([(n,) for n in names], "instrument_name string")
    out = with_parsed_instrument(df).toPandas()
    for _, row in out.iterrows():
        if is_valid_instrument(row.instrument_name):
            inst = parse_instrument(row.instrument_name)
            assert row.underlying == inst.underlying
            assert row.expiry == inst.expiry
            assert row.strike == inst.strike
            assert row.option_type == inst.option_type
        else:
            assert pd.isna(row.underlying)


def test_format_instrument_col_roundtrip(spark, trades_df):
    out = trades_df.select(
        "instrument_name",
        format_instrument_col(
            F.col("underlying"), F.col("expiry"), F.col("strike"), F.col("option_type")
        ).alias("formatted"),
    ).toPandas()
    assert (out.instrument_name == out.formatted).all()


# --- validation layer ---
def test_quality_metrics_shape(trades_df):
    m = quality_metrics(trades_df).toPandas().iloc[0]
    assert m.total_rows == 200
    assert m.unique_ids == 200
    assert m.dedup_rate == 1.0
    assert m.iv_null_or_zero_rate == 0.0
    # HLL++ scale path: within 5% of exact on this cardinality
    a = quality_metrics(trades_df, approx_distinct=True).toPandas().iloc[0]
    assert abs(a.unique_ids - 200) <= 10
    assert a.total_rows == 200


def test_coverage_by_group(trades_df):
    c = coverage_by_group(trades_df).toPandas()
    assert set(c.underlying) == {"BTC"}
    assert c.total_rows.sum() == 200


def test_gap_analysis_finds_planted_gap(spark):
    ts = [dt.datetime(2024, 1, 1, 0) + dt.timedelta(minutes=5 * i) for i in range(20)]
    ts += [ts[-1] + dt.timedelta(hours=5)]  # planted 5h gap
    df = spark.createDataFrame([(t,) for t in ts], "timestamp timestamp")
    gaps = gap_analysis(df, threshold_hours=1.0).toPandas()
    assert len(gaps) == 1
    assert abs(gaps.gap_hours.iloc[0] - 5.0) < 1e-9


def test_gap_analysis_bucketed_no_global_sort(spark):
    """VERDICT r2 #9: with group_cols=() the lead window partitions by
    the day bucket — no single-partition sort of the base data; gaps
    spanning empty buckets still stitch across the boundary table."""
    # 3 days of data with a 30h hole covering one whole empty day
    ts = [dt.datetime(2024, 1, 1, 0) + dt.timedelta(minutes=30 * i) for i in range(40)]
    hole_start = ts[-1]
    ts += [hole_start + dt.timedelta(hours=30)]
    ts += [ts[-1] + dt.timedelta(minutes=30 * i) for i in range(5)]
    df = spark.createDataFrame([(t,) for t in ts], "timestamp timestamp")
    out = gap_analysis(df, threshold_hours=1.0)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__b" in plan  # heavy window keyed by (bucket), never global
    gaps = out.toPandas()
    assert abs(gaps.gap_hours.max() - 30.0) < 1e-9
    # matches the unbucketed shape run with one huge bucket
    ref = gap_analysis(df, threshold_hours=1.0, bucket_seconds=1e9).toPandas()
    assert sorted(gaps.gap_hours) == sorted(ref.gap_hours)


def test_describe_capabilities():
    d = describe()
    assert d["execution"] == "pyspark"
    assert "fetch_trades" in d["capabilities"]["query"]
    assert "egarch" in d["capabilities"]["features"]


def test_ensure_spot_dictionary_probe(spark, tmp_path):
    from gapless_deribit_clickhouse_spark.features import ensure_spot_dictionary

    assert not ensure_spot_dictionary(spark, table="__no_such_spot__")
    p = str(tmp_path / "spot.parquet")
    spark.createDataFrame(
        [("BTCUSDT", 50000.0)], "symbol string, close double"
    ).write.parquet(p)
    assert ensure_spot_dictionary(spark, table="__spot_probe__", path=p)
    assert spark.catalog.tableExists("__spot_probe__")  # now registered
    assert ensure_spot_dictionary(spark, table="__spot_probe__")
    assert not ensure_spot_dictionary(
        spark, table="__nope__", path=str(tmp_path / "missing"), auto_create=True
    )
    spark.catalog.dropTempView("__spot_probe__")


def test_merge_rollup_is_split_invariant(spark):
    from gapless_deribit_clickhouse_spark.operators.merge_rollup import (
        finalize_rollup,
        merge_rollup,
        partial_rollup,
    )

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None),
        ("b", 5.0), ("b", 5.0), ("c", 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, v double").repartition(4)

    def final(splits):
        states = [partial_rollup(s, ["k"], "v") for s in splits]
        out = finalize_rollup(merge_rollup(states, ["k"]), ["k"])
        return {
            r["k"]: (r["n_obs"], r["sum_value"], r["min_value"], r["max_value"],
                     round(r["avg_value"], 12),
                     None if r["stddev_value"] is None else round(r["stddev_value"], 12))
            for r in out.collect()
        }

    whole = final([df])
    halves = final([df.filter("v < 4"), df.filter("v >= 4 or v is null")])
    thirds = final([df.limit(0), df.filter("k = 'a'"), df.filter("k != 'a'")])
    assert whole == halves == thirds
    assert whole["a"][0] == 3 and whole["c"][5] is None  # n<2 -> NULL stddev
    import math
    assert math.isclose(whole["a"][5], 1.0)  # stddev_samp of 1,2,3


def test_register_views_enables_raw_sql(spark):
    from gapless_deribit_clickhouse_spark.core.tables import register_views

    register_views(spark, "/root/testdata/sf0.001")
    # the ClickHouse-migration story: keep writing plain SQL against
    # the same table names; Catalyst plans it like the DataFrame API
    out = spark.sql(
        """
        SELECT event_type, count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
        """
    ).collect()
    assert [r["event_type"] for r in out] == [
        "click", "error", "purchase", "signup", "view"
    ]
    assert all(r["n"] > 0 for r in out)
    # idempotent re-registration
    register_views(spark, "/root/testdata/sf0.001")
    assert spark.sql("SELECT count(*) AS c FROM region").collect()[0]["c"] == 5


def test_weighted_median_matches_bruteforce(spark):
    """50 random groups in ONE job, each checked against a Python
    brute force of the definition (smallest value whose running
    weight reaches half the total), including value ties and skewed
    weights."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows, expected = [], {}
    for g in range(50):
        n = int(rng.integers(1, 30))
        # small value alphabet forces ties; weights span 4 decades
        vals = rng.integers(0, 8, n).astype(float)
        wts = (10.0 ** rng.integers(0, 4, n)).astype(int)
        key = f"g{g}"
        rows += [(key, float(v), int(w)) for v, w in zip(vals, wts)]
        order = np.argsort(vals, kind="stable")
        sv, sw = vals[order], wts[order]
        cum = np.cumsum(sw)
        expected[key] = float(sv[np.searchsorted(2 * cum, cum[-1])])
    df = spark.createDataFrame(rows, "k string, value double, qty long")

    from gapless_deribit_clickhouse_spark.operators.weighted import (
        weighted_median_per_group,
    )

    got = {
        r["k"]: r["weighted_median"]
        for r in weighted_median_per_group(df, ["k"], "value", "qty").collect()
    }
    assert got == expected


def test_snapshot_diff_change_types_and_null_safety(spark):
    from gapless_deribit_clickhouse_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, None), (3, 30.0, "C"), (4, None, "D")],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        [(2, 20.0, None), (3, 31.0, "C"), (4, None, None), (5, 50.0, "E")],
        "k long, price double, status string",
    )
    out = {
        r.k: r
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }
    assert set(out) == {1, 3, 4, 5}  # key 2 unchanged (NULL == NULL)
    assert out[1].change_type == "delete" and out[1].new_price is None
    assert out[3].change_type == "update" and out[3].new_price == 31.0
    # NULL-safe per column: status D -> NULL is a real update
    assert out[4].change_type == "update"
    assert out[5].change_type == "insert" and out[5].old_price is None
    # restricting compare_cols to price makes key 4 unchanged
    only_price = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, keys=["k"], compare_cols=["price"]).collect()
    }
    assert set(only_price) == {1, 3, 5}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        snapshot_diff(old, new, keys=["k"], compare_cols=["nope"])
