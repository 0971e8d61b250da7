"""fill_time_gaps: planted gaps, forward fill, per-key grids."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from gapless_deribit_clickhouse_spark.operators.gapfill import fill_time_gaps


def _t(minute):
    return datetime(2024, 1, 1, 0, minute, 0)


@pytest.fixture(scope="module")
def sparse(spark):
    rows = [
        # key a: observations at minutes 0, 2, 5 -> gaps at 1, 3, 4
        ("a", _t(0), 10.0), ("a", _t(2), 20.0), ("a", _t(5), 50.0),
        # key b: a single observation -> no gaps, grid of one
        ("b", _t(7), 70.0),
    ]
    return spark.createDataFrame(rows, ["k", "bucket_ts", "close"])


def test_fill_densifies_and_forward_fills(sparse):
    out = (
        fill_time_gaps(
            sparse, ts_col="bucket_ts", step_seconds=60,
            keys=["k"], fill_cols=["close"],
        )
        .orderBy("k", "bucket_ts")
        .collect()
    )
    a = [(r.bucket_ts.minute, r.close, r.is_gap) for r in out if r.k == "a"]
    assert a == [
        (0, 10.0, 0), (1, 10.0, 1), (2, 20.0, 0),
        (3, 20.0, 1), (4, 20.0, 1), (5, 50.0, 0),
    ]
    b = [(r.bucket_ts.minute, r.close, r.is_gap) for r in out if r.k == "b"]
    assert b == [(7, 70.0, 0)]  # grid starts AT the first observation


def test_fill_without_fill_cols_leaves_nulls(sparse):
    out = fill_time_gaps(
        sparse, ts_col="bucket_ts", step_seconds=60, keys=["k"]
    ).filter(F.col("is_gap") == 1)
    assert out.count() == 3
    assert out.filter(F.col("close").isNotNull()).count() == 0


def test_fill_validates_step(sparse):
    with pytest.raises(ValueError):
        fill_time_gaps(sparse, ts_col="bucket_ts", step_seconds=0)


def test_fill_linear_interpolation(sparse):
    out = {
        (r["k"], r["bucket_ts"].minute): (r["close"], r["is_gap"])
        for r in fill_time_gaps(
            sparse, "bucket_ts", 60, keys=["k"], interpolate_cols=["close"]
        ).collect()
    }
    # observed rows untouched
    assert out[("a", 0)] == (10.0, 0)
    assert out[("a", 2)] == (20.0, 0)
    assert out[("a", 5)] == (50.0, 0)
    # gap at minute 1: halfway between 10 and 20
    assert out[("a", 1)] == (15.0, 1)
    # gaps at 3, 4: linear between 20 (t=2) and 50 (t=5)
    assert out[("a", 3)] == (30.0, 1)
    assert out[("a", 4)] == (40.0, 1)
    # single-observation key: grid of one, nothing to interpolate
    assert out[("b", 7)] == (70.0, 0)


def test_fill_forward_fill_keeps_observed_nulls_verbatim(spark):
    # ClickHouse WITH FILL only populates INSERTED rows: an observed
    # bar whose value is legitimately NULL must stay NULL, while a gap
    # row after it still carries the last NON-null observation
    # (ADVICE r5)
    rows = [
        ("a", _t(0), 10.0),
        ("a", _t(2), None),   # observed, value missing
        # gaps at 1, 3, 4
        ("a", _t(5), 50.0),
    ]
    df = spark.createDataFrame(rows, ["k", "bucket_ts", "close"])
    out = {
        r["bucket_ts"].minute: (r["close"], r["is_gap"])
        for r in fill_time_gaps(
            df, "bucket_ts", 60, keys=["k"], fill_cols=["close"]
        ).collect()
    }
    assert out[0] == (10.0, 0)
    assert out[1] == (10.0, 1)
    assert out[2] == (None, 0)   # observed NULL survives verbatim
    assert out[3] == (10.0, 1)   # carry skips the NULL observation
    assert out[4] == (10.0, 1)
    assert out[5] == (50.0, 0)


def test_fill_rejects_overlapping_modes(sparse):
    with pytest.raises(ValueError, match="both fill_cols"):
        fill_time_gaps(
            sparse, "bucket_ts", 60, keys=["k"],
            fill_cols=["close"], interpolate_cols=["close"],
        )


def test_fill_interpolation_skips_null_valued_observations(spark):
    # an observed row with a NULL value must not anchor the slope
    rows = [
        ("a", _t(0), 10.0),
        ("a", _t(2), None),   # observed, value missing
        ("a", _t(4), 30.0),
    ]
    df = spark.createDataFrame(rows, ["k", "bucket_ts", "close"])
    out = {
        (r["bucket_ts"].minute): (r["close"], r["is_gap"])
        for r in fill_time_gaps(
            df, "bucket_ts", 60, keys=["k"], interpolate_cols=["close"]
        ).collect()
    }
    # gap rows lerp between the surrounding NON-NULL observations
    # (10 at t=0, 30 at t=4): t=1 -> 15, t=3 -> 25
    assert out[1] == (15.0, 1)
    assert out[3] == (25.0, 1)
    # the null-valued OBSERVED row keeps its NULL (is_gap = 0)
    assert out[2] == (None, 0)
