"""Shared fixtures: session-scoped Spark, deterministic synthetic
options_trades / spot / IV-series frames (shapes from FIXTURES.md,
mirroring the reference's seeded test fixtures at
``/root/reference/tests/features/test_phase1.py:31-166``)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gapless_deribit_clickhouse_spark.core.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


TRADES_SCHEMA = T.StructType(
    [
        T.StructField("trade_id", T.StringType(), False),
        T.StructField("instrument_name", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("amount", T.DoubleType(), False),
        T.StructField("direction", T.StringType(), False),
        T.StructField("iv", T.DoubleType(), True),
        T.StructField("index_price", T.DoubleType(), True),
        T.StructField("mark_price", T.DoubleType(), True),
        T.StructField("underlying", T.StringType(), False),
        T.StructField("expiry", T.DateType(), False),
        T.StructField("strike", T.DoubleType(), False),
        T.StructField("option_type", T.StringType(), False),
    ]
)

_MONTHS = ["JAN", "FEB", "MAR", "APR", "MAY", "JUN",
           "JUL", "AUG", "SEP", "OCT", "NOV", "DEC"]


def make_trades_pdf(n: int = 200, seed: int = 42) -> pd.DataFrame:
    """FIXTURES.md §1: 200 trades over 2h, 5 expiries (DTE ≈
    {5,12,26,61,117}), seeded IV term structure."""
    rng = np.random.RandomState(seed)
    base = dt.datetime(2024, 12, 1, 10, 0, 0)
    dtes = np.array([5, 12, 26, 61, 117])
    rows = []
    for i in range(n):
        ts = base + dt.timedelta(minutes=float(rng.uniform(0, 120)))
        dte = int(dtes[rng.randint(0, len(dtes))])
        expiry = (base + dt.timedelta(days=dte)).date()
        index_price = 97000 + rng.uniform(-2000, 2000)
        strike = round(index_price / 1000) * 1000 + rng.choice(
            [-5000, -2000, -1000, 0, 1000, 2000, 5000]
        )
        iv = float(np.clip(0.55 + 0.15 * np.exp(-dte / 30) + rng.uniform(-0.10, 0.15), 0.30, 1.20))
        opt = "C" if rng.rand() < 2 / 3 else "P"
        name = f"BTC-{expiry.day}{_MONTHS[expiry.month - 1]}{expiry.year % 100:02d}-{int(strike)}-{opt}"
        rows.append(
            {
                "trade_id": f"TRD-{i:06d}",
                "instrument_name": name,
                "timestamp": ts,
                "price": float(rng.uniform(0.01, 0.15)),
                "amount": float(rng.uniform(0.1, 5.0)),
                "direction": rng.choice(["buy", "sell"]),
                "iv": iv,
                "index_price": float(index_price),
                "mark_price": float(rng.uniform(0.01, 0.15)),
                "underlying": "BTC",
                "expiry": expiry,
                "strike": float(strike),
                "option_type": opt,
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="session")
def trades_df(spark):
    return spark.createDataFrame(make_trades_pdf(), schema=TRADES_SCHEMA).cache()


@pytest.fixture(scope="session")
def multi_dte_trades(spark):
    """FIXTURES.md §2: 6 DTE targets × 30 trades, one per bucket."""
    rng = np.random.RandomState(456)
    base = dt.datetime(2024, 12, 1, 10, 0, 0)
    rows = []
    i = 0
    for dte in (3, 10, 22, 45, 75, 120):
        for j in range(30):
            ts = base + dt.timedelta(minutes=4 * j)
            expiry = (base + dt.timedelta(days=dte)).date()
            opt = "C" if j % 3 else "P"
            iv = float(0.50 + 0.20 * np.exp(-dte / 30) + rng.uniform(-0.05, 0.05))
            rows.append(
                {
                    "trade_id": f"MDT-{i:06d}",
                    "instrument_name": f"BTC-{expiry.day}{_MONTHS[expiry.month-1]}{expiry.year%100:02d}-100000-{opt}",
                    "timestamp": ts,
                    "price": 0.05,
                    "amount": float(rng.uniform(0.5, 3.0)),
                    "direction": "buy",
                    "iv": iv,
                    "index_price": 97000.0,
                    "mark_price": 0.05,
                    "underlying": "BTC",
                    "expiry": expiry,
                    "strike": 100000.0,
                    "option_type": opt,
                }
            )
            i += 1
    return spark.createDataFrame(pd.DataFrame(rows), schema=TRADES_SCHEMA).cache()


def make_regular_iv_series(n: int = 200, seed: int = 123) -> pd.DataFrame:
    """FIXTURES.md §3: AR(1) mean-reverting IV on a strict 15-min grid."""
    rng = np.random.RandomState(seed)
    ts = pd.date_range("2024-12-01", periods=n, freq="15min")
    x = np.empty(n)
    x[0] = 0.60
    for t in range(1, n):
        x[t] = np.clip(0.15 * 0.60 + 0.85 * x[t - 1] + rng.normal(0, 0.02), 0.30, 1.20)
    return pd.DataFrame({"ts": ts, "iv_close": x})


@pytest.fixture(scope="session")
def regular_iv_series():
    return make_regular_iv_series()


@pytest.fixture(scope="session")
def spot_pdf():
    """FIXTURES.md §5: 15-min spot grid with deliberate holes."""
    ts = pd.date_range("2024-12-01 09:00", "2024-12-01 13:00", freq="15min")
    rows = []
    for i, t in enumerate(ts):
        if i % 5 == 4:  # missing cell every 5th bar
            continue
        rows.append(
            {
                "symbol": "BTCUSDT",
                "timeframe": "15m",
                "instrument_type": "spot",
                "timestamp": t,
                "close": 97000.0 + 37.0 * i,
            }
        )
    return pd.DataFrame(rows)
