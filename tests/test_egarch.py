"""EGARCH guards + fit properties (reference test_phase1.py:440-523)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gapless_deribit_clickhouse_spark.exceptions import (
    ConfigurationError,
    InsufficientDataError,
)
from gapless_deribit_clickhouse_spark.features.egarch import (
    auto_select_egarch,
    egarch_params_by_group,
    fit_egarch,
    forecast_volatility,
    iv_model_spread,
)
from tests.conftest import make_regular_iv_series


def test_fit_basic_attributes(regular_iv_series):
    res = fit_egarch(regular_iv_series.iv_close, regular_iv_series.ts)
    assert res.n_obs == 199
    assert np.isfinite(res.loglik) and np.isfinite(res.aic) and np.isfinite(res.bic)
    assert res.scale_factor > 0
    assert len(res.conditional_volatility) == res.n_obs
    assert (res.conditional_volatility > 0).all()
    assert set(res.params) == {"mu", "omega", "alpha1", "gamma1", "beta1"}
    assert abs(res.params["beta1"]) < 1.0  # stationarity clamp


def test_short_series_raises():
    s = make_regular_iv_series(n=50)
    with pytest.raises(InsufficientDataError):
        fit_egarch(s.iv_close, s.ts)


def test_irregular_series_rejected():
    s = make_regular_iv_series(n=120)
    # mixed 5/15/30-min gaps (FIXTURES §3 irregular variant)
    rng = np.random.RandomState(7)
    offsets = np.cumsum(rng.choice([300, 900, 1800, 2700], size=120))
    s["ts"] = pd.Timestamp("2024-12-01") + pd.to_timedelta(offsets, unit="s")
    with pytest.raises(ConfigurationError):
        fit_egarch(s.iv_close, s.ts)


def test_auto_select_picks_best():
    s = make_regular_iv_series(n=300)
    best = auto_select_egarch(s.iv_close, s.ts, criterion="aic")
    base = fit_egarch(s.iv_close, s.ts, p=1, q=1)
    assert best.aic <= base.aic + 1e-6


def test_forecast_positive_and_converging(regular_iv_series):
    res = fit_egarch(regular_iv_series.iv_close, regular_iv_series.ts)
    fc = forecast_volatility(res, horizon=20)
    assert len(fc) == 20 and (fc > 0).all()
    with pytest.raises(ConfigurationError):
        forecast_volatility(res, horizon=0)


def test_iv_model_spread_aligns(regular_iv_series):
    res = fit_egarch(regular_iv_series.iv_close, regular_iv_series.ts)
    spread = iv_model_spread(regular_iv_series.iv_close, res)
    assert len(spread) == res.n_obs


def _simulate_egarch(n, mu, omega, alpha, gamma, beta, seed):
    """Exact EGARCH(1,1) data-generating process (normal innovations),
    returning the level series whose 100*dlog returns follow it."""
    from gapless_deribit_clickhouse_spark.features.egarch import E_ABS_Z

    rng = np.random.default_rng(seed)
    z = rng.standard_normal(n)
    lh = omega / (1.0 - beta)  # unconditional log-variance
    zprev = 0.0
    rs = np.empty(n)
    sig = np.empty(n)
    for t in range(n):
        if t:
            lh = omega + alpha * (abs(zprev) - E_ABS_Z) + gamma * zprev + beta * lh
        sig[t] = np.exp(0.5 * lh)
        rs[t] = mu + z[t] * sig[t]
        zprev = z[t]
    levels = np.concatenate([[1.0], np.exp(np.cumsum(rs) / 100.0)])
    return pd.Series(levels), sig


def test_fit_recovers_known_parameters():
    """Value-level pin (VERDICT r2 #5): on a synthetic series generated
    by an exact EGARCH(1,1) process with known coefficients, the MLE
    must recover (omega, alpha, gamma, beta) within estimation-error
    tolerances — 'runs' upgraded to 'right'. The reference pins its fit
    via the arch package's estimator; with no arch in this container,
    the data-generating process itself is the ground truth."""
    true = dict(mu=0.05, omega=0.1, alpha=0.25, gamma=-0.12, beta=0.9)
    levels, sig = _simulate_egarch(2000, seed=7, **true)
    res = fit_egarch(levels)
    assert res.scale_factor == 1.0  # simulated in arch's preferred band
    assert abs(res.params["omega"] - true["omega"]) < 0.05
    assert abs(res.params["alpha1"] - true["alpha"]) < 0.08
    assert abs(res.params["gamma1"] - true["gamma"]) < 0.05
    assert abs(res.params["beta1"] - true["beta"]) < 0.03
    # the fitted conditional-vol path must track the true path
    m = min(len(res.conditional_volatility), len(sig))
    corr = np.corrcoef(res.conditional_volatility[-m:], sig[-m:])[0, 1]
    assert corr > 0.9


def test_fit_recovers_leverage_sign():
    """The asymmetry (leverage) coefficient's sign is identified:
    positive-gamma and negative-gamma processes fit back with the
    matching sign."""
    for gamma in (-0.15, 0.15):
        levels, _ = _simulate_egarch(
            1500, mu=0.0, omega=0.05, alpha=0.2, gamma=gamma, beta=0.85, seed=13
        )
        res = fit_egarch(levels)
        assert np.sign(res.params["gamma1"]) == np.sign(gamma)
        assert abs(res.params["gamma1"] - gamma) < 0.08


def test_egarch_by_group_distributed(spark):
    frames = []
    for key, seed in (("BTC", 123), ("ETH", 321)):
        pdf = make_regular_iv_series(n=150, seed=seed)
        pdf["underlying"] = key
        frames.append(pdf)
    df = spark.createDataFrame(pd.concat(frames))
    out = egarch_params_by_group(df, ["underlying"]).toPandas().set_index("underlying")
    assert set(out.index) == {"BTC", "ETH"}
    assert out.error.isna().all()
    assert (out.n_obs == 149).all()


def test_egarch_by_group_guard_failure_isolated(spark):
    good = make_regular_iv_series(n=150, seed=1)
    good["underlying"] = "OK"
    bad = make_regular_iv_series(n=40, seed=2)  # too short
    bad["underlying"] = "SHORT"
    df = spark.createDataFrame(pd.concat([good, bad]))
    out = egarch_params_by_group(df, ["underlying"]).toPandas().set_index("underlying")
    assert out.loc["OK"].error is None or pd.isna(out.loc["OK"].error)
    assert "InsufficientDataError" in out.loc["SHORT"].error
